"""Scalar/vectorized function layer: detectors, tokenizer, UDFs."""
