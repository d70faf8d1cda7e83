"""Structured Streaming layer: sources, exactly-once sink, stateful
stream-stream join, metrics — the north_rule's CEP flow."""
