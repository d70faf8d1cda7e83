"""High-level pipelines composing the operators (reference entry-point
analogues)."""
