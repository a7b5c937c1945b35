"""XLA-first signal-processing and attention primitives."""
