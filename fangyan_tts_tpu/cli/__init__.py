"""Public CLIs, flag-compatible with the reference's top-level scripts."""
