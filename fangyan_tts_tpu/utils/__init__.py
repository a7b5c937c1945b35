"""Shared utilities: fast host-side init, profiling helpers, logging."""
