"""Structured Streaming wrappers for incremental sources (ODP CDC)."""
