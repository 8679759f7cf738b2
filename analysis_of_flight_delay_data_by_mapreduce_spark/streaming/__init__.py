"""Structured Streaming variants of the aggregation layer (extension tier —
the reference is batch-only, SURVEY §2.4)."""
