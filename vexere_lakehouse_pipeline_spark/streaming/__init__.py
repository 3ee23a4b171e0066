"""Structured Streaming extensions (SURVEY.md §2.9: the reference is
batch-periodic; streaming is the engine's optional incremental mode)."""
