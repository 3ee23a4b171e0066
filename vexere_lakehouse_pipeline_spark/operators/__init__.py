"""DataFrame-level operators: dedup, similarity search, surrogate keys,
incremental writes, multimodal column plumbing."""
