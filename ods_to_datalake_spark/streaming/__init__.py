"""Structured Streaming extensions (SURVEY §2.8: absent from the
reference; added per the charter — watermarked windowed aggregation,
sessionization, and a custom stateful operator)."""
