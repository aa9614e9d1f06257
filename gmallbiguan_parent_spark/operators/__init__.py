"""Reusable operators beyond the reference's own surface: the
large-scale training-data pipeline toolkit (dedup, similarity search,
text analysis, multimodal plumbing). Each module exposes QUERIES and
ORACLES like the pipeline layers."""
