"""Beyond-reference extensions: the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
plumbing). All designed shuffle-aware for the 100 TB regime; each has a
correctness story (DuckDB oracle where SQL-expressible, property tests
otherwise)."""

from . import dedup, multimodal, similarity, text  # noqa: F401
