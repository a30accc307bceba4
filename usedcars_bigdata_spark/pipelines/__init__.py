"""End-to-end re-expressions of the reference's four application pipelines
(SURVEY.md §0) over the vehicles schema — the layer that lets a user of the
reference switch engines and run the same analyses.

- understanding: exploratory queries (data-understanding.py)
- cleaning:      prune/dedup/filter/derive chain (data-viz&cleaning.py)
- pricing:       feature encoding + regressor suite (price-prediction.py)
- recommend:     enrichment + TF-IDF similarity (recomendation-system.py)
"""

from . import cleaning, pricing, recommend, understanding  # noqa: F401
