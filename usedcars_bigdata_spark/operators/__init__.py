"""Composable DataFrame operators (SURVEY.md §2).

Each module maps one §2 operator family to idiomatic, scale-aware PySpark.
Operators are plain functions ``DataFrame -> DataFrame`` (or small builders
returning Columns) so Catalyst sees one declarative plan across operator
boundaries — no materialization between steps.
"""

from . import (  # noqa: F401
    agg,
    clean,
    derive,
    joins,
    partitioning,
    sample,
    setops,
    sort,
    timeseries,
    window,
)
