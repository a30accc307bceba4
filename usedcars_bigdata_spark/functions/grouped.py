"""Grouped-aggregate Pandas UDFs (custom UDAF surface).

Spark's UDAF story in Python is the GROUPED_AGG pandas_udf: the group's
column arrives as ONE Arrow batch (a pandas Series) and the function
returns one scalar. That is the right tool ONLY for aggregates the native
engine genuinely can't express — it disables partial aggregation (every
group's full column moves through the shuffle to a single task), so a
decomposable aggregate written this way shuffles O(rows) where the native
form shuffles O(groups).

``geomean`` below is deliberately a decomposable example: the production
rewrite is ``exp(avg(ln(x)))`` (``geomean_native``), which partial-aggregates
JVM-side. The UDAF form exists to exercise and document the surface, with
row-for-row parity against the native rewrite asserted in
tests/test_operators.py — the same native-vs-Python pairing as U1
(functions/scalar.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(values: pd.Series) -> float:
    """Geometric mean of a positive-valued group column (Arrow-batched
    grouped-agg UDF; log-domain mean for overflow safety)."""
    return float(np.exp(np.log(values.to_numpy(dtype="float64")).mean()))


def geomean_native(col: str | Column) -> Column:
    """The decomposed native form — exp of the partial-aggregated log mean.
    Use this in production paths; it keeps whole-stage codegen and map-side
    combine."""
    return F.exp(F.avg(F.log(col)))
