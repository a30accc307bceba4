"""usedcars_bigdata_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference application ``vepereira7/usedcars-bigdata``
(surveyed in /root/repo/SURVEY.md), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
streaming).

Design principles (see SURVEY.md §4, §7):
- DataFrame/SQL declarative plans; Catalyst + Tungsten + AQE do physical
  planning. No custom execution code.
- Explicit schemas (no inferSchema double-scan).
- Native column expressions instead of Python UDFs wherever semantics allow;
  Arrow-batched pandas UDFs otherwise; never row-at-a-time UDFs in hot paths.
- Every operator designed for multi-executor scale: broadcast small dims,
  avoid driver-side collects in query paths, partition-aware windows.
"""

__version__ = "0.1.0"
