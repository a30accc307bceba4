"""Explicit StructType schemas for every table the engine reads.

The reference loads its one CSV with ``inferSchema=true`` — a full extra
scan that, on its messy data, degrades to all-string columns
(``notebook_to_py/data-understanding.py:42-43``,
``notebooks_outputs/data-understanding.txt:29-56``) and forces downstream
casts. Our engine default is explicit schemas (SURVEY.md §1.4): zero
inference scans, deterministic types, and parquet/CSV readers that prune and
push down correctly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference domain table: the 26-column Craigslist `vehicles` CSV
# (column list from notebooks_outputs/data-understanding.txt:29-56; semantic
# types per SURVEY.md §1.2).
# ---------------------------------------------------------------------------

VEHICLES_RAW = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in [
        "id", "url", "region", "region_url", "price", "year", "manufacturer",
        "model", "condition", "cylinders", "fuel", "odometer", "title_status",
        "transmission", "VIN", "drive", "size", "type", "paint_color",
        "image_url", "description", "county", "state", "lat", "long",
        "posting_date",
    ]]
)

VEHICLES_TYPED = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("region_url", T.StringType(), True),
        T.StructField("price", T.LongType(), True),
        T.StructField("year", T.IntegerType(), True),
        T.StructField("manufacturer", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("condition", T.StringType(), True),
        T.StructField("cylinders", T.StringType(), True),
        T.StructField("fuel", T.StringType(), True),
        T.StructField("odometer", T.DoubleType(), True),
        T.StructField("title_status", T.StringType(), True),
        T.StructField("transmission", T.StringType(), True),
        T.StructField("VIN", T.StringType(), True),
        T.StructField("drive", T.StringType(), True),
        T.StructField("size", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("paint_color", T.StringType(), True),
        T.StructField("image_url", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("county", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("long", T.DoubleType(), True),
        T.StructField("posting_date", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Harness testdata tables (/root/testdata/sf*/; TESTDATA.md).
# ---------------------------------------------------------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType(), True),
            T.StructField("r_name", T.StringType(), True),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType(), True),
            T.StructField("c_name", T.StringType(), True),
            T.StructField("c_nationkey", T.IntegerType(), True),
            T.StructField("c_acctbal", T.DoubleType(), True),
            T.StructField("c_mktsegment", T.StringType(), True),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType(), True),
            T.StructField("s_name", T.StringType(), True),
            T.StructField("s_nationkey", T.IntegerType(), True),
            T.StructField("s_acctbal", T.DoubleType(), True),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType(), True),
            T.StructField("p_name", T.StringType(), True),
            T.StructField("p_brand", T.StringType(), True),
            T.StructField("p_type", T.StringType(), True),
            T.StructField("p_size", T.IntegerType(), True),
            T.StructField("p_retailprice", T.DoubleType(), True),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType(), True),
            T.StructField("o_custkey", T.LongType(), True),
            T.StructField("o_orderstatus", T.StringType(), True),
            T.StructField("o_totalprice", T.DoubleType(), True),
            T.StructField("o_orderdate", T.TimestampType(), True),
            T.StructField("o_orderpriority", T.StringType(), True),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType(), True),
            T.StructField("l_partkey", T.LongType(), True),
            T.StructField("l_suppkey", T.LongType(), True),
            T.StructField("l_linenumber", T.IntegerType(), True),
            T.StructField("l_quantity", T.DoubleType(), True),
            T.StructField("l_extendedprice", T.DoubleType(), True),
            T.StructField("l_discount", T.DoubleType(), True),
            T.StructField("l_tax", T.DoubleType(), True),
            T.StructField("l_returnflag", T.StringType(), True),
            T.StructField("l_linestatus", T.StringType(), True),
            T.StructField("l_shipdate", T.TimestampType(), True),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}

TABLE_NAMES = list(TESTDATA)
