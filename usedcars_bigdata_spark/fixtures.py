"""Deterministic synthetic `vehicles` fixture (FIXTURES.md §A1).

Generated entirely with native expressions over ``spark.range`` — no driver
lists, no Python row generation — so the same code synthesizes 1e3 or 1e9
rows, partitioned, with zero serialization cost. Every column is a pure
function of the row key, so content is independent of partitioning/cluster
layout, and planted exact-duplicate rows (~1%) are stable.

Value domains follow the reference's data
(notebooks_outputs/data-understanding.txt:29-56 and FIXTURES.md): messy
prices with junk outliers, nullable year/condition, keyword-bearing
descriptions for the dealer-category UDF (data-understanding.py:131-147)
and the 4-digit-year regexp (data-understanding.py:190).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MANUFACTURERS = [
    "ford", "chevrolet", "toyota", "honda", "nissan", "jeep", "ram", "gmc",
    "bmw", "dodge", "mercedes-benz", "hyundai", "subaru", "volkswagen", "kia",
    "lexus", "audi", "cadillac", "chrysler", "acura", "tesla", "volvo", "fiat",
    "alfa-romeo", "mini", "rover", "porsche", "mitsubishi", "mazda", "infiniti",
]
CONDITIONS = ["new", "like new", "excellent", "good", "fair", "salvage"]
FUELS = ["gas", "diesel", "hybrid", "electric", "other"]
TITLE_STATUSES = ["clean", "salvage", "rebuilt", "lien", "missing", "parts only"]
TRANSMISSIONS = ["automatic", "manual", "other"]
TYPES = ["sedan", "SUV", "pickup", "truck", "coupe", "hatchback", "convertible",
         "wagon", "van", "mini-van", "offroad", "bus", "other"]
COLORS = ["white", "black", "silver", "grey", "red", "blue", "green", "yellow",
          "orange", "brown", "purple", "custom"]
STATES = ["ca", "tx", "fl", "ny", "wa", "or", "oh", "pa", "il", "mi",
          "ga", "nc", "va", "az", "co", "nj", "tn", "ma", "in", "mo"]
# Description templates exercise the dealer-category keyword families
# (data-understanding.py:134-141), the exclusion phrases, and embedded years.
DESCRIPTIONS = [
    "great car buy online at carvana today year {y}",
    "visit our showroom for a test drive guaranteed finance year {y}",
    "selling my old truck runs fine year {y}",
    "cash for cars we are buying all models year {y}",
    "one owner clean title call now inspection ready year {y}",
    "listed on vroom website fast delivery year {y}",
    "private sale no dealer please year {y}",
]


def _h(seed: str, key: Column) -> Column:
    """Deterministic nonneg 63-bit stream per (seed, row-key)."""
    return F.abs(F.xxhash64(F.lit(seed), key))


def _pick(seed: str, key: Column, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(_h(seed, key), F.lit(len(values))) + 1).cast("int"))


def _maybe_null(col: Column, seed: str, key: Column, one_in: int) -> Column:
    return F.when(F.pmod(_h(seed, key), F.lit(one_in)) == 0, F.lit(None)).otherwise(col)


def vehicles_fixture(spark: SparkSession, n: int = 10_000, partitions: int | None = None) -> DataFrame:
    """26-column vehicles table, ~1% planted exact-duplicate rows."""
    base = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    # Duplicate plant: every 101st row clones the content of its predecessor
    # (ALL columns derive from k, so the rows are bit-identical).
    k = F.when((F.pmod(F.col("id"), 101) == 0) & (F.col("id") > 0), F.col("id") - 1).otherwise(
        F.col("id")
    )
    df = base.select(k.alias("k"))
    h = lambda s: _h(s, F.col("k"))  # noqa: E731

    year_num = (2000 + F.pmod(h("yr"), F.lit(22))).cast("int")
    desc_year = (1960 + F.pmod(h("dyr"), F.lit(60))).cast("int")
    template = _pick("desc", F.col("k"), DESCRIPTIONS)
    price = F.when(
        F.pmod(h("junk"), 100) == 0, (h("bigp") % F.lit(3_000_000_000)).cast("long")
    ).otherwise((100 + F.pmod(h("price"), F.lit(60_000))).cast("long"))

    region = F.concat(F.lit("city"), F.pmod(h("rg"), F.lit(400)))
    out = df.select(
        (F.lit(7_200_000_000) + F.col("k")).alias("id"),
        F.concat(F.lit("https://"), region, F.lit(".craigslist.org/"), F.col("k")).alias("url"),
        region.alias("region"),
        F.concat(F.lit("https://"), region, F.lit(".craigslist.org")).alias("region_url"),
        price.alias("price"),
        _maybe_null(year_num, "yrnull", F.col("k"), 20).alias("year"),
        _pick("mfr", F.col("k"), MANUFACTURERS).alias("manufacturer"),
        F.concat(F.lit("model-"), F.pmod(h("model"), F.lit(3000))).alias("model"),
        _maybe_null(_pick("cond", F.col("k"), CONDITIONS), "condnull", F.col("k"), 10).alias(
            "condition"
        ),
        _maybe_null(
            F.concat(F.pmod(h("cyl"), F.lit(8)) + 3, F.lit(" cylinders")),
            "cylnull", F.col("k"), 10,
        ).alias("cylinders"),
        _maybe_null(_pick("fuel", F.col("k"), FUELS), "fuelnull", F.col("k"), 15).alias("fuel"),
        _maybe_null(
            (F.pmod(h("odo"), F.lit(300_000)) + F.pmod(h("odof"), F.lit(100)) / 100.0)
            .cast("double"),
            "odonull", F.col("k"), 25,
        ).alias("odometer"),
        _pick("title", F.col("k"), TITLE_STATUSES).alias("title_status"),
        _pick("trans", F.col("k"), TRANSMISSIONS).alias("transmission"),
        _maybe_null(F.upper(F.conv(h("vin").cast("string"), 10, 36)), "vinnull", F.col("k"), 2)
        .alias("VIN"),
        _maybe_null(_pick("drive", F.col("k"), ["4wd", "rwd", "fwd"]), "drvnull", F.col("k"), 8)
        .alias("drive"),
        _maybe_null(
            _pick("size", F.col("k"), ["full-size", "mid-size", "compact", "sub-compact"]),
            "sznull", F.col("k"), 6,
        ).alias("size"),
        _pick("type", F.col("k"), TYPES).alias("type"),
        _pick("color", F.col("k"), COLORS).alias("paint_color"),
        F.concat(F.lit("https://img.example/"), F.col("k"), F.lit(".jpg")).alias("image_url"),
        F.replace(template, F.lit("{y}"), desc_year.cast("string")).alias("description"),
        F.lit(None).cast("string").alias("county"),
        _pick("state", F.col("k"), STATES).alias("state"),
        (25.0 + F.pmod(h("lat"), F.lit(2400)) / 100.0).alias("lat"),
        (-125.0 + F.pmod(h("lng"), F.lit(5500)) / 100.0).alias("long"),
        F.date_format(
            F.timestamp_seconds(F.lit(1_609_459_200) + F.pmod(h("pd"), F.lit(31_536_000))),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("posting_date"),
    )
    return out


def vehicles_fixture_stringified(spark: SparkSession, n: int = 10_000) -> DataFrame:
    """All-string variant reproducing the reference's inferSchema-degraded
    load (notebooks_outputs/data-understanding.txt:29-56)."""
    df = vehicles_fixture(spark, n)
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])
