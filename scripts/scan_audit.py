import sys, re
sys.path.insert(0, "/root/repo")
from usedcars_bigdata_spark.session import get_session
spark = get_session(shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
from usedcars_bigdata_spark.plans import QUERIES
from usedcars_bigdata_spark.plantools import scans_outside_cache
sf = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
skip_prefixes = ("ts_stream", "rows_stream", "rows_word2vec", "rows_als", "rows_ml", "rows_quality", "rows_mmr", "veh_", "rows_fpgrowth", "rows_prefixspan", "ext_bpe")
for name, fn in QUERIES.items():
    if name.startswith(skip_prefixes):
        continue
    try:
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
    except Exception as e:
        print(f"ERR {name}: {type(e).__name__}"); continue
    # raw scan-line counts over-report cache-shared hubs (the
    # InMemoryRelation phantom re-prints the cached subtree per
    # consumer); report BOTH raw and outside-cache so a phantom does not
    # read as a rescan (r11) — outside-cache is the honest I/O count.
    counts = {t: len(re.findall(rf"Scan parquet[^\n]*/{t}\.parquet", plan)) for t in TABLES}
    outside = {t: len(scans_outside_cache(plan, t)) for t, c in counts.items() if c >= 2}
    hot = {t: f"{c} raw / {outside[t]} outside-cache" for t, c in counts.items() if c >= 3}
    big2 = {t: c for t, c in counts.items() if c == 2 and outside.get(t, 0) >= 2 and t in ("lineitem", "events", "documents", "orders", "embeddings")}
    if hot:
        print(f"HOT3+ {name}: {hot}")
    elif big2:
        print(f"two   {name}: {big2}")
print("AUDIT DONE")
