from . import scalar, vector  # noqa: F401

# grouped (pandas UDAF) and udtf are NOT imported eagerly: their
# @pandas_udf / @udtf decorators parse DDL return types at module import,
# which requires an active SparkSession — import them after the session
# exists (`from usedcars_bigdata_spark.functions import grouped, udtf`).
