from tranquility_spark.operators.window_filter import two_sided_window_filter  # noqa: F401
from tranquility_spark.operators.partitioning import portable_shard, rollup_repartition  # noqa: F401
