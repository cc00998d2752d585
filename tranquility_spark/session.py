"""SparkSession construction / preparation.

Two paths:
- ``get_spark()`` — we own the session (tests, bench.py): tuned local-mode conf.
- ``prepare(spark)`` — the driver owns the session (``__spark_entry__``): apply
  only runtime-settable confs needed for correctness (UTC session timezone so
  timestamp semantics match the timezone-naive DuckDB oracle; ns-parquet
  compatibility for the ``events`` table).

Scale note: confs below are chosen for local[N] testing but the knobs named
are exactly the ones that matter on a 1000-executor cluster — AQE (runtime
shuffle-partition coalescing + skew-join splitting), a shuffle partition count
sized to cores, and Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader rejects;
# this legacy conf reads it as LongType (nanos) — sources/files.py converts.
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-created session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(_NANOS_AS_LONG, "true")
    return spark


def get_spark(app_name: str = "tranquility-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config(_NANOS_AS_LONG, "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
