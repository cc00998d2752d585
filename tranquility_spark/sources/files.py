"""Batch file sources for the driver's testdata tables.

The reference has no scan/read path at all (it is ingestion-only —
SURVEY.md §1.1); reading Parquet into DataFrames is our engine's native
source. Column pruning + predicate pushdown reach the parquet scan for free
via Catalyst, so callers should ``select``/``filter`` as early as possible and
let the optimizer do the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tranquility_spark.session import prepare

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads
    (under ``legacy.parquet.nanosAsLong``) as LongType nanos; convert to a
    proper TimestampType by integer-dividing to microseconds. Integer ``div``
    is required — float division of an int64 epoch-nanos value loses
    precision above 2^53.
    """
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
