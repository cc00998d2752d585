"""Idempotent micro-batch parquet writes for foreachBatch sinks.

Every partials/pairs sink in this package lands its per-batch output via
``write_batch_partition``: the batch's rows go to a ``batch_id=N`` hive
partition under dynamic partition overwrite, so a foreachBatch redelivery
(crash between sink write and checkpoint commit) REWRITES exactly its own
partition instead of appending a duplicate — sink contents after a replay
equal first-delivery contents with no reader-side dedupe, matching the
exactly-once bar the segment sink (streaming/sink.py) already meets. A
partially-written partition from a mid-write crash is healed the same way:
the whole partition is replaced on redelivery.

Scale shape: dynamic overwrite touches ONLY the partitions present in the
incoming frame (one per micro-batch here); the accumulated history of other
batches is never rewritten, so the write cost per cycle stays O(batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_batch_partition(df: DataFrame, out_dir: str, batch_id: int) -> None:
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )
