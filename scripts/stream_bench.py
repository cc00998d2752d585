"""Streaming ingest throughput probe: rate source → rollup → segment sink.

Measures the sustained events/sec of the full streaming path (generation →
timestamp bucketing → windowed rollup → idempotent segment write) using
Spark's built-in `rate` source. Prints one JSON line. Not part of bench.py
(the driver contract measures batch queries); run ad-hoc:

    python scripts/stream_bench.py [rows_per_sec] [seconds]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F


def main() -> None:
    rows_per_sec = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    run_secs = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from tranquility_spark.session import get_spark
    from tranquility_spark.specs import (
        Count,
        DimensionsSpec,
        DoubleSum,
        GranularitySpec,
        IngestSpec,
        TimestampSpec,
    )
    from tranquility_spark.streaming.pipeline import stream_rollup
    from tranquility_spark.streaming.sink import SegmentSink

    spark = get_spark("stream-bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")

    # rate source: monotonically increasing (timestamp, value)
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).cast("string").alias("page"),
            (F.col("value") % 7).cast("double").alias("added"),
        )
    )
    spec = IngestSpec(
        datasource="ratebench",
        timestamp_spec=TimestampSpec(column="ts", format="auto", output="ts"),
        dimensions_spec=DimensionsSpec(dimensions=["page"]),
        metrics=(Count("n"), DoubleSum("added_sum", "added")),
        granularity_spec=GranularitySpec("MINUTE", "SECOND"),
    )
    sink = SegmentSink(f"{work}/seg", "ratebench", "MINUTE")
    rolled = stream_rollup(raw, spec, watermark="5 seconds")
    q = (
        rolled.writeStream.outputMode("append")
        .foreachBatch(sink.foreach_batch())
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )

    t0 = time.time()
    time.sleep(run_secs)
    total_in = 0.0
    batches = 0
    for p in q.recentProgress:
        total_in += p["numInputRows"]
        batches += 1
    q.stop()
    elapsed = time.time() - t0
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "stream_ingest_events_per_sec",
                "value": round(total_in / elapsed),
                "unit": "events/sec",
                "offered_rate": rows_per_sec,
                "batches": batches,
                "seconds": round(elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
