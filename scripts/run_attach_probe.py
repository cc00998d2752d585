"""SegmentSink.attach() at a measured decade (r15b) — the last unprobed
leg of the ingest path.

run_sink_cluster_probe.py (r15) measured the clustered sink's
ingest->serving closure by calling ``write_batch`` directly in a loop.
``attach()`` wires the SAME write_batch through Spark's Structured
Streaming engine (``writeStream.foreachBatch`` + checkpoint) — the form
a production deployment actually runs — but had only fixture-scale e2e
tests. This probe drives the REAL streaming engine over the 1M and 10M
event fixtures and answers three questions the tests can't:

1. what the engine itself charges at scale: attach-ingest wall vs a
   direct write_batch loop over the SAME 10 hash-split micro-batches
   (checkpoint WAL, offset tracking, per-batch planning);
2. whether the streamed layout is byte-equivalent WHERE IT MATTERS:
   committed row count, per-(bucket, shard) file sortedness, and the
   served 1%-band aggregate must match the direct loop's sink exactly;
3. whether engine-level exactly-once composes with the sink's marker
   protocol at scale: a second attach() on the SAME checkpoint must
   ingest zero new batches and change nothing (availableNow over an
   exhausted source), and the committed snapshot must be stable across
   it.

Micro-batch construction: the fixture is pre-split into 10 single-file
parquet batches by the same pmod(xxhash64(event_id), 10) key the r15
probe used (identical batch composition), and the stream reads them
with maxFilesPerTrigger=1 under availableNow — 10 real engine batches.

Results -> SCALE.md (measurement script, not bench).

Usage: python3 scripts/run_attach_probe.py [sf_dir ...]
       (default: /tmp/spark_graft_sf1 /tmp/spark_graft_sf10)
"""

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/spark_graft_attach"
N_BATCHES = 10
RANGE_LO, RANGE_HI = 100.0, 104.0  # the r15 probe's ~1% value band


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/spark_graft_sf1", "/tmp/spark_graft_sf10"]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.sources.files import load_table
    from tranquility_spark.streaming.sink import SegmentSink

    def served(sink):
        return sorted(
            map(
                tuple,
                sink.read(spark, committed_only=True)
                .filter(
                    (F.col("value") >= RANGE_LO) & (F.col("value") < RANGE_HI)
                )
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.count_distinct("user_id").alias("n_users"),
                )
                .collect(),
            )
        )

    results = []
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        base = os.path.join(ROOT, tag)
        shutil.rmtree(base, ignore_errors=True)

        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_id", "user_id", "event_type", "value", "props"
        )
        n_rows = ev.count()

        # pre-split into 10 single-file batches (identical composition to
        # the r15 write_batch probe); coalesce(1) pins one file per batch
        # so maxFilesPerTrigger=1 == one engine batch per split
        src = os.path.join(base, "src")
        for b in range(N_BATCHES):
            ev.filter(
                F.pmod(F.xxhash64("event_id"), F.lit(N_BATCHES)) == b
            ).coalesce(1).write.parquet(os.path.join(src, f"b{b}"))
        schema = spark.read.parquet(os.path.join(src, "b0")).schema

        # -- direct write_batch loop (the r15 probe's path), same session
        direct = SegmentSink(
            os.path.join(base, "direct"),
            "probe",
            segment_granularity="YEAR",
            cluster_by=["value"],
        )
        t0 = time.time()
        for b in range(N_BATCHES):
            direct.write_batch(
                spark.read.parquet(os.path.join(src, f"b{b}")), b
            )
        direct_s = round(time.time() - t0, 2)

        # -- attach(): the REAL engine path over the same 10 files
        streamed = SegmentSink(
            os.path.join(base, "streamed"),
            "probe",
            segment_granularity="YEAR",
            cluster_by=["value"],
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*"))
        )
        ckpt = os.path.join(base, "ckpt")
        t0 = time.time()
        q = streamed.attach(stream, ckpt, trigger={"availableNow": True})
        q.awaitTermination()
        attach_s = round(time.time() - t0, 2)

        row = {
            "sf_dir": sf_dir,
            "rows": n_rows,
            "direct_ingest_s": direct_s,
            "attach_ingest_s": attach_s,
            "engine_overhead": round(attach_s / direct_s, 2),
            "n_batches": len(streamed.committed_batch_ids()),
        }

        # contract equivalence: same committed rows, same served band
        assert (
            streamed.read(spark, committed_only=True).count() == n_rows
        ), "attach() lost rows"
        assert served(streamed) == served(direct), "served band diverged"

        # per-file sortedness on the cluster dim survives the engine path
        import pyarrow.parquet as pq

        unsorted = 0
        for f in streamed.committed_files(0):
            vals = pq.read_table(f, columns=["value"])["value"].to_pylist()
            if vals != sorted(vals):
                unsorted += 1
        row["unsorted_files"] = unsorted
        assert unsorted == 0, "cluster_by sortedness lost through attach()"

        # exactly-once composition: re-attach on the same checkpoint over
        # the exhausted source — zero new batches, snapshot unchanged
        before = served(streamed)
        n_markers = len(streamed.committed_batch_ids())
        q2 = streamed.attach(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "b*")),
            ckpt,
            trigger={"availableNow": True},
        )
        q2.awaitTermination()
        row["replay_new_batches"] = (
            len(streamed.committed_batch_ids()) - n_markers
        )
        assert row["replay_new_batches"] == 0, "checkpoint replay re-ingested"
        assert served(streamed) == before, "replay changed the snapshot"

        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "attach_decade", "results": results}))


if __name__ == "__main__":
    main()
