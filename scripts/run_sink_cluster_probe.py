"""Ingest->serving closure for SegmentSink(cluster_by=) at a measured
decade (r15, VERDICT r14 #5).

Round 14 proved the sink's clustering contract structurally at fixture
scale: write_batch keeps each micro-batch file sorted on the cluster
dims, compact() re-sorts closed buckets, and the committed read pushes
range predicates into the scan (plan/footer-asserted in
tests/test_clustered.py). What was NOT yet measured is the claim those
tests encode: that a compacted STREAMING layout reaches the same flat
serving shape dq21's batch-built ``write_range_clustered`` layout
measured in r14 — i.e. that compaction is the step that turns N
unskippable micro-batch runs into a row-group-skippable segment.

This probe drives the REAL streaming path at two corpus sizes (1M and
10M events — a decade):

1. ingest the events fixture through ``SegmentSink(cluster_by=
   ["value"])`` in 10 micro-batches of hash-random arrival order
   (each ``write_batch`` pays only its per-task sort — no extra
   shuffle). The cluster dimension is ``value`` and NOT ``user_id``
   because the decade fixtures assign each YEAR a disjoint user-id
   slice — the primary time bucketing already prunes any user_id range
   and clustering could show nothing. ``value`` is identically
   distributed in every bucket (verified), which is exactly Druid's
   ``single_dim`` case: secondary partitioning on a dimension the time
   partitioning does NOT separate;
2. serve a fixed ~1%-selectivity value band ([100, 104) — 1.04%
   measured) from the committed snapshot BEFORE compaction;
3. ``compact()`` (the sink re-sorts each closed bucket on the cluster
   dims) and serve the same range from the compacted snapshot;
4. control: the same ingest WITHOUT cluster_by, compacted, same scan —
   isolates what the clustering contract buys vs compaction alone.

Reported per variant: wall (min-of-3, noop-sink materialization — the
r12 convention), plus the footer truth the reader actually exploits:
row groups and rows whose user_id min/max overlap the range, out of the
total (pyarrow metadata, no Spark in the audit path).

Why row-group mechanics differ pre/post compaction: a 10-batch ingest
leaves each (bucket, shard) with 10 small files; each file IS sorted on
value but is a single parquet row group spanning the full value domain —
sorted-but-unskippable (footer min/max can never exclude it). Compaction
collapses the bucket to ONE file whose 2 MB row groups cover tight,
near-disjoint value ranges — the 1% band then overlaps ~1 row group per
bucket and the footers exclude the rest. Row-group size is pinned to
2 MB for ALL variants (fairness): at this probe's compacted-bucket size
(~3-12 MB) the 128 MB default would leave one row group per file — the
skip-granularity pathology r14 measured — while production segments at
100 TB are hundreds of MB and hit the same multi-row-group regime with
the default.

Results land in SCALE.md (measurement script, not bench — anchors stay
frozen).

Usage: python3 scripts/run_sink_cluster_probe.py [sf_dir ...]
       (default: /tmp/spark_graft_sf1 /tmp/spark_graft_sf10)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SINK_ROOT = "/tmp/spark_graft_sink_cluster"
ROW_GROUP_BYTES = 2 << 20
N_BATCHES = 10
RANGE_LO, RANGE_HI = 100.0, 104.0  # ~1.04% of rows (measured, every bucket)


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
        .config("spark.hadoop.parquet.block.size", str(ROW_GROUP_BYTES))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(ROW_GROUP_BYTES))

    from tranquility_spark.sources.files import load_table
    from tranquility_spark.streaming.sink import SegmentSink, compact

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    def footer_audit(files):
        """(row_groups_overlapping, row_groups_total, rows_overlapping,
        rows_total) for the fixed value band, from parquet footers —
        the same statistics the vectorized reader consults."""
        import pyarrow.parquet as pq

        rg_hit = rg_all = rows_hit = rows_all = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = idx["value"]
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                rg_all += 1
                rows_all += rg.num_rows
                st = rg.column(ci).statistics
                if (
                    st is None
                    or not st.has_min_max
                    or (st.min < RANGE_HI and st.max >= RANGE_LO)
                ):
                    rg_hit += 1
                    rows_hit += rg.num_rows
        return rg_hit, rg_all, rows_hit, rows_all

    def serve(sink):
        got = (
            sink.read(spark, committed_only=True)
            .filter(
                (F.col("value") >= RANGE_LO) & (F.col("value") < RANGE_HI)
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("user_id").alias("n_users"),
            )
        )
        return best_of(got)

    results = []
    for sf_dir in dirs:
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_id", "user_id", "event_type", "value", "props"
        )
        n_rows = ev.count()
        for kind, cluster in (("clustered", ["value"]), ("control", None)):
            root = os.path.join(
                SINK_ROOT, f"{os.path.basename(sf_dir.rstrip('/'))}-{kind}"
            )
            shutil.rmtree(root, ignore_errors=True)
            sink = SegmentSink(
                root,
                "probe",
                segment_granularity="YEAR",
                cluster_by=cluster,
            )
            t0 = time.time()
            for b in range(N_BATCHES):
                batch = ev.filter(
                    F.pmod(F.xxhash64("event_id"), F.lit(N_BATCHES)) == b
                )
                sink.write_batch(batch, b + 1)
            ingest_s = time.time() - t0

            row = {
                "sf_dir": sf_dir,
                "kind": kind,
                "rows": n_rows,
                "ingest_s": round(ingest_s, 2),
            }
            if kind == "clustered":
                # pre-compaction serving: sorted micro-batch runs, each a
                # full-domain row group — the shape compaction must fix
                pre_wall = serve(sink)
                rg_h, rg_a, r_h, r_a = footer_audit(sink.committed_files(0))
                row.update(
                    pre_wall_s=round(pre_wall, 3),
                    pre_rg=f"{rg_h}/{rg_a}",
                    pre_rows_frac=round(r_h / max(r_a, 1), 4),
                )
            t0 = time.time()
            compact(sink, spark)
            row["compact_s"] = round(time.time() - t0, 2)
            post_wall = serve(sink)
            rg_h, rg_a, r_h, r_a = footer_audit(sink.committed_files(0))
            row.update(
                post_wall_s=round(post_wall, 3),
                post_rg=f"{rg_h}/{rg_a}",
                post_rows_frac=round(r_h / max(r_a, 1), 4),
            )
            results.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "sink_cluster_closure", "results": results}))


if __name__ == "__main__":
    main()
