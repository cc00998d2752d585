"""Range-clustered layout probe (r14): measure what the sorted, range-
partitioned parquet layout (sources/clustered.py — Druid single_dim/range
secondary-partitioning analog) actually buys at scale.

For each events fixture given, this writes TWO layouts of the same rows
and the same file count once each:

- clustered: repartitionByRange(n, user_id) + sortWithinPartitions —
             tight near-disjoint footer min/max per file/row group;
- shuffled:  repartition(n) — every file spans the whole user_id domain
             (the footer stats exist but can never exclude a row group).

…then times the SAME ~1%-of-domain range aggregate over both. The delta is
pure row-group skipping: identical rows, identical file count, identical
plan shape (PushedFilters in both) — only the statistics differ. n is
sized from the corpus (~2.5M rows/file, floor 8 — the dd19 bucket-sizing
lesson: fixed small counts cap parallelism, fixed large counts shrink row
groups until the skip granularity is noise).

Results are recorded in SCALE.md — measurement script, not bench (anchors
stay frozen). Timing is the r12 noop-sink materialization, min-of-3.

Usage: python3 scripts/run_cluster_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYOUT_ROOT = "/tmp/spark_graft_cluster"
ROWS_PER_FILE = 2_500_000


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]

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

    from tranquility_spark.sources.clustered import write_range_clustered
    from tranquility_spark.sources.files import load_table

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    rows = []
    for sf_dir in dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        n_rows, lo_id, hi_id = ev.agg(
            F.count(F.lit(1)), F.min("user_id"), F.max("user_id")
        ).first()
        n_files = max(8, int(n_rows // ROWS_PER_FILE))
        layouts = {}
        for kind in ("clustered", "shuffled"):
            path = os.path.join(LAYOUT_ROOT, f"{tag}-{kind}-n{n_files}")
            layouts[kind] = path
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                if kind == "clustered":
                    write_range_clustered(ev, path, "user_id", n_files=n_files)
                else:
                    ev.repartition(n_files).write.mode("overwrite").parquet(path)

        # ~1% of the id domain, anchored mid-range so it never straddles
        # the domain edges where both layouts trivially agree
        span = max(1, (hi_id - lo_id + 1) // 100)
        qlo = lo_id + (hi_id - lo_id) // 2
        qhi = qlo + span
        pred_sql = f"user_id >= {qlo} AND user_id < {qhi}"

        timings = {}
        counts = {}
        for kind, path in layouts.items():
            df = (
                spark.read.parquet(path)
                .filter(F.expr(pred_sql))
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(28,6)"))
                    .cast("double")
                    .alias("s"),
                )
            )
            counts[kind] = df.count()
            timings[kind] = round(best_of(df), 3)
        assert counts["clustered"] == counts["shuffled"], counts
        rows.append(
            {
                "fixture": tag,
                "rows": int(n_rows),
                "n_files": n_files,
                "range": [int(qlo), int(qhi)],
                "clustered_s": timings["clustered"],
                "shuffled_s": timings["shuffled"],
                "speedup": round(timings["shuffled"] / timings["clustered"], 2),
            }
        )
        print(json.dumps(rows[-1]))

    print(json.dumps({"probe": "range_clustered_scan", "rows": rows}))


if __name__ == "__main__":
    main()
