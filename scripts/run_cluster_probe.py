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

What this probe established (r14 — the honest result, not the expected
one; full discussion in SCALE.md r14):

- the layout's structural effects are real and measured: a ~1% range
  touches 2.4% of corpus rows on the clustered layout vs 100% on the
  shuffled one (``rows_touched_frac``, from the same footer stats the
  reader consults), and sorted data compresses ~43% smaller (750 vs
  1315 MB at 100M rows) — on a cold object store those ARE the cost;
- row-group skipping works: the sel_none probe (statically-empty range)
  costs footer-evaluation only (~0.15 s) on BOTH layouts vs ~4 s full
  decode;
- but on a WARM PAGE CACHE this box's wall-clock does NOT reward the
  layout (0.56-0.9x at 1% selectivity — slower!), for two measured
  reasons: (1) Spark 4's filtered vectorized read costs ~proportional
  to MATCHING rows even on the unsorted layout (shuffled sel_25pct runs
  at 35% of its own sel_all, where decode-then-filter predicts ~100%),
  so skipping mostly saves IO the cache already made free; (2) the
  clustered layout CONCENTRATES matching rows into few splits (a 19 MB
  hot file = 2 tasks) while the shuffled layout spreads the same
  post-filter work across every core. Both effects are small-fixture
  artifacts of cache-resident data: at 100 TB the hot region of the
  same selectivity is thousands of splits (concentration vanishes) and
  the skipped bytes are cold-store reads (the 40x touched-bytes ratio
  becomes the bill). The probe reports all selectivities so the regime
  boundary is visible rather than averaged away.

Sizing knobs (applied to BOTH layouts; fairness): row groups at 16 MB
(``parquet.block.size`` — the skip AND split granularity; the 128 MB
default made one 75 MB file ONE task) and
``spark.sql.files.maxPartitionBytes`` to match.

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
ROW_GROUP_BYTES = 16 << 20


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
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(ROW_GROUP_BYTES))

    from tranquility_spark.sources.clustered import (
        files_overlapping,
        range_stats,
        write_range_clustered,
    )
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
        # content-key the cached layouts on the source fixture (the
        # catalog's _index_cache_key fingerprint — handles both single
        # files and Spark part-file directories): a regenerated fixture
        # at the same path must never reuse layouts built from old rows
        from tranquility_spark.catalog_llm import (
            _index_cache_digest,
            _index_cache_key,
        )

        tag = (
            f"{os.path.basename(sf_dir.rstrip('/'))}-"
            f"{_index_cache_digest('cluster-probe', _index_cache_key(sf_dir, table='events'))[:12]}"
        )
        # include the payload column: a range query that prunes 97% of
        # files saves 97% of PAYLOAD DECODE, and on a warm local page
        # cache decode is where the time actually goes (the narrow
        # 4-column projection measured ~1.0x — the skip saved IO the
        # cache had already made free)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value", "props"
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
                    write_range_clustered(
                        ev,
                        path,
                        "user_id",
                        n_files=n_files,
                        row_group_bytes=ROW_GROUP_BYTES,
                    )
                else:
                    (
                        ev.repartition(n_files)
                        .write.mode("overwrite")
                        .option("parquet.block.size", str(ROW_GROUP_BYTES))
                        .parquet(path)
                    )

        # ~1% of the id domain, anchored mid-range so it never straddles
        # the domain edges where both layouts trivially agree
        span = max(1, (hi_id - lo_id + 1) // 100)
        qlo = lo_id + (hi_id - lo_id) // 2
        qhi = qlo + span
        pred_sql = f"user_id >= {qlo} AND user_id < {qhi}"

        # structural bytes-touched: fraction of corpus rows in files whose
        # footer range overlaps the query — what a cold store would READ
        touched = {}
        for kind, path in layouts.items():
            stats = range_stats(path, "user_id")
            import pyarrow.parquet as pq

            rows_by_file = {
                f: pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for (f, _mn, _mx, _n) in stats
            }
            hit = set(files_overlapping(stats, qlo, qhi))
            touched[kind] = round(
                sum(rows_by_file[f] for f in hit) / max(sum(rows_by_file.values()), 1),
                4,
            )

        # THREE selectivities of the SAME query shape per layout — they
        # separate the effects a single comparison muddles together:
        #   sel_none  — footer/stat evaluation only: what skipping costs
        #               when it excludes everything (both layouts skip
        #               all groups; the clustered advantage is zero by
        #               construction — a sanity floor);
        #   sel_1pct  — the serving case: clustered touches only the
        #               footer-overlapping files, shuffled touches all;
        #   sel_all   — full decode through the same predicate path:
        #               isolates the 43%-compression effect of sorted
        #               data (same rows, fewer bytes) from skipping.
        # sel_25pct probes the regime where the hot region spans enough
        # splits to use the cores (at this fixture size a 1% hot region is
        # ~2 splits — the post-filter agg serializes on 2 cores locally,
        # a floor that disappears at cluster scale where 1% of the corpus
        # is thousands of splits; see the SCALE.md r14 discussion)
        q25lo = lo_id + (hi_id - lo_id) // 4
        q25hi = q25lo + (hi_id - lo_id) // 4
        preds = {
            "sel_none": f"user_id >= {lo_id - 10} AND user_id < {lo_id - 5}",
            "sel_1pct": pred_sql,
            "sel_25pct": f"user_id >= {q25lo} AND user_id < {q25hi}",
            "sel_all": f"user_id >= {lo_id} AND user_id <= {hi_id}",
        }
        timings: dict[str, dict[str, float]] = {k: {} for k in preds}
        counts = {}
        sizes = {}
        for kind, path in layouts.items():
            sizes[kind] = (
                sum(
                    os.path.getsize(os.path.join(path, f))
                    for f in os.listdir(path)
                    if f.endswith(".parquet")
                )
                >> 20
            )
            for sel, pred in preds.items():
                df = (
                    spark.read.parquet(path)
                    .filter(F.expr(pred))
                    .groupBy("event_type")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(F.col("value").cast("decimal(28,6)"))
                        .cast("double")
                        .alias("s"),
                        F.sum(F.length("props")).alias("payload_chars"),
                    )
                )
                if sel == "sel_1pct":
                    # layout-integrity parity: MATCHING ROW counts (a
                    # grouped-frame count only compares the number of
                    # event_type groups — vacuous against a lost or
                    # duplicated layout)
                    counts[kind] = (
                        spark.read.parquet(path).filter(F.expr(pred)).count()
                    )
                timings[sel][kind] = round(best_of(df), 3)
        assert counts["clustered"] == counts["shuffled"], counts
        rows.append(
            {
                "fixture": tag,
                "rows": int(n_rows),
                "n_files": n_files,
                "range": [int(qlo), int(qhi)],
                "layout_mb": sizes,
                "rows_touched_frac": touched,
                "timings_s": timings,
                "speedup_1pct": round(
                    timings["sel_1pct"]["shuffled"] / timings["sel_1pct"]["clustered"],
                    2,
                ),
            }
        )
        print(json.dumps(rows[-1]))

    print(json.dumps({"probe": "range_clustered_scan", "rows": rows}))


if __name__ == "__main__":
    main()
