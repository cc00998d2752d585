"""target_files_per_shard decade probe (r15, VERDICT r14 #7b).

r14 made ``compact(target_files_per_shard=k)`` real: a deterministic
row-hash slice key splits each (g, p) into UP TO k files (hash
co-location may merge slices), where the old code always collapsed to
one file regardless of the target — silently producing oversized files
where the caller asked for bounded ones. That behavior is
correctness-tested (tests/test_streaming.py) but was never MEASURED:
does the slice key change compaction cost, does it actually bound file
sizes at scale, and does convergence (re-run is a no-op) hold once
file counts sit at the target?

This probe ingests the events fixture through a plain ``SegmentSink``
in 10 micro-batches (YEAR buckets), then for k in (1, 4) compacts a
fresh copy of that layout and reports:

- ``compact_s``: the rewrite wall (min over the single honest run —
  compaction is a maintenance job, not a serving query; run-to-run
  noise is reported by the decade pair, not min-of-3);
- ``files_per_dir``: max files in any (g, p) dir after compaction
  (must be <= k);
- ``max_file_mb``: the bound the target exists to provide;
- ``reruns_noop``: a second compact() returns 0 (convergence — the
  over-target check n > k must not see its own output as work).

Results land in SCALE.md (measurement script, not bench).

Usage: python3 scripts/run_compact_target_probe.py [sf_dir ...]
       (default: /tmp/spark_graft_sf1 /tmp/spark_graft_sf10)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_ROOT = "/tmp/spark_graft_compact_target"
N_BATCHES = 10


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
    from tranquility_spark.streaming.sink import SegmentSink, compact

    results = []
    for sf_dir in dirs:
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_id", "user_id", "event_type", "value", "props"
        )
        n_rows = ev.count()
        for k in (1, 4):
            root = os.path.join(
                PROBE_ROOT,
                f"{os.path.basename(sf_dir.rstrip('/'))}-k{k}",
            )
            shutil.rmtree(root, ignore_errors=True)
            sink = SegmentSink(root, "probe", segment_granularity="YEAR")
            for b in range(N_BATCHES):
                sink.write_batch(
                    ev.filter(
                        F.pmod(F.xxhash64("event_id"), F.lit(N_BATCHES)) == b
                    ),
                    b + 1,
                )
            t0 = time.time()
            compact(sink, spark, target_files_per_shard=k)
            compact_s = time.time() - t0
            files_per_dir: dict[str, int] = {}
            max_bytes = 0
            for rel in sink.committed_files(0):
                d = os.path.dirname(rel)
                files_per_dir[d] = files_per_dir.get(d, 0) + 1
                max_bytes = max(max_bytes, os.path.getsize(rel))
            row = {
                "sf_dir": sf_dir,
                "rows": n_rows,
                "target_k": k,
                "compact_s": round(compact_s, 2),
                "files_per_dir": max(files_per_dir.values()),
                "max_file_mb": round(max_bytes / (1 << 20), 1),
                "reruns_noop": compact(sink, spark, target_files_per_shard=k)
                == 0,
            }
            assert row["files_per_dir"] <= k, row
            results.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "compact_target_decade", "results": results}))


if __name__ == "__main__":
    main()
