"""One-off 10x scale probe (VERDICT r10 #4): time the most expensive catalog
entries at sf0.1 and at the 10x dataset built by make_scale_probe.py, and
print per-entry ratios. Results are recorded in SCALE.md — this is a
measurement script, not part of the bench harness (anchors stay frozen).

Usage: python3 scripts/run_scale_probe.py [sf1_dir] [entry ...]

Second decade (VERDICT r11 #3): set SPARK_GRAFT_PROBE_BASE to a previous
probe dir (e.g. /tmp/spark_graft_sf1) to measure sf1 -> sf10 ratios
instead of sf0.1 -> sf1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "dd2_minhash_lsh_pairs",
    "dd11_bloom_gated_neardup",
    "dd8_incremental_neardup",
    "a10f_gk_quantiles",
    "dd13_semantic_dedup",
    "a10e_kll_deterministic",
    "emb7_dim_covariance",
    "q21_waiting_suppliers",
    "pipe7_chunk_retrieval",
    "pipe3_training_prep",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    entries = sys.argv[2:] or DEFAULT_ENTRIES

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tranquility_spark.catalog import CATALOG

    def best_of(fn, sf_dir, n):
        # ADVICE r11 #1: time a noop-sink write, not .count() — count lets
        # Spark column-prune expensive projected expressions (pipe3's packed
        # text, dd2's pair projection), under-measuring the real workload.
        # The noop source materializes every output column.
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    base = os.environ.get("SPARK_GRAFT_PROBE_BASE", "/root/testdata/sf0.1")
    rows = []
    for name in entries:
        fn = CATALOG[name].fn
        small = best_of(fn, base, 3)
        big = best_of(fn, sf1_dir, 2)
        rows.append(
            {
                "entry": name,
                "base": round(small, 3),
                "scaled": round(big, 3),
                "ratio": round(big / small, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"probe": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
