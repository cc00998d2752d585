"""Video containment-dedup decades (r15b) — the new family's OWN scale
measurement.

The four hamming-banded families ride SimHash's measured decades (same
bucket mechanics); the video family's shape is NEW — an inverted
(fhash -> doc) index self-join whose cost is sum over digests of df²,
plus a demux+hash pass the serving form amortizes away. This probe
measures both claims across two corpus decades (5k -> 50k -> 500k docs,
the 10x probe fixtures):

1. inline (dd28's path): demux + frame-hash + pairs, every run;
2. served (dd29's path): pairs from a pre-built fhash-bucketed index —
   the ingest-amortized form that should hold its multiple as the
   corpus grows (the decode never re-runs);
plus the distribution facts the df² bound rides on: distinct digests,
hottest document frequency, and sum(df²) — if the hot tail grew
super-linearly, the uncapped join would too, and max_df would stop
being optional.

Timing: min-of-3 noop-sink materialization (the r12 convention); the
served index is built once per size before timing (reported as
build_s — the ingest-side cost). Results -> SCALE.md (measurement
script, not bench).

Usage: python3 scripts/run_video_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1
        /tmp/spark_graft_sf10)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX_ROOT = "/tmp/spark_graft_video_probe"


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_sf1",
        "/tmp/spark_graft_sf10",
    ]

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

    from tranquility_spark.operators.dedup import (
        video_frame_index,
        video_index_write,
        video_neardup_pairs,
        video_pairs_from_index,
    )
    from tranquility_spark.operators.multimodal import (
        attach_binary_payload,
        video_frame_hashes,
    )
    from tranquility_spark.sources.files import load_table

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    results = []
    for sf_dir in dirs:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        fps = video_frame_hashes(attach_binary_payload(docs))
        # warm the Python UDF workers before ANY timed row (the bench.py
        # lesson, applied to probes after the 5k uncapped row measured
        # 4.07 s cold vs 0.56 s warm — worker fork, not plan cost)
        fps.count()

        # the df² facts the scale bound rides on
        idx = video_frame_index(fps)
        df_stats = (
            idx.groupBy("fhash")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.count(F.lit(1)).alias("n_digests"),
                F.max("df").alias("max_df"),
                F.sum(F.col("df") * F.col("df")).alias("sum_df_sq"),
            )
            .collect()[0]
        )

        # UNCAPPED inline only while the corpus's hot tail permits it: at
        # 500k probe docs sum_df_sq reaches ~1e10 (the suffix-token
        # transform makes cross-copy boilerplate frames GROW with copy
        # count — df 58 -> 1116 -> ~1e4) and the self-join diverged on
        # this box (killed after 15 min of escalating GCLocker retries).
        # That divergence IS the df² bound doing what it says; the capped
        # rows below are the production shape. The threshold is a probe
        # guard, not a product knob.
        cap = 64  # ~the 5k corpus's organic hottest df: removes only
        # frames that are boilerplate at EVERY probe size
        if df_stats["sum_df_sq"] <= 200_000_000:
            # count from the SAME DataFrame best_of just timed: a fresh
            # call would rebuild the localCheckpoint and re-pay the full
            # demux per count (second-review finding)
            df_unc = video_neardup_pairs(fps, min_shared=2)
            inline = best_of(df_unc)
            n_pairs = df_unc.count()
        else:
            inline = None
            n_pairs = None
        df_cap = video_neardup_pairs(fps, min_shared=2, max_df=cap)
        inline_capped = best_of(df_cap)
        n_pairs_capped = df_cap.count()

        # served: build the bucketed index once (ingest-side), then time
        # the query path alone
        table = f"video_probe_{n_docs}"
        loc = os.path.join(INDEX_ROOT, table)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(loc, ignore_errors=True)
        n_buckets = max(4, min(32, n_docs // 10_000))
        t0 = time.time()
        video_index_write(fps, table, num_buckets=n_buckets, path=loc)
        build_s = round(time.time() - t0, 2)
        if df_stats["sum_df_sq"] <= 200_000_000:
            served = best_of(
                video_pairs_from_index(spark.table(table), min_shared=2)
            )
        else:
            served = None
        served_capped = best_of(
            video_pairs_from_index(spark.table(table), min_shared=2, max_df=cap)
        )

        row = {
            "sf_dir": sf_dir,
            "docs": n_docs,
            "n_digests": df_stats["n_digests"],
            "max_df": df_stats["max_df"],
            "sum_df_sq": df_stats["sum_df_sq"],
            "n_pairs": n_pairs,
            "n_pairs_capped": n_pairs_capped,
            "inline_s": inline,
            "inline_capped_s": inline_capped,
            "index_build_s": build_s,
            "served_s": served,
            "served_capped_s": served_capped,
            "n_buckets": n_buckets,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "video_containment_decades", "results": results}))


if __name__ == "__main__":
    main()
