"""Audio fingerprint-family decades (r15b) — the fourth family's OWN
scale measurement.

The audio family rides the dHash/SimHash banding machinery, whose
decades were measured on SimHash (r12/r13). What those runs did NOT
measure is this family's distinct cost profile: a numpy mapInPandas
fingerprint pass (vs blake2b shingle hashing) feeding the same 4x16-bit
hamming bands — and, after the video probe's saturation lesson, the
question that decides whether the banded join survives growth: does the
DIGEST SPACE saturate? Video's 16-byte frame vocabulary saturated
(6.2k -> 8.0k digests across 100x docs, sum-of-squares quadratic, join
divergent). The audio fingerprint is a 64-bit energy-delta signature of
the WHOLE payload — doc-specific by construction — so distinct digests
should track the corpus and the hottest (band, bval) bucket should stay
flat. This probe verifies that across 5k -> 50k -> 500k docs and times
the three serving shapes:

1. inline (dd25): fingerprint + banded pairs, every run;
2. served (dd26): pairs from a pre-built (band, bval)-bucketed index;
3. incremental (dd27's shape): the 20% batch probed against the 80%
   registry.

Reported per size: distinct digests, hottest band bucket, banded
candidate count (the sum-of-bucket-squares the join actually pays),
pair count, and min-of-3 walls (noop-sink; index builds reported
separately as ingest cost). Results -> SCALE.md.

Usage: python3 scripts/run_audio_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1
        /tmp/spark_graft_sf10)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX_ROOT = "/tmp/spark_graft_audio_probe"


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
        audio_fp_band_index,
        audio_fp_incremental_pairs,
        audio_fp_index_write,
        audio_fp_neardup_pairs,
        audio_fp_pairs_from_index,
    )
    from tranquility_spark.operators.multimodal import (
        attach_binary_payload,
        audio_energy_fingerprint,
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
        fps = audio_energy_fingerprint(attach_binary_payload(docs))
        # warm the Python UDF workers before any timed row (the video
        # probe's 5k contamination lesson)
        fps.count()

        # saturation + hot-bucket facts the banded join's cost rides on
        idx = audio_fp_band_index(fps)
        n_digests = idx.select("sighex").distinct().count()
        bucket_stats = (
            idx.select("sighex", "band", "bval")
            .distinct()
            .groupBy("band", "bval")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.max("sz").alias("max_bucket"),
                F.sum(F.col("sz") * F.col("sz")).alias("sum_bucket_sq"),
            )
            .collect()[0]
        )

        # count from the SAME DataFrame best_of just timed (the video
        # probe's re-demux-per-count lesson)
        df_inline = audio_fp_neardup_pairs(fps, threshold=3)
        inline = best_of(df_inline)
        n_pairs = df_inline.count()

        table = f"audio_probe_{n_docs}"
        loc = os.path.join(INDEX_ROOT, table)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(loc, ignore_errors=True)
        n_buckets = max(4, min(32, n_docs // 10_000))
        t0 = time.time()
        audio_fp_index_write(fps, table, num_buckets=n_buckets, path=loc)
        build_s = round(time.time() - t0, 2)
        served = best_of(
            audio_fp_pairs_from_index(spark.table(table), threshold=3)
        )

        # incremental: 20% batch vs an 80% registry (dd27's split)
        reg_table = f"audio_probe_reg_{n_docs}"
        reg_loc = os.path.join(INDEX_ROOT, reg_table)
        spark.sql(f"DROP TABLE IF EXISTS {reg_table}")
        shutil.rmtree(reg_loc, ignore_errors=True)
        audio_fp_index_write(
            audio_energy_fingerprint(
                attach_binary_payload(docs.filter(F.col("doc_id") % 5 != 0))
            ),
            reg_table,
            num_buckets=n_buckets,
            path=reg_loc,
        )
        new_fps = audio_energy_fingerprint(
            attach_binary_payload(docs.filter(F.col("doc_id") % 5 == 0))
        )
        incremental = best_of(
            audio_fp_incremental_pairs(
                new_fps, spark.table(reg_table), threshold=3
            )
        )

        row = {
            "sf_dir": sf_dir,
            "docs": n_docs,
            "n_digests": n_digests,
            "max_band_bucket": bucket_stats["max_bucket"],
            "sum_bucket_sq": bucket_stats["sum_bucket_sq"],
            "n_pairs": n_pairs,
            "inline_s": inline,
            "index_build_s": build_s,
            "served_s": served,
            "incremental_s": incremental,
            "n_buckets": n_buckets,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "audio_fp_decades", "results": results}))


if __name__ == "__main__":
    main()
