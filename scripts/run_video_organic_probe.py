"""Video containment decades on an ARTIFACT-FREE fixture (r15b followup).

run_video_probe.py measured the boilerplate regime: the standard probe
fixture's token-suffix transform creates cross-copy shared frames, the
digest space saturates, Σ df² goes quadratic, and the uncapped join
diverges — the regime max_df exists for. What that fixture CANNOT show
is the family's ORGANIC scaling: how the uncapped join behaves when a
10× corpus brings 10× genuinely-new content.

This probe builds that fixture: each copy's text is PREFIXED with a
distinct marker. A prefix changes every frame offset downstream
((fi*13000) % (len-16) shifts with len, and every slice's bytes move),
so cross-copy frame digests were EXPECTED to decorrelate. (Precision
note, r15b third review: only copy 0 is byte-identical to the
originals — every OTHER copy's docs share that copy's uniform prefix,
so within-copy pair structure is length-shifted, not preserved
verbatim; the controlled variable here is cross-copy digest overlap,
and the saturation statistics below do not depend on within-copy pair
preservation.)

MEASURED RESULT (kept because it refutes the hypothesis): the prefix
does NOT decorrelate. At 50k docs the fixture shows the SAME
saturation as the suffix fixture (7,101 distinct digests vs 7,694;
max df 1,206 vs 1,116; Σ df² 6.9e7 vs 8.8e7) and the 500k uncapped
point diverges identically. The saturation is INTRINSIC to
low-entropy frame content: 16-byte slices of text-like bytes, tiled
to 72 and gradient-bitted, occupy a digest space far smaller than
2^64 — shifting offsets just resamples the same structured
distribution. The right reading for production: digest diversity is a
property of the FRAME CONTENT (real pixel frames are high-entropy,
recurring title cards are not), not of how the corpus grew — so
max_df stays load-bearing wherever frames repeat, and the "organic vs
boilerplate" split the first probe suggested is really a
"high-entropy vs low-entropy frames" split. Results -> SCALE.md.

Usage: python3 scripts/run_video_organic_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
FIXTURE_ROOT = "/tmp/spark_graft_video_organic"
# bump when the transform or source corpus changes — fixture dirs are
# keyed on it, so a scheme edit cannot silently reuse stale files (the
# salt/skew-probe stale-fixture lesson, applied on arrival this time)
FIXTURE_VERSION = "v1"
SIZES = [1, 10, 100]  # copies of the 5k-doc base -> 5k / 50k / 500k


def main() -> None:
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
        video_neardup_pairs,
    )
    from tranquility_spark.operators.multimodal import (
        attach_binary_payload,
        video_frame_hashes,
    )

    base = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id", "text")
    n_base = base.count()

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    results = []
    for copies in SIZES:
        path = os.path.join(FIXTURE_ROOT, f"{FIXTURE_VERSION}-c{copies}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            parts = []
            for i in range(copies):
                c = base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    # copy 0 byte-identical (organic pairs preserved);
                    # each other copy gets a DISTINCT prefix, shifting
                    # every frame offset and slice downstream
                    (
                        F.col("text")
                        if i == 0
                        else F.concat(F.lit(f"[c{i}] "), F.col("text"))
                    ).alias("text"),
                )
                parts.append(c)
            out = parts[0]
            for c in parts[1:]:
                out = out.unionByName(c)
            out.write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        assert n_docs == n_base * copies

        fps = video_frame_hashes(attach_binary_payload(docs))
        fps.count()  # warm the UDF workers before any timed row

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

        # same uncapped budget guard as run_video_probe.py — this
        # fixture saturates identically (see module docstring), so the
        # 500k uncapped point diverges identically
        if df_stats["sum_df_sq"] <= 200_000_000:
            df_unc = video_neardup_pairs(fps, min_shared=2)
            inline = best_of(df_unc)
            n_pairs = df_unc.count()
        else:
            inline = None
            n_pairs = None

        row = {
            "docs": n_docs,
            "n_digests": df_stats["n_digests"],
            "max_df": df_stats["max_df"],
            "sum_df_sq": df_stats["sum_df_sq"],
            "n_pairs_uncapped": n_pairs,
            "inline_uncapped_s": inline,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "video_organic_decades", "results": results}))


if __name__ == "__main__":
    main()
