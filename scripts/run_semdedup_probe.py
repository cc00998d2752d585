"""SemDeDup production-shape decades: learned centroids with C scaling
(r15, VERDICT r14 #7a).

dd13b's catalog fixture pins ``n_centroids=16`` — deliberately, as a
certification artifact (its contract probe dd13c re-derives the keep
rule from scratch on exactly that index; HANDOFF: do NOT scale C in the
entry). But the production recipe the dd13/samp9 docstrings describe
scales C WITH the corpus so expected cluster size — and therefore the
sum-of-cluster-squared pair space that makes SemDeDup sub-quadratic —
stays bounded. That shape was prose until now; this probe measures it.

At each corpus size, C = N / 125 (the bench fixture's 2000 vecs / 16
centroids ratio, held constant): expected cluster ≈ 125 vectors, pair
space ≈ N * 125 — LINEAR in N where fixed C would grow it
quadratically. Reported per size:

- ``build_s``: ``similarity.ivf_centroids`` (hash-sample seeds + one
  Lloyd pass — one TakeOrdered + one bounded corpus pass; C x 64
  floats on the driver, decimal-accumulated means);
- ``dedup_s``: ``dedup.semantic_dedup`` over those centroids (numpy-
  matmul assignment, cluster_id-shuffled pair fold), noop-sink
  materialized, min-of-3 (min-of-2 at the largest size);
- ``max_cluster`` / ``pairs_bound`` (sum of cluster^2): the measured
  skew truth behind the wall clock — Lloyd on rotated-copy fixtures
  is not perfectly balanced, and the bound column shows how far the
  realized pair space sits from the uniform-cluster ideal.

Results land in SCALE.md (measurement script, not bench — dd13b's
anchor stays the fixed-C certification fixture).

Usage: python3 scripts/run_semdedup_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1
        /tmp/spark_graft_sf10)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VECS_PER_CENTROID = 125  # the bench fixture's 2000/16 ratio, held constant
TAU = 0.35  # dd13's tau


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

    from tranquility_spark.operators import similarity as sim
    from tranquility_spark.operators.dedup import semantic_dedup
    from tranquility_spark.sources.files import load_table

    results = []
    for sf_dir in dirs:
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        c = max(16, n // VECS_PER_CENTROID)
        t0 = time.time()
        cents = sim.ivf_centroids(emb, n_centroids=c)
        build_s = time.time() - t0

        deduped = semantic_dedup(emb, cents, tau=TAU)
        runs = 3 if n <= 50_000 else 2
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            deduped.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)

        sizes = (
            deduped.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.max("sz").alias("max_sz"),
                F.sum(F.col("sz") * F.col("sz")).alias("pairs_bound"),
            )
            .first()
        )
        row = {
            "sf_dir": sf_dir,
            "n_vecs": n,
            "n_centroids": c,
            "build_s": round(build_s, 2),
            "dedup_s": round(best, 2),
            "max_cluster": int(sizes["max_sz"]),
            "pairs_bound": int(sizes["pairs_bound"]),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"probe": "semdedup_c_scaling", "results": results}))


if __name__ == "__main__":
    main()
