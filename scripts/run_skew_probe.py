"""Skew-join probe (r14): measure what salting / AQE skew-split actually
buy on a pathologically hot key — the SURVEY §2.5 "skew" row had an
equivalence unit test but no measured number.

Workload: FACT (default 50M rows) where ONE key owns 30% of all rows and
the rest spread uniformly over 100k keys, equi-joined to a one-row-per-key
DIM on that key, grouped-aggregated. Broadcast is disabled for the comparison:
the probe models the 100 TB regime where the dim side exceeds broadcast
reach — with broadcast allowed, skew is a non-event (hash lookup per row,
no shuffle; that fact is ALSO part of the answer and is measured as the
"broadcast" row).

Three strategies over identical data:

- naive     — sort-merge join with AQE skew handling OFF: the hot key's
              15M rows land on ONE reducer; the stage is that task.
- aqe       — Spark's own runtime mitigation
              (spark.sql.adaptive.optimizeSkewedJoin, on by default):
              oversized partitions are split AFTER the map stage from
              shuffle statistics.
- salted    — operators/partitioning.salted_join: explicit (key, salt)
              rewrite, hot key spread over salt_buckets reducers at the
              cost of replicating the dim salt_buckets x. The form that
              still works where AQE can't see or split the skew
              (non-shuffle paths, one key >> a post-split partition).

Timing: noop-sink materialization of the joined aggregate, min-of-3 per
strategy. Results → SCALE.md (measurement script, not bench).

Usage: python3 scripts/run_skew_probe.py [fact_rows]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARE = 0.30
N_KEYS = 100_000
SALT_BUCKETS = 16


def main() -> None:
    fact_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000

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

    from tranquility_spark.operators.partitioning import salted_join

    hot_rows = int(fact_rows * HOT_SHARE)
    # key 0 is the hot key; the tail spreads uniformly over keys 1..N_KEYS
    fact = spark.range(fact_rows).select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise((F.xxhash64("id") % (N_KEYS - 1) + (N_KEYS - 1)) % (N_KEYS - 1) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    # one row per key (a real dimension); grp is the post-join group axis
    dim = spark.range(N_KEYS).select(
        F.col("id").cast("long").alias("k"),
        F.col("id").alias("dim_id"),
        (F.col("id") % 7).cast("long").alias("grp"),
    )
    # materialize both sides once so strategy timings exclude generation
    # non-default fact_rows gets its own directory — a bare _SUCCESS
    # check would silently time a stale 50M fixture while reporting the
    # new row count (r15b self-review, found via run_salt_probe's copy)
    suffix = "" if fact_rows == 50_000_000 else f"-{fact_rows}"
    fact_path = f"/tmp/spark_graft_skew/fact{suffix}"
    dim_path = "/tmp/spark_graft_skew/dim"
    for df, path in ((fact, fact_path), (dim, dim_path)):
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            df.write.mode("overwrite").parquet(path)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)

    def agg(joined):
        return joined.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("s"),
        )

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def with_confs(confs):
        for k, v in confs.items():
            spark.conf.set(k, v)

    results = {}
    base_off = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    # sanity: all strategies must agree on the aggregate
    checks = {}

    # broadcast reference (all confs default — the 100k-row dim
    # auto-broadcasts under the stock 10 MB threshold): skew is a
    # non-event when the dim fits broadcast reach; measured for honesty,
    # not as a competitor — at 100 TB this is exactly the case that
    # stops working, which is why the other three rows exist
    df = agg(fact.join(dim, "k"))
    checks["broadcast"] = df.orderBy("grp").collect()
    results["broadcast"] = best_of(df)

    with_confs({**base_off, "spark.sql.adaptive.skewJoin.enabled": "false"})
    df = agg(fact.join(dim, "k"))
    checks["naive"] = df.orderBy("grp").collect()
    results["naive"] = best_of(df)

    with_confs({**base_off, "spark.sql.adaptive.skewJoin.enabled": "true"})
    df = agg(fact.join(dim, "k"))
    results["aqe_default"] = best_of(df)

    # AQE's skew split only fires when the hot partition exceeds BOTH
    # skewedPartitionFactor x median AND skewedPartitionThresholdInBytes
    # (256 MB default) — sized for production shuffles, NOT for a local
    # fixture whose hot partition is ~100 MB. Measured honestly above
    # (aqe_default ~= naive: the mitigation silently never triggered),
    # then re-measured with the thresholds scaled to the fixture the way
    # a 100 TB job would leave them at defaults:
    with_confs(
        {
            **base_off,
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
                16 << 20
            ),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(16 << 20),
        }
    )
    df = agg(fact.join(dim, "k"))
    results["aqe_tuned"] = best_of(df)
    with_confs(
        {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
                256 << 20
            ),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
        }
    )

    with_confs({**base_off, "spark.sql.adaptive.skewJoin.enabled": "false"})
    df = agg(salted_join(fact, dim, "k", salt_buckets=SALT_BUCKETS))
    checks["salted"] = df.orderBy("grp").collect()
    results["salted"] = best_of(df)

    assert checks["naive"] == checks["salted"] == checks["broadcast"], (
        "strategies disagree on the aggregate"
    )
    print(
        json.dumps(
            {
                "probe": "skew_join",
                "fact_rows": fact_rows,
                "dim_rows": N_KEYS,
                "hot_share": HOT_SHARE,
                "salt_buckets": SALT_BUCKETS,
                "timings_s": results,
            }
        )
    )


if __name__ == "__main__":
    main()
