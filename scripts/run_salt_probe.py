"""salt_buckets decade probe (r15b): the one knob of the r14 skew-join
study left unmeasured. run_skew_probe.py showed salted_join at ONE
setting (salt_buckets=16) matching tuned-AQE; this probe sweeps the knob
across three decades (1..1024) on the SAME fixture to measure the shape
a 100 TB operator needs to know to SIZE it:

- too few buckets: the hot key's rows still concentrate — the hot
  reducer holds hot_rows/salt_buckets rows and the stage is that task.
- enough buckets: the hot slice reaches the tail-partition median and
  the stage flattens — more salt buys nothing.
- too many buckets: the dim replication (dim_rows x salt_buckets) and
  the wider join fan-in start charging rent.

Expected shape: wall ~ max(hot_rows/salt, tail_median) + c*salt — a
knee at salt* ~= hot_rows / median_partition_rows, flat after, with a
slow linear climb once replication dominates. salt_buckets=1 must
reproduce the naive SMJ row (it IS the naive join plus a constant salt
column) — that end anchors the sweep to the r14 study.

Same methodology as run_skew_probe.py: 50M-row fact, hot key owns 30%,
100k-row dim, broadcast disabled, AQE skew-join OFF (the sweep isolates
the explicit rewrite), min-of-3 noop-sink timing, aggregate asserted
identical to the unsalted join at every point.

Results -> SCALE.md (measurement script, not bench).

Usage: python3 scripts/run_salt_probe.py [fact_rows]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARE = 0.30
N_KEYS = 100_000
# 1 anchors to naive (same plan + salt overhead); 16 is the predicted
# knee (hot_rows/16 ~= the tail-partition median at 32 shuffle
# partitions); 256/1024 push the dim replication past the fact size so
# the rent side of the U is MEASURED, not hypothesized
SALTS = [1, 2, 4, 8, 16, 32, 64, 256, 1024]


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
    fact = spark.range(fact_rows).select(
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(
            (F.xxhash64("id") % (N_KEYS - 1) + (N_KEYS - 1)) % (N_KEYS - 1) + 1
        )
        .cast("long")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").cast("long").alias("k"),
        F.col("id").alias("dim_id"),
        (F.col("id") % 7).cast("long").alias("grp"),
    )
    # the r14 fixture paths on purpose at the default size (same bytes,
    # comparable numbers); any OTHER fact_rows gets its own directory —
    # a bare _SUCCESS check would silently time a stale 50M fixture
    # while reporting the new row count (r15b self-review)
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

    # the sweep isolates the explicit rewrite: broadcast and AQE's own
    # mitigation are both off (run_skew_probe.py measured those rows)
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }.items():
        spark.conf.set(k, v)

    # warmup pass BEFORE the naive timing: the first probe run timed the
    # naive row straight after the 50M-row fixture write and recorded
    # 23.8 s vs 11.0 s warm — post-write page-cache/GC pressure, not plan
    # cost (the salt=1 row, measured later in the same session, beat it)
    agg(fact.join(dim, "k")).write.format("noop").mode("overwrite").save()
    want = agg(fact.join(dim, "k")).orderBy("grp").collect()
    naive = best_of(agg(fact.join(dim, "k")))

    results = {}
    for s in SALTS:
        df = agg(salted_join(fact, dim, "k", salt_buckets=s))
        got = df.orderBy("grp").collect()
        assert got == want, f"salt_buckets={s} changed the aggregate"
        results[s] = best_of(df)

    print(
        json.dumps(
            {
                "probe": "salt_buckets_decade",
                "fact_rows": fact_rows,
                "dim_rows": N_KEYS,
                "hot_share": HOT_SHARE,
                "naive_smj_s": naive,
                "timings_s": results,
            }
        )
    )


if __name__ == "__main__":
    main()
