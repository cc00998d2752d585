"""Build a 10x ("sf1-like") scale-probe dataset from /root/testdata/sf0.1.

VERDICT r10 #4: the 100 TB claims extrapolate from sf0.01->sf0.1 scaling
curves; this script manufactures ONE more decade so the curves rest on a
measured 10x point instead of pure extrapolation. It is a PERFORMANCE
fixture only — never an oracle input (the driver's correctness gate stays
on the driver-generated parquet, untouched).

Construction (10 copies of sf0.1, each made disjoint so the WORKLOAD SHAPE
is preserved — naive duplication would make every document an exact
cross-copy near-duplicate and inflate LSH pair counts quadratically,
measuring a pathology rather than scale):

- documents: doc_id offset per copy; every whitespace token suffixed with
  "~<i>" for copies i>0 — a bijection on each copy's shingle space, so
  WITHIN-copy jaccard relationships (the dedup workload) are preserved
  exactly while cross-copy shingle sets are disjoint (pair count scales
  ~10x, as a real 10x corpus would).
- embeddings: vec_id offset; the vector is rotated left by i positions —
  norm-preserving, keeps within-copy geometry identical, makes cross-copy
  cosines unstructured (a real 10x corpus adds new vectors, not clones).
- events: event_id/user_id offset; ts shifted +i*400 days so the number of
  (event_type, day) groups scales with the data — the partials-per-group
  shape real growth produces (quantile-sketch probes group by day).
- lineitem/orders/supplier: join keys (orderkey, suppkey, custkey) offset
  per copy; value columns untouched. nation/region/part/customer copied
  as-is where a probe needs them.

Usage: python3 scripts/make_scale_probe.py [out_dir]   (default
/tmp/spark_graft_sf1). Idempotent: overwrites the output dir.

Second decade (VERDICT r11 #3): point SPARK_GRAFT_PROBE_SRC at a previous
probe dir to fan THAT out 10x again (the suffix/rotation/offset transforms
compose — re-suffixing "tok~3" to "tok~3~7" is still a per-copy shingle
bijection), and set SPARK_GRAFT_PROBE_TABLES to a comma list to build only
the tables the targeted probes read (e.g. "documents,events,lineitem,
orders,supplier" for the a10e/dd11/q21 steep-curve set).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_PROBE_SRC", "/root/testdata/sf0.1")
COPIES = 10
_tables_env = os.environ.get("SPARK_GRAFT_PROBE_TABLES", "")
TABLES = set(t.strip() for t in _tables_env.split(",") if t.strip()) or None


def _wanted(name: str) -> bool:
    return TABLES is None or name in TABLES


def _fan(df):
    """Cross the frame with copy ids 0..COPIES-1 (a broadcast of 10 ints —
    the 10x fan-out happens executor-side, never on the driver)."""
    copies = df.sparkSession.range(COPIES).select(
        F.col("id").cast("int").alias("__copy")
    )
    return df.crossJoin(F.broadcast(copies))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from tranquility_spark.sources.files import load_table

    def t(name):
        return load_table(spark, SRC, name)

    # --- documents ------------------------------------------------------
    # regexp_replace's replacement must be a literal, so the per-copy token
    # suffix is a 10-branch union of literal-replacement plans (tiny plan,
    # executor-side work unchanged)
    if _wanted("documents"):
        docs = t("documents")
        step_doc = docs.agg(F.max("doc_id")).first()[0] + 1
        per_copy = None
        for i in range(COPIES):
            part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * step_doc))
            if i:
                part = part.withColumn(
                    "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"$1~{i}")
                ).withColumn("n_chars", F.length("text"))
            per_copy = part if per_copy is None else per_copy.unionByName(part)
        per_copy.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    # --- embeddings -----------------------------------------------------
    if _wanted("embeddings"):
        emb = t("embeddings")
        step_vec = emb.agg(F.max("vec_id")).first()[0] + 1
        dim = len(emb.select("embedding").first()[0])
        per_copy = None
        for i in range(COPIES):
            part = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * step_vec))
            if i:
                part = part.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", i + 1, dim - i),
                        F.slice("embedding", 1, i),
                    ),
                )
            per_copy = part if per_copy is None else per_copy.unionByName(part)
        per_copy.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # --- events ---------------------------------------------------------
    if _wanted("events"):
        ev = t("events")
        step_ev = ev.agg(F.max("event_id")).first()[0] + 1
        step_usr = ev.agg(F.max("user_id")).first()[0] + 1
        scaled_ev = (
            _fan(ev)
            .withColumn("event_id", F.col("event_id") + F.col("__copy") * step_ev)
            .withColumn("user_id", F.col("user_id") + F.col("__copy") * step_usr)
            .withColumn(
                "ts", F.timestamp_add("DAY", (F.col("__copy") * 400), F.col("ts"))
            )
            .drop("__copy")
        )
        scaled_ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    # --- relational (q21 probe: lineitem / orders / supplier) ------------
    if any(_wanted(n) for n in ("lineitem", "orders", "supplier")):
        li, orders, supp = t("lineitem"), t("orders"), t("supplier")
        step_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
        step_supp = supp.agg(F.max("s_suppkey")).first()[0] + 1
        step_cust = orders.agg(F.max("o_custkey")).first()[0] + 1
        if _wanted("lineitem"):
            (
                _fan(li)
                .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__copy") * step_ord)
                .withColumn("l_suppkey", F.col("l_suppkey") + F.col("__copy") * step_supp)
                .drop("__copy")
                .write.mode("overwrite")
                .parquet(f"{out}/lineitem.parquet")
            )
        if _wanted("orders"):
            (
                _fan(orders)
                .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__copy") * step_ord)
                .withColumn("o_custkey", F.col("o_custkey") + F.col("__copy") * step_cust)
                .drop("__copy")
                .write.mode("overwrite")
                .parquet(f"{out}/orders.parquet")
            )
        if _wanted("supplier"):
            (
                _fan(supp)
                .withColumn("s_suppkey", F.col("s_suppkey") + F.col("__copy") * step_supp)
                .withColumn(
                    "s_name",
                    F.concat(F.col("s_name"), F.lit("#"), F.col("__copy").cast("string")),
                )
                .drop("__copy")
                .write.mode("overwrite")
                .parquet(f"{out}/supplier.parquet")
            )

    # dims some probes read incidentally — copied unscaled
    for name in ("nation", "region", "customer", "part"):
        t(name).write.mode("overwrite").parquet(f"{out}/{name}.parquet")

    for name in (
        "documents",
        "embeddings",
        "events",
        "lineitem",
        "orders",
        "supplier",
    ):
        if not _wanted(name):
            continue
        n = spark.read.parquet(f"{out}/{name}.parquet").count()
        print(f"{name}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
