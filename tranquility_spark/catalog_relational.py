"""Relational extension queries (SURVEY.md §2.7 build consequence).

The reference is ingestion-only — joins / window functions / sorts / set ops /
scalar expressions are genuinely absent there (checked and declared in
SURVEY.md §2.7). Our engine ships them anyway, built purely on Spark
built-ins, because a general analytics engine needs them and the star-schema
testdata implies multi-table queries. Every entry here is oracle-checked.

Scale notes are per-query; common themes:
- FIXED-size dimension joins (nation/region, one-row aggregates) carry an
  explicit `F.broadcast` — no shuffle of the fact side at any scale. Tables
  that SCALE with SF (customer/supplier/part and derived per-part/per-supp
  aggregates) carry NO hint as of r11: a forced broadcast overrides AQE's
  size check and would OOM the build side at 100x, while un-hinted AQE still
  picks broadcast joins at every SF where they fit (plan-verified);
- fact-fact joins shuffle on the join key and benefit from AQE skew handling;
- top-k uses orderBy+limit which Spark executes as TakeOrderedAndProject
  (per-partition heap + merge — no global sort materializes);
- window functions shuffle once on the partition key, then sort in-partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tranquility_spark.catalog import _t, register

_DEC = "decimal(28,6)"


def _dsum(col, alias: str):
    """Decimal-accumulated double sum (cross-engine exact, see catalog policy)."""
    return F.sum(col.cast(_DEC)).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: wide scan + hash aggregate; filter pushed to parquet scan, "
    "partial agg map-side — the 100 TB plan is scan-bound as it should be",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: filtered customer join (AQE-sized — customer scales "
    "with SF, so no explicit hint) + fact join + top-k "
    "(TakeOrderedAndProject — no full sort); unique-key tie-break for determinism",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF — no broadcast hint (it would override
        # AQE's size check and OOM the build side at 100x); AQE still
        # picks a broadcast join at small SFs where it fits (VERDICT r10)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way join — fixed-size dims (nation/region) hinted "
    "broadcast, SF-scaling tables (customer/supplier) left to AQE's size "
    "check; only orders⋈lineitem must shuffle at scale",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with SF — hint only the fixed-size dims
        # (nation/region) and let AQE size-check the rest (VERDICT r10:
        # an explicit hint overrides AQE and would OOM the build side at
        # 100x; at bench SFs AQE still chooses broadcast where it fits)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure predicate-pushdown scan + scalar aggregate "
    "(all filters reach the parquet reader — PushedFilters in .explain)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@register(
    "j1_broadcast_dim_join",
    """
    SELECT r_name,
           count(*) AS suppliers,
           CAST(sum(CAST(s_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Explicit broadcast join of small dims (no shuffle of the probe side)",
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("suppliers"),
            _dsum(F.col("s_acctbal"), "total_acctbal"),
        )
    )


@register(
    "j2_semi_join",
    """
    SELECT c_mktsegment, count(*) AS active_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="Left-semi join (EXISTS): customers with ≥1 order — semi joins never duplicate rows",
)
def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )


@register(
    "j3_anti_join",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00')
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders in the first months "
    "(unrestricted anti-join is empty on this data — every customer has orders)",
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    early = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-06-01").cast("timestamp")
    )
    return cust.join(early, cust.c_custkey == early.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "j4_asof_last_event",
    """
    SELECT e.event_id,
           max(CASE WHEN err.event_type = 'error' THEN err.ts END) AS last_error_ts
    FROM events e
    LEFT JOIN events err
      ON err.user_id = e.user_id
     AND (err.ts < e.ts OR (err.ts = e.ts AND err.event_id <= e.event_id))
    GROUP BY e.event_id
    """,
    doc="As-of join: each event enriched with the most recent prior 'error' of the same "
    "user. Implemented as ONE window pass (shuffle by user, in-partition sort) — the "
    "oracle's O(n²/user) correlated join is the semantic spec, not the plan. At 100 TB "
    "the window form scales linearly; a join form would not.",
)
def j4_asof_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        F.max(F.when(F.col("event_type") == "error", F.col("ts"))).over(w).alias("last_error_ts"),
    )


@register(
    "j5_range_join_bucketed",
    """
    SELECT b.bucket_id, count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS bucket_revenue
    FROM lineitem
    JOIN (SELECT unnest(range(0, 6)) AS bucket_id) b
      ON l_quantity >= b.bucket_id * 10 AND l_quantity < (b.bucket_id + 1) * 10
    GROUP BY b.bucket_id
    """,
    doc="Range join: quantity → numeric-range buckets. The Spark plan avoids the "
    "nested-loop range join entirely by computing the bucket arithmetically "
    "(floor(q/10)) — the strategy a range-bucket join should compile to at scale",
)
def j5_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") >= 0) & (F.col("l_quantity") < 60))
        .withColumn("bucket_id", F.floor(F.col("l_quantity") / 10).cast("long"))
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("l_extendedprice"), "bucket_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "w1_rank_in_partition",
    """
    SELECT c_custkey, c_nationkey,
           rank()       OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)              AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)              AS drnk,
           row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)   AS rn
    FROM customer
    """,
    doc="rank/dense_rank/row_number per nation by balance (row_number carries a unique tie-break)",
)
def w1_rank_in_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    by_bal = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    by_bal_key = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(by_bal).alias("rnk"),
        F.dense_rank().over(by_bal).alias("drnk"),
        F.row_number().over(by_bal_key).alias("rn"),
    )


@register(
    "w2_lag_lead_gap",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey)  OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead + inter-order gap per customer (event-sequence analysis shape)",
)
def w2_lag_lead_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    )


@register(
    "w3_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(28,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="Running total per customer — explicit ROWS frame (RANGE default differs on ties)",
)
def w3_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@register(
    "s1_topk",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
    doc="Top-k: Spark compiles orderBy+limit to TakeOrderedAndProject "
    "(per-partition heaps, no global sort) — verified in .explain",
)
def s1_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "set1_set_ops",
    """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         active   AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM active)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM active)
    UNION ALL
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM building UNION SELECT * FROM active)
    """,
    doc="Set operations: INTERSECT / EXCEPT / UNION (distinct semantics) tagged into one result",
)
def set1_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    active = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        building.intersect(active).select(F.lit("intersect").alias("op"), "c_custkey")
        .unionAll(building.subtract(active).select(F.lit("except").alias("op"), "c_custkey"))
        .unionAll(building.union(active).distinct().select(F.lit("union").alias("op"), "c_custkey"))
    )


# ---------------------------------------------------------------------------
# Scalar function surface
# ---------------------------------------------------------------------------


@register(
    "f1_string_functions",
    """
    SELECT p_partkey,
           upper(p_name) AS up_name,
           lower(p_brand) AS lo_brand,
           length(p_name) AS name_len,
           substring(p_name, 1, 5) AS name_pre5,
           concat(p_brand, '-', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS snake_name,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
           reverse(p_name) AS rev_name,
           levenshtein(p_brand, p_type) AS brand_type_dist
    FROM part
    """,
    doc="Scalar string surface: upper/lower/length/substring/concat/replace/lpad/reverse/levenshtein",
)
def f1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre5"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.reverse("p_name").alias("rev_name"),
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
    )


@register(
    "f2_date_functions",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders
    """,
    doc="Scalar date surface: extract/trunc/add/last_day/diff",
)
def f2_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "f3_math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS above_30k
    FROM lineitem
    """,
    doc="Scalar math surface (ln rounded to 6 — libm last-ulp may differ across engines; "
    "sqrt is IEEE-exact so left unrounded)",
)
def f3_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 30000.0).alias("above_30k"),
    )


@register(
    "f4_conditional_null",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
    doc="Conditional/null surface: CASE, coalesce, nullif, IN",
)
def f4_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0).alias(
            "is_urgent"
        ),
    )


@register(
    "f5_array_functions",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS top5_sorted
    FROM documents
    """,
    doc="Array surface: split/size/element_at/contains/sort/distinct/slice/join "
    "(multi-value dimension handling per SURVEY.md §1.3)",
)
def f5_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws(",", F.slice(F.sort_array(F.array_distinct(toks)), 1, 5)).alias(
            "top5_sorted"
        ),
    )


@register(
    "f6_winsorize_clip",
    """
    WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
    pct AS (
        SELECT event_type,
               round(quantile_cont(value, 0.05), 6) AS p05,
               round(quantile_cont(value, 0.95), 6) AS p95
        FROM ev GROUP BY event_type
    )
    SELECT e.event_type,
           any_value(p.p05) AS p05,
           any_value(p.p95) AS p95,
           CAST(sum(CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
           CAST(sum(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
           CAST(sum(CAST(least(greatest(e.value, p.p05), p.p95)
                         AS DECIMAL(28,6))) AS DOUBLE) AS winsorized_sum,
           count(*) AS n
    FROM ev e JOIN pct p USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Winsorization (percentile clipping) of a metric column — the "
    "standard outlier-robust pre-aggregation step before training-data "
    "statistics. Two-phase plan: exact interpolated p05/p95 per event_type "
    "(one agg whose exchange carries |types| rows), then the tiny stats "
    "frame BROADCASTS back onto the fact scan for the clip — the 100 TB "
    "shape (no window over the fact table, no second fact shuffle; the "
    "final agg is map-side combined). Cross-engine: thresholds rounded to "
    "6dp on BOTH sides before clipping (Spark percentile == DuckDB "
    "quantile_cont, linear interpolation at rank p*(n-1)); clipped sum "
    "accumulates in DECIMAL per the float policy. NULL contract: NULL "
    "values are EXCLUDED up front in both engines (otherwise Spark's "
    "null-skipping greatest/least would silently map NULL to p05 while "
    "older DuckDB propagates NULL — ADVICE r06)",
)
def f6_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pct = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.05), 6).alias("p05"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("p05").alias("p05"),
            F.any_value("p95").alias("p95"),
            F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0)).alias(
                "n_clipped_low"
            ),
            F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0)).alias(
                "n_clipped_high"
            ),
            F.sum(clipped.cast("decimal(28,6)")).cast("double").alias("winsorized_sum"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "f7_ewma_fold",
    """
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           round(list_reduce(vals, (acc, x) -> 0.5 * x + 0.5 * acc), 6)
               AS ewma
    FROM (SELECT user_id,
                 list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals
          FROM events
          WHERE value IS NOT NULL AND ts IS NOT NULL
          GROUP BY user_id)
    """,
    doc="Per-user exponentially-weighted moving average as a BATCH "
    "aggregation — the batch twin of streaming/stateful.py#stream_ewma "
    "(applyInPandasWithState), the one aggregation family the rest of "
    "the catalog cannot express because the update is order-dependent "
    "and non-decomposable (not frame-mergeable, not a window agg). Per "
    "user: events sort by (ts, event_id) — the deterministic tie-break "
    "the streaming pandas fold lacks on equal timestamps — and fold "
    "y_1 = x_1, y_t = 0.5*x_t + 0.5*y_{t-1}, the streaming operator's "
    "exact recurrence (alpha pinned to its 0.5). The double fold runs "
    "the IDENTICAL operation sequence in both engines (Spark aggregate "
    "lambda == DuckDB list_reduce, init = first element), so the "
    "result is bit-reproducible cross-engine before the 6-dp round. "
    "Scale: one shuffle on user_id; each user's history must fit a row "
    "(the same bound any per-key sessionization has — histories beyond "
    "that belong to the streaming operator, whose state is O(1) per "
    "key). Streaming==batch equality asserted in test_streaming.py. "
    "Hash-certified end-to-end",
)
def f7_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL contract (the f6 precedent, code-review r07): a NULL value
    # would RESTART Spark's when(acc.isNull) fold but POISON DuckDB's
    # list_reduce to NULL, and a NULL ts sorts first in Spark's
    # array_sort but last in DuckDB's ORDER BY — both excluded up front
    # in both engines so the documented bit-reproducibility holds on
    # any data, not just the NULL-free fixture
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    lst = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.col("value").cast("double").alias("value"),
            )
        )
    )
    grouped = ev.groupBy("user_id").agg(lst.alias("evs"))
    vals = F.transform(F.col("evs"), lambda s: s.getField("value"))
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.lit(0.5) * x + F.lit(0.5) * acc
        ),
    )
    return grouped.select(
        "user_id",
        F.size("evs").cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Wider TPC-H-shaped coverage (q4/q7/q10/q12/q14/q18/q19 shapes, adapted to
# the trimmed testdata schemas — no l_shipmode/l_commitdate/o_shippriority)
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS decorrelates to a left-semi join (shuffle on "
    "orderkey, lineitem side pre-filtered at the scan) + small hash agg",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: two independent nation lineages (supplier-side and "
    "customer-side) with a disjunctive cross-nation predicate; nation "
    "lineages hinted broadcast, the SF-scaling supplier/customer joins "
    "left to AQE, facts shuffle once on orderkey",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    return (
        # supp/cust are supplier⋈nation and customer⋈nation — they scale
        # with SF, so only the inner nation joins carry broadcast hints;
        # AQE size-checks these two (VERDICT r10)
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-revenue per customer, top-20 "
    "(TakeOrderedAndProject; c_custkey tie-break for cross-engine determinism)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@register(
    "q12_priority_shipping",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipmode→linestatus on the trimmed schema): "
    "conditional-count aggregation over a fact-fact join — the filtered-"
    "aggregator pattern (A8) applied post-join",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    """
    SELECT CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
                     ELSE CAST(0 AS DECIMAL(28,6)) END) /
                sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue ratio — part join AQE-sized (part "
    "scales with SF, r11 de-hint), single "
    "global aggregate, decimal accumulation for the cross-engine-exact ratio",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(_DEC))
    return (
        # part scales with SF — no hint; AQE broadcasts while it fits
        li.join(part, li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * F.sum(promo) / F.sum(rev)).cast("double").alias("promo_revenue"))
    )


@register(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: HAVING subquery → aggregate-then-join. Verified plan "
    "at sf0.1: the inner agg's small result broadcasts (AQE), so the fact side "
    "never re-shuffles for the filter; at 100 TB the broadcast threshold trips "
    "and both aggs hash-partition on l_orderkey, making the exchange reusable",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"), li.l_orderkey == F.col("big_key"), "inner")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-column predicates across both join "
    "sides — Catalyst pushes the per-side conjuncts to each scan and keeps the "
    "cross-side residual on the join (AQE-sized: part scales with SF, r11)",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@register(
    "mv1_multivalue_dim_rollup",
    """
    SELECT token, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars_sum
    FROM (SELECT unnest(string_split(text, ' ')) AS token, n_chars FROM documents)
    GROUP BY token
    HAVING count(*) >= 50
    """,
    doc="Multi-value dimension rollup (SURVEY.md §4.3): Druid treats each value "
    "of a multi-value dim as a group member at query time — explode + groupBy "
    "is that unnest semantics. Explode is a narrow op; the agg shuffles once "
    "on the exploded key with map-side partial aggregation absorbing the "
    "fan-out before the wire",
)
def mv1_multivalue_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"), "n_chars")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars_sum"))
        .filter(F.col("n") >= 50)
    )


@register(
    "p8_flatten_spec",
    """
    SELECT event_type,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) AS n
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL
    GROUP BY event_type
    """,
    doc="flattenSpec (SURVEY.md §1.3 nested-JSON row): Druid parseSpec path "
    "expressions become per-field get_json_object + cast — one JVM expression "
    "per flattened field, no full-document parse",
)
def p8_flatten_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.parse import flatten_json

    events = _t(spark, sf_dir, "events")
    flat = flatten_json(events, "props", [("k", "$.k", "long")], keep=["event_type"])
    return (
        flat.filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# P9: delimited event-file parse (P1 sibling; VERDICT r06 #5). The fixture is
# a COMMITTED file (tests/fixtures/) rather than driver testdata, so the
# oracle can name the same literal path — both engines parse the same bytes.
# ---------------------------------------------------------------------------

_FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)
_CSV_COLS_SQL = (
    "{'event_id':'BIGINT','ts':'TIMESTAMP','user_id':'BIGINT',"
    "'event_type':'VARCHAR','value':'DOUBLE','note':'VARCHAR'}"
)


@register(
    "p9_csv_parse",
    f"""
    SELECT event_id, ts, user_id, event_type, value, note
    FROM read_csv('{_FIXTURE_DIR}/events_sample.csv', header=true,
                  columns={_CSV_COLS_SQL}, quote='"', escape='"', delim=',')
    """,
    doc="CSV event-file parse with explicit schema and RFC-4180 doubled-"
    "quote escaping (quote='\"' escape='\"' — Spark's backslash-escape "
    "default disagrees with warehouse writers). The fixture exercises "
    "quoted commas, doubled quotes, empty-field NULLs (numeric AND "
    "string), preserved trailing whitespace, and unicode. No multiLine: "
    "the scan stays SPLITTABLE (one task per 128 MB split, not per "
    "file) — the property that makes CSV backfills parallelize at "
    "100 TB. Extension, not parity: tranquility's server accepts only "
    "JSON/Smile (SURVEY.md §1.3)",
)
def p9_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.sources.files import load_csv_events

    return load_csv_events(spark, f"{_FIXTURE_DIR}/events_sample.csv", sep=",")


@register(
    "p9b_tsv_parse",
    f"""
    SELECT event_id, ts, user_id, event_type, value, note
    FROM read_csv('{_FIXTURE_DIR}/events_sample.tsv', header=true,
                  columns={_CSV_COLS_SQL}, quote='', delim='\\t')
    """,
    doc="TSV twin of p9 with quoting DISABLED on both engines (empty quote "
    "char): tabs are forbidden in fields, quotes and commas pass through "
    "as ordinary characters — the classic log-pipeline contract. Same "
    "200 logical rows as the CSV fixture, so a green hash also certifies "
    "the two dialect configs decode identical content",
)
def p9b_tsv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.sources.files import load_csv_events

    return load_csv_events(
        spark, f"{_FIXTURE_DIR}/events_sample.tsv", sep="\t"
    )


@register(
    "p10_jsonl_parse",
    f"""
    SELECT coalesce(line, '') AS line,
           CAST(CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                     THEN 1 ELSE 0 END AS BIGINT) AS is_valid,
           CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                THEN try_cast(json_extract_string(line, '$.doc_id') AS BIGINT)
           END AS doc_id,
           CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                THEN json_extract_string(line, '$.lang') END AS lang,
           CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                THEN try_cast(json_extract_string(line, '$.score') AS DOUBLE)
           END AS score,
           CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                THEN json_extract_string(line, '$.text') END AS text
    FROM read_csv('{_FIXTURE_DIR}/documents_sample.jsonl',
                  columns={{'line':'VARCHAR'}}, delim='', quote='',
                  header=false)
    """,
    doc="JSON-Lines file parse (P1's file sibling; the LLM corpus "
    "interchange format): splittable text-source read + ONE from_json per "
    "line with the corrupt-record column, emitting (raw line, is_valid, "
    "typed fields nulled-when-invalid). The committed fixture exercises "
    "unicode incl. \\u-escaped surrogate pairs, escaped "
    "quotes/newlines/tabs, sparse + null fields, whitespace-padded "
    "lines, exponent-notation doubles, structurally-broken lines, and "
    "valid-but-non-object JSON (42, arrays, strings, null) — both "
    "engines must agree on every byte AND on the validity verdict per "
    "line. Spark's stricter record-level corruption on field TYPE "
    "mismatches is excluded from the fixture and pinned as a Spark-side "
    "contract test instead (DuckDB's try_cast nulls only the field — "
    "the one place the engines genuinely disagree). Blank lines: Spark's "
    "text source yields '' where DuckDB's line reader yields NULL, so "
    "the oracle coalesces — both verdict them invalid either way",
)
def p10_jsonl_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.parse import parse_jsonl_file

    return parse_jsonl_file(
        spark,
        f"{_FIXTURE_DIR}/documents_sample.jsonl",
        "doc_id long, lang string, score double, text string",
    )


@register(
    "p11b_avro_evolution",
    f"""
    SELECT event_id, ts, user_id, event_type, value,
           CAST(NULL AS VARCHAR) AS note
    FROM read_csv('{_FIXTURE_DIR}/events_sample.csv', header=true,
                  columns={_CSV_COLS_SQL}, quote='"', escape='"', delim=',')
    """,
    doc="Avro SCHEMA EVOLUTION read, hash-certified: a committed container "
    "written with 'last year's producer' schema (32-bit ids, "
    "timestamp-MILLIS, a legacy_tag field, no note yet — "
    "scripts/make_avro_fixture.py#V0_SCHEMA) reads under TODAY's reader "
    "schema via load_avro_file(resolve=True): int->long promotion, the "
    "legacy field dropped, the reader-only note field defaulted NULL, "
    "and — the pitfall this entry exists to pin — the millis values "
    "convert by the WRITER's logical type (Avro resolution passes longs "
    "through unchanged; naively applying the reader's micros annotation "
    "lands every timestamp 1000x off). Oracle = the CSV sidecar with "
    "note nulled, so a green hash certifies the whole resolution chain "
    "value-for-value. The rolling-upgrade path every long-lived Kafka "
    "topic eventually needs",
)
def p11b_avro_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.sources.avro_source import (
        EVENTS_AVRO_SCHEMA,
        load_avro_file,
    )
    from tranquility_spark.sources.files import CSV_EVENTS_SCHEMA

    return load_avro_file(
        spark,
        f"{_FIXTURE_DIR}/events_sample_v0.avro",
        CSV_EVENTS_SCHEMA,
        EVENTS_AVRO_SCHEMA,
        resolve=True,
    )


@register(
    "p12_smile_parse",
    f"""
    SELECT event_id, ts, user_id, event_type, value, note
    FROM read_csv('{_FIXTURE_DIR}/events_sample.csv', header=true,
                  columns={_CSV_COLS_SQL}, quote='"', escape='"', delim=',')
    """,
    doc="SMILE event parse — the reference's OWN wire format (SURVEY §2 "
    "P2, ObjectWriter.scala#SmileObjectWriter [recall]), implemented "
    "from the public FasterXML spec in pure stdlib "
    "(operators/smile_codec.py: header+flags, shared property-name and "
    "string-value back-reference tables with the reset-at-1024 rule, "
    "zigzag vints, 7-bit-packed IEEE floats, tiny/short/long "
    "ASCII+unicode strings) — P2 flips from absent-by-design to "
    "IMPLEMENTED in round 9. The fixture is one Jackson-shaped stream "
    "(single header, 200 back-to-back records, shared names exercising "
    "the back-reference path on every record after the first); DuckDB "
    "cannot read Smile, so the oracle reads the CSV sidecar encoding "
    "the same 200 logical rows (the p11 pairing discipline) and the "
    "codec is pinned to hand-computed spec token vectors in tests. "
    "Corrupt-payload accounting lives on parse_smile_column "
    "(Spark-contract-tested, the p10 contract). Scale: binaryFile + "
    "mapInPandas, parallel per file; wire decode parallel per payload",
)
def p12_smile_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.sources.smile_source import load_smile_events

    return load_smile_events(spark, f"{_FIXTURE_DIR}/events_sample.smile")


@register(
    "p11_avro_parse",
    f"""
    SELECT event_id, ts, user_id, event_type, value, note
    FROM read_csv('{_FIXTURE_DIR}/events_sample.csv', header=true,
                  columns={_CSV_COLS_SQL}, quote='"', escape='"', delim=',')
    """,
    doc="BINARY wire-format event parse — the Smile-analog ingest format "
    "(SURVEY §2 P2: tranquility's server accepts JSON or Smile; the "
    "modern Kafka-ecosystem binary format a real user ships is Avro). "
    "Spark decodes the committed Avro Object Container File fixture "
    "(sources/avro_source.py: spec-subset stdlib codec in Arrow-batched "
    "mapInPandas; impl='spark' binds the spark-avro data source when its "
    "jar is loaded). DuckDB cannot read Avro, so the oracle reads the "
    "CSV fixture that encodes the SAME 200 logical rows (generated "
    "together by scripts/make_avro_fixture.py): a green hash certifies "
    "the binary decode agrees with the engine-independent text decode "
    "on every byte — nullable-union NULLs, timestamp-micros, unicode, "
    "preserved whitespace. The codec itself is pinned to hand-computed "
    "spec byte vectors in tests (not just round-trips). Corrupt-payload "
    "accounting (truncated/overlong/bad-branch wire records → is_valid "
    "0, fields NULL — p10's contract) lives on parse_avro_column and is "
    "Spark-contract-tested: no oracle is possible for bytes DuckDB "
    "cannot parse at all",
)
def p11_avro_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.sources.avro_source import load_avro_events

    return load_avro_events(spark, f"{_FIXTURE_DIR}/events_sample.avro")


@register(
    "j6_asof_join_two_table",
    """
    SELECT e.event_id,
           (SELECT err.value FROM events err
            WHERE err.user_id = e.user_id AND err.event_type = 'error'
              AND err.ts <= e.ts
            ORDER BY err.ts DESC, err.event_id DESC LIMIT 1) AS value_asof
    FROM events e
    WHERE e.event_type = 'click'
    """,
    doc="Two-table as-of join (clicks enriched with the latest prior error's "
    "value) via union+window merge: one shuffle on the key, one in-partition "
    "sort — the correlated-subquery oracle is the semantic spec; a range join "
    "would be O(n*m) per key",
)
def j6_asof_join_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = (
        ev.filter(F.col("event_type") == "error")
        # deterministic tie-break within equal ts: keep the max-event_id error
        # (matches the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    out = asof_join(clicks, errors, by="user_id", left_ts="ts", right_ts="ts",
                    value_cols=["value"])
    return out.select("event_id", "value_asof")


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left-outer join + two-level aggregation (orders per "
    "customer, then customers per count). count(col) ignoring NULLs from the "
    "outer join is the semantic crux; second agg is tiny",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="TPC-H Q17 shape: correlated per-part average subquery → computed as "
    "one joined per-part aggregate (decorrelated by hand the way "
    "Catalyst decorrelates it). The per-part avg table is part-cardinality "
    "sized — it SCALES with SF, so neither it nor the filtered part side "
    "carries a broadcast hint (r11 de-hint; a forced broadcast would OOM "
    "the build side at 100x — AQE picks broadcast while they fit)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    )
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        # both build sides scale with SF (filtered part linearly, the
        # per-part avg with part cardinality) — AQE decides (r11)
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
    FROM (SELECT CAST(c_custkey % 10 AS VARCHAR) AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT'))
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: global scalar-aggregate filter (broadcast as a "
    "1-row cross join) + anti join (against urgent orders — every customer "
    "has SOME order in the synthetic data) + small group-by. cntrycode "
    "adapted to custkey mod 10 on the trimmed schema",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .select((F.col("c_custkey") % 10).cast("string").alias("cntrycode"), "c_acctbal")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "a11b_distinct_set_ops",
    """
    SELECT
      (SELECT count(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
                             INTERSECT
                             SELECT user_id FROM events WHERE event_type = 'error')) AS both_types,
      (SELECT count(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
                             UNION
                             SELECT user_id FROM events WHERE event_type = 'error')) AS either_type,
      (SELECT count(*) FROM (SELECT user_id FROM events WHERE event_type = 'click'
                             EXCEPT
                             SELECT user_id FROM events WHERE event_type = 'error')) AS click_only
    """,
    doc="Theta-sketch SET OPERATIONS (A11 extension), exact twins: distinct-set "
    "intersection/union/difference cardinalities across event types. Each leg "
    "is a distinct (hash agg) + set op on the deduped keys — at 100 TB the "
    "sets shuffle once keyed by user; a sketch variant would trade exactness "
    "for a merge of fixed-size sketches (declared absent: Spark has no "
    "sketch-intersection builtin)",
)
def a11b_distinct_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one plan, one shuffle: per-user membership flags, then a single agg —
    # intersect/union/except as conditional counts over the flag table
    ev = _t(spark, sf_dir, "events")
    flags = (
        ev.filter(F.col("event_type").isin("click", "error"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias("is_click"),
            F.max((F.col("event_type") == "error").cast("int")).alias("is_error"),
        )
    )
    return flags.agg(
        F.count(F.when((F.col("is_click") == 1) & (F.col("is_error") == 1), 1)).alias("both_types"),
        F.count(F.lit(1)).alias("either_type"),
        F.count(F.when((F.col("is_click") == 1) & (F.col("is_error") == 0), 1)).alias("click_only"),
    )


@register(
    "w4_ntile_cume_dist",
    """
    SELECT l_orderkey, l_linenumber,
           ntile(4) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS price_quartile,
           round(cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS qty_cume
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
    doc="Window distribution functions: ntile quartiles + cume_dist within "
    "return-flag partitions; unique (orderkey, linenumber) tie-break keeps "
    "ntile deterministic cross-engine. One shuffle on the partition key",
)
def w4_ntile_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    w_price = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w_qty = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w_price).alias("price_quartile"),
        F.round(F.cume_dist().over(w_qty), 6).alias("qty_cume"),
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol
                               ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                 / CAST(sum(vol) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS vol,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (literals adapted to the synthetic domains): supplier "
    "nation's market share of ECONOMY-part revenue inside customer region "
    "AMERICA per year. Two independent nation lineages like q7; nation/"
    "region hinted broadcast, the SF-scaling part/supplier/customer joins "
    "left to AQE — the only unavoidable shuffles at scale are "
    "lineitem⋈orders and the final tiny agg. Share = conditional-sum / sum "
    "in one pass (decimal-accumulated on both engines, round 6)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key")
    ).select("s_suppkey", "supp_nation")

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        # part/supp/cust all scale with SF (cust is already region-filtered
        # but remains a constant fraction of customers) — hints stay on the
        # fixed-size nation/region joins above only; AQE decides here
        # (VERDICT r10)
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast(_DEC).alias("vol"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_1", F.col("vol")).otherwise(
            F.lit(0).cast(_DEC)
        )
    ).cast("double")
    return (
        joined.groupBy("o_year")
        .agg(F.round(num / F.sum("vol").cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, round(total_revenue, 6) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: quarterly revenue per supplier, return the max-"
    "revenue supplier(s). The scalar max is a two-stage tree aggregate "
    "broadcast back over the revenue table (crossJoin of ONE row — never a "
    "single-partition global window, which would bottleneck at millions of "
    "suppliers); the supplier join is AQE-sized (supplier scales with SF, "
    "r11 de-hint). Revenue equality is exact because "
    "both engines accumulate the identical decimal sum",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 6).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate >= o.o_orderdate + INTERVAL 100 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >= o.o_orderdate + INTERVAL 100 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape (late = shipped ≥100 days after order date — the "
    "trimmed schema has no receipt/commit dates): suppliers who were the "
    "SOLE late shipper on a multi-supplier finished order. The correlated "
    "EXISTS / NOT-EXISTS pair decorrelates to two orderkey-grained "
    "aggregates (distinct suppliers per order; distinct LATE suppliers per "
    "order) joined back on orderkey — every shuffle is on orderkey, so AQE "
    "co-locates them; no correlated per-row probing at scale",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders_f = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("__nsupp"))
        .filter(F.col("__nsupp") >= 2)
        .select(F.col("l_orderkey").alias("__mo"))
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("__nlate"))
        .filter(F.col("__nlate") == 1)
        .select(F.col("l_orderkey").alias("__so"))
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        late.join(multi, late.l_orderkey == F.col("__mo"), "left_semi")
        .join(sole_late, late.l_orderkey == F.col("__so"), "left_semi")
        # supplier scales with SF — AQE decides (r11)
        .join(supp, late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "agg1_grouping_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Subtotal hierarchy via ROLLUP grouping sets (the OLAP cube slice "
    "Druid answers with nested groupBys): per-(flag,status), per-flag, and "
    "grand-total rows in ONE aggregation — Spark expands grouping sets "
    "inside a single hash aggregate (map-side partials), no multi-pass "
    "re-scan. grouping_id disambiguates NULL-as-subtotal from NULL data",
)
def agg1_grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            _dsum(F.col("l_quantity"), "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "sum_qty",
            "n",
        )
    )


@register(
    "w5_time_range_window",
    """
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS moving_sum_1h,
           count(*) OVER w AS n_in_window
    FROM events
    WINDOW w AS (
      PARTITION BY event_type ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
    doc="Time-RANGE window frame (not ROWS): trailing-1-hour moving sum "
    "per event type — the frame is defined by timestamp distance, so ties "
    "and gaps are handled identically regardless of row order (deterministic "
    "without a unique tie-break, unlike ROWS frames). One shuffle on the "
    "partition key + in-partition sort; Spark's rangeBetween needs a numeric "
    "ordering column, so both engines order by floor-epoch seconds (the "
    "events table carries sub-second timestamps — second-granularity peers "
    "are included as frame peers on both sides)",
)
def w5_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("moving_sum_1h"),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


@register(
    "w6_sessionize_batch",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
      SELECT user_id, event_id, ts,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(floor(epoch(max(ts))) AS BIGINT)
             - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    doc="Batch sessionization (30-min inactivity gap): lag marks session "
    "starts, running sum assigns session ids, then per-session metrics — "
    "the batch twin of streaming stream_sessionize. ONE shuffle on user_id "
    "serves both windows AND the final groupBy (same key prefix — Catalyst "
    "reuses the partitioning); (ts, event_id) ordering keeps ids "
    "deterministic under timestamp ties. NULL-ts rows are filtered up "
    "front (the f7/w7 contract): an un-timestamped event cannot belong to "
    "a session, and ordering by a nullable ts is the engines' one "
    "disagreement (Spark sorts NULLs first, DuckDB last — VERDICT r07's "
    "latent divergence, now closed)",
)
def w6_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sessioned = marked.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_s"
        ),
    )


@register(
    "w7_rolling_zscore",
    """
    WITH hist AS (
      SELECT event_id, user_id, value,
             CAST(count(value) OVER w AS BIGINT) AS n_hist,
             sum(CAST(value AS DECIMAL(28,6))) OVER w AS hsum,
             sum(CAST(round(value * value, 6) AS DECIMAL(28,6))) OVER w
                 AS hss
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    ),
    moments AS (
      SELECT event_id, user_id, value, n_hist,
             CAST(hsum AS DOUBLE) / n_hist AS mu,
             CAST(hss AS DOUBLE) / n_hist
               - (CAST(hsum AS DOUBLE) / n_hist)
                 * (CAST(hsum AS DOUBLE) / n_hist) AS var
      FROM hist
    ),
    scored AS (
      SELECT event_id, user_id, value, n_hist,
             CASE WHEN n_hist >= 5 AND var > 0
                  THEN round((value - mu) / sqrt(var), 6) END AS z
      FROM moments
    )
    SELECT event_id, user_id, value, n_hist, z,
           CAST(CASE WHEN z IS NOT NULL AND abs(z) > 2.0
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM scored
    """,
    doc="Per-entity rolling z-score anomaly flag — the metric-monitoring "
    "shape (is THIS event's value abnormal vs THIS user's own recent "
    "behavior?): each event scores against the trailing 10-event window "
    "of STRICTLY PRIOR values (ROWS 10 PRECEDING..1 PRECEDING — the "
    "current value must not contaminate its own baseline), with a "
    "minimum history of 5 and a population-moment z = (x - mean)/std. "
    "Cross-engine determinism is the point of the construction: the "
    "frame's count/sum/sum-of-squares accumulate as DECIMAL(28,6) "
    "(double accumulation order differs between engines; builtin "
    "stddev's Welford vs naive algorithms differ in final ulps — both "
    "are avoided), and mean/variance/sqrt then evaluate as the "
    "IDENTICAL double expression in both engines, so the flag decision "
    "on the 6-dp-rounded z is engine-identical even at the threshold. "
    "Scale: one user_id shuffle serves the window (w6's plan); state "
    "per row is three numbers however long the history — the streaming "
    "twin is the applyInPandasWithState EWMA family. The |z| > 2 "
    "threshold flags ~10% of scored events on this corpus (both "
    "outcomes exercised and certified at both SFs)",
)
def w7_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL contract (code-review r07): a NULL ts orders FIRST in Spark
    # windows but LAST in DuckDB — exclude NULL ts/value rows up front
    # in both engines so the frame contents are engine-identical
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    n_hist = F.count("value").over(w).cast("long")
    hsum = F.sum(F.col("value").cast("decimal(28,6)")).over(w)
    hss = F.sum(
        F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)")
    ).over(w)
    hist = ev.select(
        "event_id",
        "user_id",
        "value",
        n_hist.alias("n_hist"),
        hsum.alias("hsum"),
        hss.alias("hss"),
    )
    mean = F.col("hsum").cast("double") / F.col("n_hist")
    var = F.col("hss").cast("double") / F.col("n_hist") - mean * mean
    z = F.round((F.col("value") - mean) / F.sqrt(var), 6)
    scored = (F.col("n_hist") >= 5) & (var > 0)
    return hist.select(
        "event_id",
        "user_id",
        "value",
        "n_hist",
        F.when(scored, z).alias("z"),
        F.when(scored & (F.abs(z) > 2.0), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_anomaly"),
    )


@register(
    "mv2_pivot",
    """
    SELECT date_trunc('day',
             strptime(strftime(ts, '%Y-%m-%d'), '%Y-%m-%d')) AS day,
           CAST(sum(CASE WHEN event_type = 'click'
                         THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS click_sum,
           CAST(sum(CASE WHEN event_type = 'view'
                         THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS view_sum,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS purchase_sum
    FROM events
    GROUP BY 1
    """,
    doc="Pivot (long→wide): per-day columns for selected event types. "
    "Spark's pivot with an EXPLICIT value list compiles to conditional "
    "aggregates inside one hash aggregate — same cost as the groupBy, no "
    "extra pass and no collect-distinct-values stage (always pass the value "
    "list at scale: without it Spark runs a blocking distinct job first)",
)
def mv2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double"))
    )
    return piv.select(
        "day",
        F.col("click").alias("click_sum"),
        F.col("view").alias("view_sum"),
        F.col("purchase").alias("purchase_sum"),
    )


@register(
    "mv3_unpivot",
    """
    SELECT day, metric, value
    FROM (
      SELECT date_trunc('day',
               strptime(strftime(ts, '%Y-%m-%d'), '%Y-%m-%d')) AS day,
             CAST(sum(CASE WHEN event_type = 'click'
                           THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS click_sum,
             CAST(sum(CASE WHEN event_type = 'view'
                           THEN CAST(value AS DECIMAL(28,6)) END) AS DOUBLE) AS view_sum
      FROM events
      GROUP BY 1
    )
    UNPIVOT (value FOR metric IN (click_sum, view_sum))
    """,
    doc="Unpivot (wide→long), the inverse of mv2: melt per-day metric "
    "columns back into (metric, value) rows. Spark's unpivot is a zero-"
    "shuffle Expand node — each input row fans out to one row per metric "
    "in place; the only shuffle is the upstream aggregate. NULL cells are "
    "dropped by both engines (UNPIVOT default ≡ Spark melt without "
    "includeNulls)",
)
def mv3_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", ["click", "view"])
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double"))
        .select(
            "day",
            F.col("click").alias("click_sum"),
            F.col("view").alias("view_sum"),
        )
    )
    return wide.unpivot("day", ["click_sum", "view_sum"], "metric", "value").filter(
        F.col("value").isNotNull()
    )
