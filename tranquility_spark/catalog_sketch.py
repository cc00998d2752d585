"""Mergeable-sketch catalog entries (SURVEY.md §2.4 A11 approximate twin).

``a11b_distinct_set_ops`` (catalog_relational) is the exact twin; the entries
here are the approximate, MERGEABLE variants built on operators/sketch.py.
They are deterministic (xxhash64 is seedless) but not expressible in DuckDB
SQL (no matching hash), so they carry the documented rows-only policy; their
quantitative accuracy and exact-merge properties are asserted in
tests/test_sketch.py against the exact twins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tranquility_spark.catalog import _t, register
from tranquility_spark.operators.sketch import kmv_merge, kmv_sketch, theta_set_ops

_K = 256


def _event_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "error"))
    return kmv_sketch(ev, ["event_type"], "user_id", k=_K)


@register(
    "a11c_theta_setops_approx",
    None,  # deterministic but hash-based — no cross-engine SQL oracle (policy)
    doc="A11 approximate twin: theta-sketch intersection/union/difference of "
    "click-vs-error user sets from two k=256 KMV sketches. Raw data is "
    "touched once (hash-agg dedup, map-side partials); the set algebra runs "
    "on two ≤256-element arrays. RSE ≈ 1/sqrt(k-2) ≈ 6.3% — tolerance vs the "
    "exact twin a11b asserted in tests/test_sketch.py",
)
def a11c_theta_setops_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = _event_sketches(spark, sf_dir)
    a = sk.filter(F.col("event_type") == "click").drop("event_type")
    b = sk.filter(F.col("event_type") == "error").drop("event_type")
    return theta_set_ops(a, b).select(
        F.round("inter_est", 6).alias("both_types_est"),
        F.round("union_est", 6).alias("either_type_est"),
        F.round("a_only_est", 6).alias("click_only_est"),
    )


@register(
    "a11d_sketch_merge_rollup",
    None,  # rows-only by the same policy; exact-merge property unit-asserted
    doc="A11 mergeability: per-(event_type, day) partial KMV sketches merged "
    "down to per-type distinct-user estimates — the Druid pattern of building "
    "sketches per segment at ingest and merging at query time without "
    "rescanning raw data. kmv_merge(partials) is BIT-identical to a direct "
    "sketch of the raw union (asserted in tests/test_sketch.py)",
)
def a11d_sketch_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    partials = kmv_sketch(ev, ["event_type", "day"], "user_id", k=_K)
    merged = kmv_merge(partials, ["event_type"], k=_K)
    return merged.select(
        "event_type",
        F.size("kmv").alias("sketch_size"),
        F.round("est", 6).alias("uniq_users_est"),
    ).orderBy("event_type")


@register(
    "a10c_quantile_sketch_merge",
    None,  # rows-only by the sketch policy; merge bit-identity + CLT rank
    # bounds asserted in tests/test_sketch.py
    doc="Mergeable quantile summary — the third mergeable-summary family "
    "next to KMV (distinct, a11c/d) and Misra-Gries (frequency, hh1): "
    "per-(event_type, day) bottom-k-by-hash row samples of `value`, merged "
    "down to per-type p50/p90 estimates. The deterministic bottom-k sample "
    "is exactly mergeable (the KMV argument applied to rows), so sketches "
    "built per segment at ingest answer quantile queries later without "
    "rescanning raw data; rank error ~ sqrt(q(1-q)/k). The approximate, "
    "mergeable twin of a10's percentile aggregations",
)
def a10c_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.sketch import (
        quantile_estimates,
        quantile_sample_merge,
        quantile_sample_sketch,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    partials = quantile_sample_sketch(
        ev, ["event_type", "day"], "value", "event_id", k=_K
    )
    merged = quantile_sample_merge(partials, ["event_type"], k=_K)
    est = quantile_estimates(merged, ["event_type"], quantiles=(0.5, 0.9))
    return est.select(
        "event_type",
        "n_total",
        F.round("p50", 6).alias("p50_est"),
        F.round("p90", 6).alias("p90_est"),
    ).orderBy("event_type")


@register(
    "a10e_kll_deterministic",
    None,  # rows-only by the sketch policy; determinism (partition-
    # invariance, rerun bit-identity), measured rank envelope, weight
    # conservation and the batch_id= replay contract are all asserted in
    # tests/test_sketch.py
    doc="DETERMINISTIC KLL/MRL-style quantile sketch (operators/kll.py, "
    "mergeable family #7) — closes the gap VERDICT r07 named: Spark's "
    "native KLL is excluded from the catalog because its unseeded "
    "compaction changes values across reruns; this sketch derives every "
    "compaction decision from a CRC of the compacted items, so builds "
    "AND merges are bit-reproducible across reruns, processes and "
    "physical partitionings (values fold in canonical sorted order "
    "inside each partial). Per-(event_type, day) partials built by one "
    "applyInPandas pass (summary = relational (level, value) rows, "
    "kilobytes at any partial size), merged per type in canonical "
    "partial-id order, quantiles answered by pure DataFrame window math "
    "(weight 2^level, smallest value whose running weight reaches "
    "ceil(q*W)). Contracts: vs a10c's bottom-k (merge bit-identical to "
    "direct, O(1/sqrt(k)) error) this trades direct-build identity for "
    "multi-level O(k log(n/k)) space with a tighter measured envelope; "
    "merge is deterministic but NOT direct-identical (compaction "
    "history, the HLL-style caveat) and NOT replay-idempotent (CMS "
    "argument — batch_id= dynamic-overwrite partitions are the safety "
    "mechanism, kll_partials_sink)",
)
def a10e_kll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.kll import (
        kll_merge,
        kll_partial,
        kll_quantiles,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.to_date("ts").cast("string").alias("day"),
    )
    partials = kll_partial(ev, ["event_type", "day"], "v")
    merged = kll_merge(partials, ["event_type"], "day")
    est = kll_quantiles(merged, ["event_type"], quantiles=(0.5, 0.9, 0.99))
    return est.select(
        "event_type",
        "n_total",
        F.round("p50", 6).alias("p50_est"),
        F.round("p90", 6).alias("p90_est"),
        F.round("p99", 6).alias("p99_est"),
    ).orderBy("event_type")


@register(
    "a6c_hyperunique_mergeable",
    None,  # sketch state is engine-defined binary — rows-only by the same
    # policy as a11c/a11d; estimate-equality + accuracy asserted in tests
    doc="A6 mergeable lifecycle via Spark's NATIVE Datasketches HLL "
    "(operators/hll.py, mergeable family #6): per-(event_type, day) "
    "sketch partials built at 'ingest', merged to per-type distinct-user "
    "estimates at 'query' without rescanning raw data — exactly Druid's "
    "hyperUnique build-per-segment / merge-at-query split, here in two "
    "bounded JVM aggs (the exchange carries 4 KiB sketches, never "
    "user_ids). Merge contract: estimate-identical to a direct build "
    "while sketches stay SPARSE (the tested partial scale); past the "
    "dense transition the union's register state can differ from a "
    "direct build's — measured ~0.5% apart at sf0.1, both inside RSE of "
    "exact (found by a6c2's strict-equality first draft, r11). Union is "
    "replay-idempotent by register-max. lgk=12 -> RSE ~1.6%; <=5% vs "
    "exact asserted in tests/test_sketch.py; the tracking bounds are "
    "driver-certified by a6c2",
)
def a6c_hyperunique_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.hll import (
        hll_estimates,
        hll_merge,
        hll_partials,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    partials = hll_partials(ev, ["event_type", "day"], "user_id")
    merged = hll_merge(partials.drop("day"), ["event_type"])
    return hll_estimates(merged).select("event_type", "distinct_est")


@register(
    "a11e_theta_native",
    None,  # rows-only by the a11c policy (hash-based sketch, no SQL oracle);
    # determinism + accuracy vs the exact twin asserted in tests
    doc="A11 via Spark's NATIVE Datasketches theta functions (the engine-"
    "native twin of the hand-built KMV in a11c): click-vs-error user-set "
    "intersection/union/difference from two theta_sketch_agg states and "
    "theta_union/intersection/difference set algebra. Same physical "
    "shape as a11c — raw data touched once by a map-side-partialed "
    "sketch agg, set ops run on kilobyte states — but the sketch is the "
    "default-k=4096 Datasketches implementation (RSE ~1.6%), and unlike "
    "KLL its state is DETERMINISTIC (k smallest hashes — order-"
    "independent), so the entry is rerun-stable like every other "
    "rows-only entry (asserted). Accuracy vs exact a11b asserted in "
    "tests/test_sketch.py",
)
def a11e_theta_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    sk = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = sk.filter(F.col("event_type") == "click").select(
        F.col("sk").alias("sk_a")
    )
    b = sk.filter(F.col("event_type") == "error").select(
        F.col("sk").alias("sk_b")
    )
    return a.crossJoin(b).select(
        F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b")).alias(
            "both_types_est"
        ),
        F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b")).alias(
            "either_type_est"
        ),
        F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b")).alias(
            "click_only_est"
        ),
    )


def _exact_setops_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact click/error user-set algebra as ONE aggregate row (Spark-side
    twin shared by a11c2/a11e2): per-user click/error presence flags from a
    single hash agg, then intersection/union/a-only counts from the flags —
    no set materialization, two map-side-combined aggs at any scale."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("e"),
    )
    return flags.agg(
        F.sum(F.col("c") * F.col("e")).cast("double").alias("n_inter"),
        F.count(F.lit(1)).cast("double").alias("n_union"),
        F.sum(F.col("c") * (F.lit(1) - F.col("e"))).cast("double").alias("n_aonly"),
    )


def _setops_sandwich(est1: DataFrame, est2: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """The hh1b constant-oracle shape for a theta set-ops row: each of the
    three estimates must sit within 4·RSE(k)·|A∪B| of its exact twin (the
    tests' accuracy envelope — intersection/difference errors scale with the
    UNION size, standard theta behavior), and a full second build must
    reproduce the row bit-identically."""
    rse = 1.0 / math.sqrt(k - 2)
    budget = F.lit(4.0 * rse) * F.col("n_union")
    flags = est1.crossJoin(F.broadcast(exact)).select(
        (F.abs(F.col("both_types_est") - F.col("n_inter")) <= budget)
        .cast("long")
        .alias("inter_in_bound"),
        (F.abs(F.col("either_type_est") - F.col("n_union")) <= budget)
        .cast("long")
        .alias("union_in_bound"),
        (F.abs(F.col("click_only_est") - F.col("n_aonly")) <= budget)
        .cast("long")
        .alias("aonly_in_bound"),
    )
    est2r = est2.select(*[F.col(c).alias(f"r_{c}") for c in est2.columns])
    rerun = est1.crossJoin(F.broadcast(est2r)).select(
        (
            (F.col("both_types_est") == F.col("r_both_types_est"))
            & (F.col("either_type_est") == F.col("r_either_type_est"))
            & (F.col("click_only_est") == F.col("r_click_only_est"))
        )
        .cast("long")
        .alias("rerun_identical")
    )
    return flags.crossJoin(F.broadcast(rerun))


_SETOPS_PROBE_ORACLE = """
    SELECT CAST(1 AS BIGINT) AS inter_in_bound,
           CAST(1 AS BIGINT) AS union_in_bound,
           CAST(1 AS BIGINT) AS aonly_in_bound,
           CAST(1 AS BIGINT) AS rerun_identical
    """


@register(
    "a11c2_theta_setops_tracks_exact",
    _SETOPS_PROBE_ORACLE,
    doc="Driver-certified contract probe for a11c (r12 rows-only-tail "
    "deepening, the hh1b exact-twin-sandwich shape): the KMV theta "
    "set-ops estimates evaluated as booleans against the EXACT "
    "click/error user-set algebra computed independently in Spark (one "
    "per-user flag agg — no set materialization) and hash-checked "
    "against the constant (1,1,1,1) oracle. Each estimate must sit "
    "within 4·RSE(k=256)·|A∪B| of its exact value — the accuracy "
    "envelope tests/test_sketch.py asserts (intersection/difference "
    "error scales with UNION size, standard theta behavior); "
    "rerun_identical re-builds both sketches from raw events and "
    "requires the bit-identical row (KMV is seedless xxhash64 — "
    "order-independent k-smallest, the determinism the rows-only "
    "policy rests on). Not in the bench headline: a11c carries the "
    "measured row",
)
def a11c2_theta_setops_tracks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    est1 = a11c_theta_setops_approx(spark, sf_dir)
    est2 = a11c_theta_setops_approx(spark, sf_dir)
    return _setops_sandwich(est1, est2, _exact_setops_row(spark, sf_dir), _K)


@register(
    "a11e2_theta_native_tracks_exact",
    _SETOPS_PROBE_ORACLE,
    doc="Driver-certified contract probe for a11e (r12, same shape as "
    "a11c2): Spark's NATIVE Datasketches theta set algebra sandwiched "
    "against the exact Spark-side twin with the 4·RSE(k=4096)·|A∪B| "
    "budget, plus bit-identical rerun of the full "
    "sketch-build-plus-set-ops pipeline (the Datasketches theta state "
    "is k-smallest-hashes — deterministic and order-independent, unlike "
    "its KLL sibling, which is exactly why a11e is catalogable at all). "
    "Certifies the engine-native path tracks truth with the SAME "
    "obligations as the hand-built KMV — the two implementations are "
    "interchangeable at the contract level. Not in the bench headline: "
    "a11e carries the measured row",
)
def a11e2_theta_native_tracks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    est1 = a11e_theta_native(spark, sf_dir)
    est2 = a11e_theta_native(spark, sf_dir)
    # native theta default k: lgNomEntries=12 -> 4096 nominal entries
    return _setops_sandwich(est1, est2, _exact_setops_row(spark, sf_dir), 4096)


@register(
    "a10f_gk_quantiles",
    None,  # rows-only by the sketch policy; the PROVEN 2*eps*n bound,
    # interval invariants, partition-invariance and tie-order handling are
    # asserted strictly in tests/test_sketch.py + a hypothesis sweep in
    # tests/test_properties.py
    doc="PROVEN-epsilon deterministic quantile summary (operators/gk.py, "
    "mergeable family #8) — closes VERDICT r08 'missing' #3: a10e's "
    "deterministic KLL carries a measured rank envelope; this family "
    "carries a PROVEN bound. Greenwald-Khanna's batch specialization "
    "(the written decision is in the module header): partials build "
    "inside applyInPandas where n is KNOWN, so the GK tuple machinery "
    "collapses to exact equi-depth cuts at stride floor(eps*n) — GK's "
    "invariant with delta=0 at minimal ~1/eps size. One merge level "
    "computes exact global rank INTERVALS under a consistent tie order "
    "(canonical partial-id — the detail that keeps the proof alive "
    "under heavy duplicates), giving a proven < 2*eps*n quantile error; "
    "estimates are one min_by agg over the kilobyte summary. Per-"
    "(event_type, day) partials, merged per type, eps=0.01. NOT direct-"
    "build-identical (cut positions differ; the dKLL/HLL caveat), NOT "
    "replay-idempotent (batch_id= overwrite is the safety mechanism, "
    "gk_partials_sink)",
)
def a10f_gk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.gk import gk_merge, gk_partial, gk_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.to_date("ts").cast("string").alias("day"),
    )
    partials = gk_partial(ev, ["event_type", "day"], "v", eps=0.01)
    merged = gk_merge(partials, ["event_type"], "day")
    est = gk_quantiles(merged, ["event_type"], quantiles=(0.5, 0.9, 0.99))
    return est.select(
        "event_type",
        "n_total",
        F.round("p50", 6).alias("p50_est"),
        F.round("p90", 6).alias("p90_est"),
        F.round("p99", 6).alias("p99_est"),
    ).orderBy("event_type")


@register(
    "a10e2_kll_partition_invariance",
    """
    SELECT CAST(0 AS BIGINT) AS n_mismatched, CAST(1 AS BIGINT) AS both_nonempty
    """,
    doc="Driver-certified contract probe for a10e (VERDICT r10 #5, the "
    "dd11b/dd2b constant-oracle pattern): the dKLL pipeline's DETERMINISM "
    "claim — 'bit-reproducible across reruns, processes and partitionings' "
    "(operators/kll.py module header) — made a hash-checked equality: the "
    "full partial→merge→quantiles pipeline run on the events frame AND on "
    "an adversarially repartitioned copy (repartition(7, v) — different "
    "physical layout AND row order within every group) must emit identical "
    "estimate rows. Emits the symmetric difference as a count row against "
    "the constant-0 oracle plus a both-sides non-emptiness flag. Not in "
    "the bench headline: a10e carries the measured row",
)
def a10e2_kll_partition_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.catalog_llm import _equality_probe
    from tranquility_spark.operators.kll import (
        kll_merge,
        kll_partial,
        kll_quantiles,
    )

    def pipeline(ev: DataFrame) -> DataFrame:
        partials = kll_partial(ev, ["event_type", "day"], "v")
        merged = kll_merge(partials, ["event_type"], "day")
        est = kll_quantiles(merged, ["event_type"], quantiles=(0.5, 0.9, 0.99))
        return est.select(
            "event_type",
            "n_total",
            F.round("p50", 6).alias("p50_est"),
            F.round("p90", 6).alias("p90_est"),
            F.round("p99", 6).alias("p99_est"),
        )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.to_date("ts").cast("string").alias("day"),
    )
    return _equality_probe(pipeline(ev), pipeline(ev.repartition(7, "v")))


@register(
    "a10f2_gk_bounds_certified",
    """
    SELECT CAST(1 AS BIGINT) AS all_intervals_valid,
           CAST(1 AS BIGINT) AS all_queries_in_bound
    """,
    doc="Driver-certified contract probe for a10f (VERDICT r10 #5): the GK "
    "summary's PROVEN obligations evaluated as a boolean frame against the "
    "raw data, hash-checked against the constant (1, 1) oracle. (a) every "
    "merged interval satisfies rmin <= rmax and rmax - rmin < max(1, "
    "eps*n) — the one-merge-level interval bound; (b) each served "
    "quantile's EXACT occurrence-rank distance to its target floor(q*(n-1)) "
    "is < max(1, 2*eps*n) — the 2-eps query bound, checked by counting "
    "v < est and v <= est over the events frame itself. The hypothesis "
    "suite asserts the same obligations on arbitrary multisets; this entry "
    "re-asserts them on the driver's fixture at every window rotation. "
    "Not in the bench headline: a10f carries the measured row",
)
def a10f2_gk_bounds_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.gk import gk_merge, gk_partial, gk_quantiles

    eps = 0.01
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.to_date("ts").cast("string").alias("day"),
    )
    partials = gk_partial(ev, ["event_type", "day"], "v", eps=eps)
    merged = gk_merge(partials, ["event_type"], "day")
    n_d = F.col("n_total").cast("double")
    intervals_ok = merged.agg(
        F.min(
            (F.col("rmin") <= F.col("rmax"))
            & (
                (F.col("rmax") - F.col("rmin")).cast("double")
                < F.greatest(F.lit(1.0), F.lit(eps) * n_d)
            )
        )
        .cast("long")
        .alias("all_intervals_valid")
    )
    est = gk_quantiles(merged, ["event_type"], quantiles=(0.5, 0.9, 0.99))
    served = est.select(
        "event_type",
        "n_total",
        F.expr(
            "stack(3, CAST(0.5 AS DOUBLE), p50,"
            " CAST(0.9 AS DOUBLE), p90,"
            " CAST(0.99 AS DOUBLE), p99) AS (q, est_v)"
        ),
    )
    counts = (
        ev.filter(F.col("v").isNotNull())
        .join(F.broadcast(served), "event_type")
        .groupBy("event_type", "q", "est_v", "n_total")
        .agg(
            F.sum(F.when(F.col("v") < F.col("est_v"), 1).otherwise(0)).alias("lo"),
            F.sum(F.when(F.col("v") <= F.col("est_v"), 1).otherwise(0)).alias("le"),
        )
    )
    target = F.floor(F.col("q") * (F.col("n_total") - F.lit(1)).cast("double"))
    dist = F.greatest(
        F.lit(0.0),
        (F.col("lo") - target).cast("double"),
        (target - (F.col("le") - F.lit(1))).cast("double"),
    )
    queries_ok = counts.agg(
        F.min(dist < F.greatest(F.lit(1.0), F.lit(2 * eps) * n_d))
        .cast("long")
        .alias("all_queries_in_bound")
    )
    return intervals_ok.crossJoin(F.broadcast(queries_ok))


@register(
    "a10g_gk_deep_rollup",
    """
    SELECT CAST(1 AS BIGINT) AS all_intervals_valid,
           CAST(1 AS BIGINT) AS all_queries_in_certified_bound
    """,
    doc="Multi-level GK rollup (r11 — the merge tree gk_merge refuses, "
    "done legally via operators/gk.py#gk_merge_deep): per-(event_type, "
    "day) proven-eps partials -> per-(event_type, month) level-1 merges "
    "-> one level-2 interval-arithmetic merge per event_type — the "
    "hierarchical re-summarization shape (persisted daily summaries "
    "rolled up without re-reading raw values; at 100 TB the raw scan "
    "happens once at ingest, every level above it shuffles kilobyte "
    "summary rows). Certified against the constant (1, 1) oracle: "
    "(a) every tree interval is structurally valid (rmin <= rmax within "
    "[0, n-1]); (b) every served quantile's EXACT occurrence-rank "
    "distance to its target is within gk_certified_error's bound "
    "COMPUTED from the tree summary itself — the honest contract at "
    "depth, where the flat merge's promised 2*eps*n constant no longer "
    "applies (error roughly doubles per level). The same obligations "
    "run on arbitrary multisets in the hypothesis suite; this entry "
    "re-asserts them on the driver's fixture every window rotation",
)
def a10g_gk_deep_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.gk import (
        gk_certified_error,
        gk_merge,
        gk_merge_deep,
        gk_partial,
        gk_quantiles,
    )

    eps = 0.01
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        F.to_date("ts").cast("string").alias("day"),
    )
    partials = gk_partial(ev, ["event_type", "day"], "v", eps=eps).withColumn(
        "month", F.substring("day", 1, 7)
    )
    level1 = gk_merge(partials, ["event_type", "month"], "day")
    tree = gk_merge_deep(level1, ["event_type"], "month")
    intervals_ok = tree.agg(
        F.min(
            (F.col("rmin") <= F.col("rmax"))
            & (F.col("rmin") >= 0)
            & (F.col("rmax") <= F.col("n_total") - 1)
        )
        .cast("long")
        .alias("all_intervals_valid")
    )
    cert = gk_certified_error(tree, ["event_type"]).select(
        "event_type", "certified_err"
    )
    est = gk_quantiles(tree, ["event_type"], quantiles=(0.5, 0.9, 0.99))
    served = est.join(F.broadcast(cert), "event_type").select(
        "event_type",
        "n_total",
        "certified_err",
        F.expr(
            "stack(3, CAST(0.5 AS DOUBLE), p50,"
            " CAST(0.9 AS DOUBLE), p90,"
            " CAST(0.99 AS DOUBLE), p99) AS (q, est_v)"
        ),
    )
    counts = (
        ev.filter(F.col("v").isNotNull())
        .join(F.broadcast(served), "event_type")
        .groupBy("event_type", "q", "est_v", "n_total", "certified_err")
        .agg(
            F.sum(F.when(F.col("v") < F.col("est_v"), 1).otherwise(0)).alias("lo"),
            F.sum(F.when(F.col("v") <= F.col("est_v"), 1).otherwise(0)).alias("le"),
        )
    )
    target = F.floor(F.col("q") * (F.col("n_total") - F.lit(1)).cast("double"))
    dist = F.greatest(
        F.lit(0.0),
        (F.col("lo") - target).cast("double"),
        (target - (F.col("le") - F.lit(1))).cast("double"),
    )
    queries_ok = counts.agg(
        F.min(dist <= F.col("certified_err"))
        .cast("long")
        .alias("all_queries_in_certified_bound")
    )
    return intervals_ok.crossJoin(F.broadcast(queries_ok))


@register(
    "a6c2_hll_merge_tracks_direct",
    """
    SELECT CAST(1 AS BIGINT) AS merge_tracks_direct,
           CAST(1 AS BIGINT) AS both_track_exact
    """,
    doc="Driver-certified contract probe for a6c (r11 rows-only-tail "
    "deepening) — and an honest one: writing this probe as a strict "
    "merged == direct equality FAILED at sf0.1, exposing that the "
    "estimate-identical merge contract only holds while the Datasketches "
    "sketches stay SPARSE; past the dense transition the union's "
    "register state differs from a direct build's (measured ~0.5% apart "
    "at sf0.1, both within RSE of exact). The certified claims are the "
    "true ones: merged and direct estimates within 1%% of each other per "
    "event_type (merge_tracks_direct), and BOTH within 5%% of the exact "
    "countDistinct (both_track_exact — the a6c accuracy bound, lgk=12 "
    "RSE ~1.6%%). Constant (1, 1) oracle. Not in the bench headline: "
    "a6c carries the measured row",
)
def a6c2_hll_merge_tracks_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.operators.hll import (
        hll_estimates,
        hll_merge,
        hll_partials,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    merged = hll_estimates(
        hll_merge(
            hll_partials(ev, ["event_type", "day"], "user_id").drop("day"),
            ["event_type"],
        )
    ).select("event_type", F.col("distinct_est").alias("m_est"))
    direct = hll_estimates(
        hll_partials(ev, ["event_type"], "user_id")
    ).select("event_type", F.col("distinct_est").alias("d_est"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    joined = merged.join(direct, "event_type").join(exact, "event_type")
    return joined.agg(
        F.min(
            F.abs(F.col("m_est") - F.col("d_est"))
            <= F.lit(0.01) * F.col("n_exact")
        )
        .cast("long")
        .alias("merge_tracks_direct"),
        F.min(
            (
                F.abs(F.col("m_est") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact")
            )
            & (
                F.abs(F.col("d_est") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact")
            )
        )
        .cast("long")
        .alias("both_track_exact"),
    )


@register(
    "a11d2_kmv_merge_equals_direct",
    """
    SELECT CAST(0 AS BIGINT) AS n_mismatched, CAST(1 AS BIGINT) AS both_nonempty
    """,
    doc="Driver-certified contract probe for a11d (r11): per-(event_type, "
    "day) KMV partials merged per type must be BIT-identical — retained "
    "hash set, theta, and estimate — to the direct sketch of the raw "
    "union (the k-smallest-hashes argument: the union's k smallest are "
    "among the partials' k smallest). Zero symmetric difference on the "
    "full sketch rows vs the constant-0 oracle. Not in the bench "
    "headline: a11d carries the measured row",
)
def a11d2_kmv_merge_equals_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.catalog_llm import _equality_probe

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    partials = kmv_sketch(ev, ["event_type", "day"], "user_id", k=_K)
    merged = kmv_merge(partials, ["event_type"], k=_K)
    direct = kmv_sketch(ev, ["event_type"], "user_id", k=_K)
    return _equality_probe(merged, direct)


@register(
    "a10c2_qsketch_merge_equals_direct",
    """
    SELECT CAST(0 AS BIGINT) AS n_mismatched, CAST(1 AS BIGINT) AS both_nonempty
    """,
    doc="Driver-certified contract probe for a10c (r11): per-(event_type, "
    "day) bottom-k-by-hash row samples merged per type must be "
    "BIT-identical — sample rows AND totals — to the direct sketch of "
    "the raw union (the KMV argument applied to rows). Zero symmetric "
    "difference on the full summary rows vs the constant-0 oracle. Not "
    "in the bench headline: a10c carries the measured row",
)
def a10c2_qsketch_merge_equals_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tranquility_spark.catalog_llm import _equality_probe
    from tranquility_spark.operators.sketch import (
        quantile_sample_merge,
        quantile_sample_sketch,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    partials = quantile_sample_sketch(
        ev, ["event_type", "day"], "value", "event_id", k=_K
    )
    merged = quantile_sample_merge(partials, ["event_type"], k=_K)
    direct = quantile_sample_sketch(
        ev, ["event_type"], "value", "event_id", k=_K
    )
    return _equality_probe(merged, direct)
