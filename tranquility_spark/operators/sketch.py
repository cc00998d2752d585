"""Mergeable KMV (k-minimum-values) distinct sketch with theta set operations.

Reference parity: SURVEY.md §2.4 A11 — Druid's thetaSketch aggregator
(org.apache.druid.query.aggregation.datasketches.theta, used via tranquility
metricsSpec [recall]). Druid's value proposition is that sketches built per
segment MERGE at query time and support union/intersection/difference
estimates. ``a11b_distinct_set_ops`` is the exact twin; this module is the
approximate, mergeable twin.

Spark-first design — the whole sketch lives in built-in expressions:

- build: hash each value to uniform [0,1) via ``xxhash64`` (JVM,
  whole-stage-codegen), dedup ``(group, hash)`` with a hash aggregate
  (map-side partials — the only pass over the raw data), then keep the k
  smallest per group with one window (shuffle by group, in-partition sort).
  Sketch state per group is a bounded ``array<double>`` of ≤ k values plus a
  ``theta`` threshold — a few KB regardless of group size.
- merge: KMV is exactly mergeable — the k smallest distinct hashes of a
  union are a subset of the union of per-partial k smallest, so re-running
  the k-smallest selection over exploded partial sketches reproduces the
  sketch of the raw union BIT-FOR-BIT (asserted in tests/test_sketch.py).
  At 100 TB this is the point: build per segment/day at ingest (raw data
  touched once, map-side), answer distinct/set-op queries later by merging
  kilobyte sketches — never rescanning raw data.
- set ops: standard theta estimators. With ``theta = min(theta_a, theta_b)``
  and ``va/vb`` the retained values below theta, every distinct element of
  A (resp. B) with hash < theta is present in va (resp. vb), so

      |A ∪ B|  ≈ |va ∪ vb|          / theta
      |A ∩ B|  ≈ |va ∩ vb|          / theta
      |A \\ B| ≈ |va except vb|     / theta

  computed with ``array_union/array_intersect/array_except`` — pure JVM.

Accuracy: the KMV estimator (k-1)/theta has relative standard error
≈ 1/sqrt(k-2) (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD'07). k=256 → ~6.3%; intersection error
grows as the true intersection shrinks relative to the union (standard theta
behavior). Groups with fewer than k distinct values have theta=1 and are
EXACT. Bounds are asserted in tests/test_sketch.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 256

# xxhash64 spans the full signed 64-bit range; /2^64 + 0.5 maps it onto
# [0, 1). The double rounding loses the low ~11 bits — irrelevant for
# k ≤ 2^20 sketches (collision probability ~k²/2^53).
_TWO_64 = float(2**64)


def hash01(col) -> F.Column:
    """Uniform [0,1) hash of a column (JVM xxhash64, codegen-friendly)."""
    return (F.xxhash64(col).cast("double") / F.lit(_TWO_64)) + F.lit(0.5)


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-group KMV sketch: ``group_cols…, kmv array<double>, theta, est``.

    One hash-aggregate over the raw data (map-side combined), one window on
    the bounded distinct-hash set. est is exact when the group has < k
    distinct values.
    """
    g = list(group_cols)
    hashed = df.select(*g, hash01(F.col(value_col)).alias("__h")).dropDuplicates(g + ["__h"])
    w = Window.partitionBy(*g).orderBy("__h")
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    sk = kept.groupBy(*g).agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
    return sk.select(
        *g,
        "kmv",
        F.when(F.size("kmv") < k, F.lit(1.0))
        .otherwise(F.element_at("kmv", k))
        .alias("theta"),
    ).withColumn(
        "est",
        F.when(F.size("kmv") < F.lit(k), F.size("kmv").cast("double")).otherwise(
            F.lit(float(k - 1)) / F.col("theta")
        ),
    )


def kmv_merge(
    partials: DataFrame,
    group_cols: Sequence[str],
    k: int = DEFAULT_K,
) -> DataFrame:
    """Merge partial sketches (e.g. per-day) down to ``group_cols``.

    Input needs ``kmv`` + ``theta`` columns. Exactly reproduces
    ``kmv_sketch`` run on the concatenated raw data: retained values are
    filtered to the smallest partial theta, deduped, and the k smallest kept.
    Shuffles only sketch rows (≤ k doubles each), never raw data.
    """
    g = list(group_cols)
    # ONE consumption of `partials`: theta rides every exploded row and a
    # group-window min replaces the old separate tmin agg + join — which
    # scanned the partials subtree twice, and when `partials` is an
    # unpersisted kmv_sketch plan that meant re-running the raw-data scan
    # (the hh1 adjudication lesson, applied here in r8; duplication of
    # theta across a partial's exploded rows cannot change the min).
    # <= not <: a saturated partial's theta IS its k-th retained hash
    # (element_at(kmv, k)), so the boundary value is part of the sketch —
    # strict < would drop it and break bit-identity with the direct build.
    wg = Window.partitionBy(*g)
    vals = (
        partials.select(*g, "theta", F.explode("kmv").alias("__h"))
        .withColumn("__tmin", F.min("theta").over(wg))
        .filter(F.col("__h") <= F.col("__tmin"))
        .drop("theta")
        .dropDuplicates(g + ["__h"])
    )
    w = Window.partitionBy(*g).orderBy("__h")
    ranked = vals.withColumn("__rn", F.row_number().over(w))
    sk = ranked.groupBy(*g).agg(
        F.sort_array(
            F.collect_list(F.when(F.col("__rn") <= k, F.col("__h")))
        ).alias("kmv"),
        F.min("__tmin").alias("__tmin"),
    )
    return sk.select(
        *g,
        "kmv",
        F.when(F.size("kmv") < k, F.col("__tmin"))
        .otherwise(F.element_at("kmv", k))
        .alias("theta"),
    ).withColumn(
        "est",
        F.when(
            F.size("kmv") < F.lit(k),
            F.size("kmv").cast("double") / F.col("theta"),
        ).otherwise(F.lit(float(k - 1)) / F.col("theta")),
    )


def sketch_partials_sink(
    out_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    k: int = DEFAULT_K,
):
    """foreachBatch sink: append one KMV partial sketch per group per
    micro-batch (Druid's ingest-time sketch build restated for Structured
    Streaming — the raw stream is touched once, what lands on disk is
    kilobytes of sketch state per group, and ``kmv_merge`` at read time
    reproduces the batch sketch of the full stream BIT-FOR-BIT; asserted in
    tests/test_sketch.py).

    The in-batch build is plain ``kmv_sketch`` — windows are legal inside
    foreachBatch because each micro-batch is a batch DataFrame. Each batch
    lands in its own ``batch_id=`` partition under dynamic partition
    overwrite (``batch_sink.write_batch_partition``), so a foreachBatch
    redelivery rewrites its partition instead of appending a duplicate —
    replays are idempotent without reader cooperation.
    """
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = kmv_sketch(batch_df, group_cols, value_col, k=k)
        write_batch_partition(partials, out_dir, batch_id)

    return write


def theta_set_ops(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Theta-sketch set-operation estimates between two single-row sketches.

    Returns one row: ``inter_est, union_est, a_only_est`` (doubles). Both
    inputs must be 1-row frames with ``kmv`` + ``theta`` (crossJoin of two
    single rows — the same broadcast-of-one-row pattern as the cosine query
    probe, not a data-scale cartesian).
    """
    a = sketch_a.select(F.col("kmv").alias("kmv_a"), F.col("theta").alias("theta_a"))
    b = sketch_b.select(F.col("kmv").alias("kmv_b"), F.col("theta").alias("theta_b"))
    joined = a.crossJoin(F.broadcast(b))
    theta = F.least("theta_a", "theta_b")
    va = F.filter("kmv_a", lambda x: x < theta)
    vb = F.filter("kmv_b", lambda x: x < theta)
    return joined.select(
        (F.size(F.array_intersect(va, vb)) / theta).alias("inter_est"),
        (F.size(F.array_union(va, vb)) / theta).alias("union_est"),
        (F.size(F.array_except(va, vb)) / theta).alias("a_only_est"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summary: deterministic bottom-k-by-hash row sample.
# Third mergeable-summary family alongside KMV (distinct) and Misra-Gries
# (frequency). A uniform row sample supports quantiles with rank error
# O(1/sqrt(k)) (CLT on the order statistic), and selecting the k rows with
# the SMALLEST xxhash64(row id) makes the sample deterministic AND exactly
# mergeable: the global bottom-k of a union is a subset of the union of
# per-partial bottom-k's, so re-selecting over exploded partials reproduces
# the direct sample BIT-FOR-BIT — same argument as KMV, applied to rows
# instead of distinct values.
# ---------------------------------------------------------------------------


def quantile_sample_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group mergeable quantile summary:
    ``group_cols…, sample array<struct<h,v>>, n_total``.

    ``id_col`` must uniquely identify rows (it drives the sampling hash, so
    the sample is over the value MULTISET — hashing the value itself would
    sample distinct values, skewing quantiles). One map-side-combined pass
    computes n_total; one window keeps the k smallest-hash rows. Groups
    with ≤ k rows carry every row — their quantiles are EXACT.
    """
    g = list(group_cols)
    hashed = df.select(
        *g,
        hash01(F.col(id_col)).alias("__h"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # ONE consumption of the raw scan: the ranking window sees every row,
    # so n_total is a plain count in the SAME aggregation that collects
    # the bottom-k sample (conditional collect_list skips the `when`'s
    # NULLs). The old kept/totals branches re-joined on the group key and
    # scanned the raw data twice (hh1 adjudication lesson, applied r8).
    w = Window.partitionBy(*g).orderBy("__h")
    ranked = hashed.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("__rn") <= k,
                    F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")),
                )
            )
        ).alias("sample"),
    )


def quantile_sample_merge(
    partials: DataFrame,
    group_cols: Sequence[str],
    k: int = 256,
) -> DataFrame:
    """Merge partials down to ``group_cols`` — bit-identical to building the
    sketch directly on the concatenated raw data (the KMV merge argument).
    Only kilobyte sample rows shuffle, never raw data."""
    g = list(group_cols)
    # ONE consumption of `partials` (hh1 adjudication lesson, applied r8):
    # posexplode marks each partial row's first element, so the group's
    # total rides the exploded frame as a window sum of pos-0 n_totals —
    # no second scan of the partial-build subtree, no join back. The sum
    # is taken BEFORE the dedup (each appended partial row contributes its
    # n_total exactly once, replayed appends double-count exactly as the
    # old partials-level agg did — replay safety stays with the sink's
    # batch_id= overwrite contract).
    # dropDuplicates mirrors kmv_merge: a replayed micro-batch appends an
    # IDENTICAL partial (same (h, v) rows), and without dedup those copies
    # would occupy bottom-k slots and displace genuine rows — breaking the
    # bit-identity contract. Distinct rows are unaffected: different source
    # rows have different ids, hence different h (collisions ~2^-53).
    # __ntot is constant per group by then, so the arbitrary-row-survival
    # of unlisted columns in dropDuplicates cannot change it.
    # posexplode_OUTER (mirroring mg_merge, ADVICE r8): a partial row with
    # an EMPTY sample array still yields one (pos NULL, s NULL) row, so
    # its n_total keeps riding the frame instead of silently dropping out
    # of the merged total. Unreachable from quantile_sample_sketch's own
    # output (its samples are never empty) but the merge contract accepts
    # arbitrary partials frames. The NULL-struct rows rank LAST
    # (asc_nulls_last) so they can never displace a genuine row from a
    # bottom-k slot, and the collect condition skips them.
    wg = Window.partitionBy(*g)
    vals = (
        partials.select(
            *g, "n_total", F.posexplode_outer("sample").alias("__pos", "s")
        )
        .withColumn(
            "__ntot",
            F.sum(
                F.when(
                    (F.col("__pos") == 0) | F.col("__pos").isNull(),
                    F.col("n_total"),
                ).otherwise(0)
            ).over(wg),
        )
        .drop("n_total", "__pos")
        .dropDuplicates(g + ["s"])
    )
    w = Window.partitionBy(*g).orderBy(F.col("s.h").asc_nulls_last())
    ranked = vals.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy(*g).agg(
        F.max("__ntot").alias("n_total"),
        F.sort_array(
            F.collect_list(
                F.when((F.col("__rn") <= k) & F.col("s").isNotNull(), F.col("s"))
            )
        ).alias("sample"),
    )


def quantile_estimates(
    sketch: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Estimated quantiles from the sample: for each q, the value at rank
    ceil(q * |sample|) of the sample's sorted VALUES. Rank error vs the true
    quantile is ~ z * sqrt(q(1-q)/k) (CLT); exact when the group fit in k."""
    g = list(group_cols)
    vs = F.sort_array(F.transform("sample", lambda s: s["v"]))
    out = sketch.withColumn("__vs", vs)
    for q in quantiles:
        idx = F.greatest(
            F.lit(1), F.ceil(F.size("__vs").cast("double") * F.lit(float(q))).cast("int")
        )
        out = out.withColumn(f"p{int(q * 100)}", F.element_at("__vs", idx))
    return out.drop("__vs", "sample")


def quantile_partials_sink(
    out_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = DEFAULT_K,
):
    """foreachBatch sink: one bottom-k quantile sample partial per group per
    micro-batch; ``quantile_sample_merge`` at read time reproduces the
    direct batch sample of the full stream BIT-FOR-BIT (same contract as
    ``sketch_partials_sink`` — keep the checkpoint with the output). Each
    batch lands in its own ``batch_id=`` partition under dynamic partition
    overwrite, so a replayed batch REPLACES its earlier write: both the
    sample and the sum-based ``n_total`` stay exact after redelivery with
    no reader-side dedupe. Completes the streaming lifecycle for the third
    mergeable-summary family (KMV / MG / quantiles).
    """
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = quantile_sample_sketch(batch_df, group_cols, value_col, id_col, k=k)
        write_batch_partition(partials, out_dir, batch_id)

    return write
