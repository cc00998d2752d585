"""HyperLogLog distinct-count partials via Spark's NATIVE Datasketches
functions (mergeable family #6 — the engine-native mergeable form of Druid's
hyperUnique aggregator, SURVEY.md §2.4 A6).

The other mergeable families in this package (KMV theta, Misra-Gries,
bottom-k quantiles, bloom, Count-Min) are hand-built as relational tables so
their merge algebra is inspectable and their oracles can rebuild them. HLL
closes the loop from the other direction: Spark 3.5+ ships Apache
Datasketches HLL as built-in JVM aggregates (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``), so the sketch state is an
opaque binary column but everything runs in whole-stage-codegen'd
aggregates with map-side partials — the exact physical shape Druid uses for
hyperUnique at ingest (build per segment) and query (merge across segments).

Merge contract — WEAKER than the hand-built families and documented as such:
HLL registers are per-slot maxima, so register STATE is order-independent
and merge-then-estimate equals direct-estimate (asserted in tests), but the
serialized BYTES are not guaranteed identical (the Datasketches HLL_4/HLL_8
representation and its sparse->dense promotion depend on build history).
Consumers must compare estimates, never sketch bytes. Replay safety comes
from idempotence: re-unioning an identical partial cannot raise any
register, so duplicated partials are harmless (bloom's OR argument, not
CMS's batch_id-only argument — though the sink still lands ``batch_id=``
partitions for uniform ops tooling).

Accuracy: RSE ~ 1.04 / sqrt(2^lgk); lgk=12 (4 KiB dense) gives ~1.6%.

Reference note: tranquility forwards hyperUnique aggregators to Druid
(``DruidBeams`` rollup spec); this is the Spark-side build+merge lifecycle
of that aggregator, per the build brief's mergeable-summary family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def hll_partials(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketch of ``key_col`` — one hash agg with map-side
    partial sketches; the exchange carries one ≤(2^lgk)-register sketch per
    (partition, group), never the key stream."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll_sketch")
    )


def hll_merge(
    partials: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Union per-group partials into one sketch per group (register-wise
    max — order-independent and replay-idempotent). ``allowDifferentLgK``
    stays False: a partial built with another lgk is a config error, not
    data."""
    return partials.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("hll_sketch"), F.lit(False)).alias("hll_sketch")
    )


def hll_estimates(sketches: DataFrame) -> DataFrame:
    """Append the distinct-count estimate (long) for each group's sketch."""
    return sketches.withColumn(
        "distinct_est", F.hll_sketch_estimate(F.col("hll_sketch"))
    )


def hll_partials_sink(
    out_dir: str,
    group_cols: Sequence[str],
    key_col: str,
    lgk: int = DEFAULT_LGK,
):
    """foreachBatch sink: one per-group sketch partial per micro-batch in
    its own ``batch_id=`` partition. Doubly replay-safe: the partition
    overwrite is byte-idempotent AND hll union itself is idempotent."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = hll_partials(batch_df, group_cols, key_col, lgk)
        write_batch_partition(partials, out_dir, batch_id)

    return write


def hll_merge_read(spark, out_dir: str, group_cols: Sequence[str]) -> DataFrame:
    """Merge every persisted partial into lifetime per-group sketches."""
    return hll_merge(spark.read.parquet(out_dir), group_cols)
