"""Count-Min sketch frequency estimation as a RELATIONAL sketch (mergeable
family #5).

The frequency question — "how many times has key X appeared?" — is the
additive sibling of bloom's membership question. hh1's Misra-Gries answers it
only for the top-k heavy hitters; the Count-Min sketch (Cormode &
Muthukrishnan 2005) answers a POINT QUERY for ANY key in bounded space. Like
the bloom filter, the sketch here is a sparse relational table, not an opaque
byte blob:

    (row_idx INT, col_idx BIGINT, cnt BIGINT)     -- depth x width counters

so every lifecycle step is a plain relational operation Catalyst can optimize:

- build  — explode each key occurrence into its ``depth`` (row, col) cells,
  one map-side-combined ``groupBy(row_idx, col_idx).agg(sum(weight))``; the
  exchange carries at most ``depth * width`` rows (kilobytes), never the
  corpus.
- merge  — union of counter tables + the same sum groupBy. Counter addition
  is associative and commutative, so the merge is BIT-identical to building
  directly on the concatenated data — the same contract as the KMV /
  Misra-Gries / quantile / bloom partials in this package. Unlike bloom's OR,
  addition is NOT idempotent, so replay safety comes from the storage layer:
  ``cms_partials_sink`` lands each micro-batch in its own ``batch_id=``
  partition under dynamic partition overwrite (operators/batch_sink.py), the
  hh1/KMV contract.
- estimate — the counter table is bounded by ``depth * width`` rows however
  many keys were inserted, so it folds into a ONE-ROW broadcast map and the
  point query is a narrow per-row projection over the probe frame
  (``min`` over ``depth`` inline lookups): no explode, no join shuffle, no
  groupBy. Estimating 100 TB of probes costs one scan.

Guarantees: ``est >= true`` always (counters only over-count, from collisions);
``est <= true + (e/width) * N`` with probability ``1 - e^-depth`` per key,
where N is the total inserted weight. Width buys accuracy, depth buys
confidence. Bounds asserted vs the exact twin in tests/test_sketch.py.

Hashing mirrors operators/bloom.py exactly (the cell column is ``bloom_pos``
with ``m_bits=width``): default ``xxhash64(key, i)`` for production;
``hash_fn="portable"`` switches to the cross-engine multiplicative hash so a
DuckDB oracle rebuilds the IDENTICAL counter table and the driver
hash-certifies build+estimate end-to-end (``cms_pos_sql`` emits the matching
SQL). The portable variant pre-reduces keys mod 100003 (keys congruent mod
100003 alias) — certification-fixture concern, not the default.

Reference note: the reference (tranquility) has no frequency sketch; this is
a training-data-pipeline extension per the build brief (heavy-hitters
family, txt10/hh1's point-query sibling).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tranquility_spark.operators.bloom import bloom_pos, bloom_pos_sql

DEFAULT_WIDTH = 1024
DEFAULT_DEPTH = 4


def cms_pos(key: Column, i: int, width: int, hash_fn: str = "xxhash64") -> Column:
    """Column index of depth-row ``i`` for ``key`` — non-negative in [0, width).

    Identical construction to a bloom bit position with ``m_bits=width``
    (same per-row prime-stride decorrelation of the k hashes).
    """
    return bloom_pos(key, i, width, hash_fn)


def cms_pos_sql(key_expr: str, i: int, width: int) -> str:
    """DuckDB fragment computing the identical PORTABLE column index."""
    return bloom_pos_sql(key_expr, i, width)


def cms_counters(
    df: DataFrame,
    key_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    hash_fn: str = "xxhash64",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sparse counter table ``(row_idx, col_idx, cnt)``.

    Each input row adds ``weight`` (default 1) to one cell per depth row.
    A NULL weight contributes nothing (sum skips NULLs) — pre-coalesce if
    NULL should mean 1. The explode is a narrow ``depth``-way fan-out; the
    single exchange is the counter agg, bounded by ``depth * width`` groups
    at any corpus size.
    """
    key = F.col(key_col)
    w = (F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long"))
    cell = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).cast("int").alias("row_idx"),
                    cms_pos(key, i, width, hash_fn).cast("long").alias("col_idx"),
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(cell, w.alias("__w"))
        .select("cell.row_idx", "cell.col_idx", "__w")
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(partials: Sequence[DataFrame]) -> DataFrame:
    """Sum-merge counter tables — bit-identical to a direct build on the
    union (addition is associative/commutative). NOT replay-idempotent on its
    own (unlike bloom's OR): a duplicated partial double-counts, so partials
    must come from an idempotent store — ``cms_partials_sink``'s ``batch_id=``
    dynamic-overwrite partitions, the hh1/KMV contract."""
    it = iter(partials)
    out = next(it)
    for p in it:
        out = out.unionByName(p)
    return out.groupBy("row_idx", "col_idx").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    counters: DataFrame,
    key_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    hash_fn: str = "xxhash64",
    out_col: str = "est_count",
) -> DataFrame:
    """Append ``out_col`` (long) — the CMS point-query estimate per probe row.

    The counter table collapses to a one-row ``map<row_idx*width + col_idx,
    cnt>`` broadcast (≤ depth*width entries however much data was inserted),
    so the estimate adds NO shuffle to the probe frame: each row takes the
    ``min`` of ``depth`` inline ``try_element_at`` lookups (a missing cell is
    0 — the key was never inserted).

    Contract: ``counters`` must have unique (row_idx, col_idx) — i.e. the
    output of ``cms_counters`` / ``cms_merge`` / ``cms_merge_read``; a raw
    multi-partial append would hand ``map_from_entries`` duplicate keys
    (throws under Spark's default mapKeyDedupPolicy). Merge first — the
    merge agg is bounded and cheap.

    Operational ceiling (ADVICE r07): the broadcast map holds up to
    depth*width entries on the driver and in every executor. The error
    bound (e/width)*N means keeping useful absolute error at 100 TB-scale
    N needs width >> 1e6, and at ~width 1e7 x depth 5 the single-row map
    (~0.5-1 GiB of long pairs) will exhaust the driver — this estimate
    path is for sketch-sized (<= a few million cells) configurations
    ONLY. Past that, use ``cms_estimate_join`` (same estimates,
    test-pinned equal): ``depth`` shuffled lookups per probe row, no
    driver materialization at any width.
    """
    cms_map = counters.agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        (
                            F.col("row_idx").cast("long") * F.lit(width)
                            + F.col("col_idx")
                        ).alias("k"),
                        F.col("cnt").alias("v"),
                    )
                )
            )
        ).alias("__cms_map")
    )
    key = F.col(key_col)
    est = None
    for i in range(depth):
        slot = F.lit(i).cast("long") * width + cms_pos(key, i, width, hash_fn)
        term = F.coalesce(
            F.try_element_at(F.col("__cms_map"), slot), F.lit(0).cast("long")
        )
        est = term if est is None else F.least(est, term)
    return (
        probes.crossJoin(F.broadcast(cms_map))
        .withColumn(out_col, est)
        .drop("__cms_map")
    )


def cms_estimate_join(
    probes: DataFrame,
    counters: DataFrame,
    key_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    hash_fn: str = "xxhash64",
    out_col: str = "est_count",
) -> DataFrame:
    """``cms_estimate``'s beyond-broadcast-fit twin: the JOIN-based point
    query for sketch widths too large to fold into a one-row driver map
    (the escape hatch the ``cms_estimate`` docstring documents; mirrors
    ``sbbf_probe``'s design).

    Each probe row explodes into its ``depth`` (row_idx, col_idx) slots,
    left-joins the counter table on the cell key, and takes
    ``min(coalesce(cnt, 0))`` per original row — an absent cell means the
    key's hash never landed there, i.e. count 0. Cost: a ``depth``-way
    narrow fan-out, one equi-join against the counter table, one
    per-probe-row min agg (the probe row rides the join as a struct, so
    there is no join-back). The counter table is the join's small side —
    AQE broadcasts it while it fits and shuffles it beyond that; nothing
    ever materializes on the driver at any width. Returns estimates
    identical to ``cms_estimate`` (equality is test-pinned).

    Contract: same unique-(row_idx, col_idx) requirement as
    ``cms_estimate`` — probing an un-merged multi-partial append joins a
    slot once per duplicate cell row and inflates the min. Merge first.
    ``probes`` must not already contain ``__cms_``-prefixed columns;
    ``counters``' own columns are consumed by the join and do not leak
    into the output.
    """
    key = F.col(key_col)
    slot = F.explode(
        F.array(
            *[
                (
                    F.lit(i).cast("long") * width
                    + cms_pos(key, i, width, hash_fn)
                ).cast("long")
                for i in range(depth)
            ]
        )
    ).alias("__cms_slot")
    # a unique id disambiguates duplicate probe rows in the regroup; it
    # rides INSIDE the carried struct so one groupBy restores the frame
    probed = probes.withColumn("__cms_rid", F.monotonically_increasing_id())
    cells = counters.select(
        (
            F.col("row_idx").cast("long") * F.lit(width) + F.col("col_idx")
        ).alias("__cms_slot"),
        F.col("cnt").alias("__cms_cnt"),
    )
    est = F.min(F.coalesce(F.col("__cms_cnt"), F.lit(0).cast("long"))).alias(
        out_col
    )
    if not _contains_map_type(probes.schema):
        exploded = probed.select(F.struct("*").alias("__cms_row"), slot)
        return (
            exploded.join(cells, on="__cms_slot", how="left")
            .groupBy("__cms_row")
            .agg(est)
            .select("__cms_row.*", out_col)
            .drop("__cms_rid")
        )
    # map-typed probe columns cannot ride a grouping STRUCT (Spark forbids
    # grouping by MapType) — but they may ride an AGGREGATE: group on the
    # id alone and carry the row as first(struct). Single consumption of
    # `probed` (ADVICE r8: the earlier self-join re-evaluated the
    # nondeterministic monotonically_increasing_id per branch, so a
    # nondeterministic upstream could mispair estimates with probe rows),
    # and one exchange fewer than the join-back shape.
    return (
        probed.select(F.struct("*").alias("__cms_row"), "__cms_rid", slot)
        .join(cells, on="__cms_slot", how="left")
        .groupBy("__cms_rid")
        .agg(F.first("__cms_row").alias("__cms_row"), est)
        .select("__cms_row.*", out_col)
        .drop("__cms_rid")
    )


def _contains_map_type(dt) -> bool:
    """True if a (possibly nested) Spark type contains a MapType."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map_type(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map_type(f.dataType) for f in dt.fields)
    return False


def cms_partials_sink(
    out_dir: str,
    key_col: str,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    hash_fn: str = "xxhash64",
    weight_col: str | None = None,
):
    """foreachBatch sink: one sparse counter-table partial per micro-batch,
    landed in its own ``batch_id=`` partition (dynamic partition overwrite —
    a replayed batch REPLACES its partition byte-identically, which is what
    makes the non-idempotent sum-merge safe). ``cms_merge_read`` reconstructs
    the lifetime sketch; equals the one-shot batch build bit-for-bit."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = cms_counters(batch_df, key_col, width, depth, hash_fn, weight_col)
        write_batch_partition(partials, out_dir, batch_id)

    return write


def cms_merge_read(spark, out_dir: str) -> DataFrame:
    """Sum-merge every persisted partial into the lifetime sketch."""
    all_parts = spark.read.parquet(out_dir)
    return all_parts.groupBy("row_idx", "col_idx").agg(F.sum("cnt").alias("cnt"))
