"""Mergeable Misra–Gries heavy-hitters summaries (the SpaceSaving twin of
txt10's exact top-K).

txt10 computes exact token frequencies with a full groupBy — fine when the
token shuffle fits, but at open-web scale the interesting question is "the
top-K with bounded error, touching the raw data once". The classic answer is
a counter-based summary: Misra–Gries / SpaceSaving keep k counters per group
and guarantee, for every item,

    est <= true_count <= est + deduct,      deduct <= N / (k+1)

where N is the stream length — so every item with true frequency above
N/(k+1) is guaranteed present. Crucially the summaries are MERGEABLE with no
loss of the bound (Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
Summaries", PODS 2012): add counters item-wise, then truncate back to k by
subtracting the (k+1)-th largest count.

Spark-first shape (mirrors operators/sketch.py's KMV lifecycle):

- build (``mg_partial``): one exact hash-agg over the partial's raw rows
  (map-side combine — the only pass over raw data), one bounded window to
  rank counters, truncate to k. State per group is a ``map<item, long>`` of
  ≤ k entries plus two longs — kilobytes regardless of partial size.
  Scale contract: the ranking window sorts the PARTIAL's distinct items
  within each group on one reducer, so partials must be sized (per
  day/segment/micro-batch — exactly how the sink emits them) so a single
  partial's per-group vocabulary sorts comfortably; the merged phase then
  never touches more than k·n_partials summary rows however large the
  total stream is.
- merge (``mg_merge``): explode the bounded maps, sum per item, re-truncate.
  Shuffles only summary rows, never raw data. Build per day/segment at
  ingest, answer top-K queries later by merging kilobyte summaries.
- streaming (``hh_partials_sink``): per-micro-batch partials through
  foreachBatch, merged at read time — same lifecycle as the KMV sink.

No Python UDF anywhere; everything is groupBy/window/map expressions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 64


def mg_partial(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-group Misra–Gries summary of ``value_col`` frequencies.

    Returns ``group_cols…, counters map<string,long>, deduct long,
    n_total long`` — counters hold the post-deduction lower-bound counts of
    at most k items; ``est <= true <= est + deduct`` for reported items, and
    any item with true count > deduct is guaranteed reported.
    """
    g = list(group_cols)
    # NULL values contribute nothing (the f6 policy) — without this
    # filter a NULL item that ranks inside the top k would reach
    # map_from_entries and fail at runtime with NULL_MAP_KEY
    # (code-review r8)
    counts = (
        df.select(*g, F.col(value_col).cast("string").alias("__item"))
        .filter(F.col("__item").isNotNull())
        .groupBy(*g, "__item")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    w = Window.partitionBy(*g).orderBy(F.desc("__cnt"), F.col("__item"))
    wg = Window.partitionBy(*g)
    ranked = counts.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__deduct",
        F.max(F.when(F.col("__rn") == k + 1, F.col("__cnt")).otherwise(F.lit(0))).over(wg),
    )
    # ONE aggregation produces counters, deduct and n_total together: a
    # conditional collect_list keeps only surviving counters (collect_list
    # skips the NULLs the `when` leaves for truncated rows) while the
    # deduct/n_total aggregates see the PRE-truncation ranking, so a group
    # whose every counter truncates to zero still carries its deduct (the
    # bound would silently collapse to 0 otherwise). The previous shape —
    # separate kept/totals branches re-joined on the group key — consumed
    # the raw-count subtree twice and paid a join for a frame this single
    # agg produces in one pass (hh1 adjudication, r08).
    lb = F.col("__cnt") - F.col("__deduct")
    return ranked.groupBy(*g).agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col("__rn") <= k) & (lb > 0),
                        F.struct(F.col("__item"), lb.alias("__lb")),
                    )
                )
            )
        ).alias("counters"),
        F.max("__deduct").alias("deduct"),
        F.sum("__cnt").alias("n_total"),
    )


def mg_merge(
    partials: DataFrame,
    group_cols: Sequence[str],
    k: int = DEFAULT_K,
) -> DataFrame:
    """Merge Misra–Gries partials down to ``group_cols`` (same schema out).

    Item-wise counter addition, then one re-truncation to k: deduct grows by
    the (k+1)-th merged count, and the summed bound stays <= N/(k+1) over
    the merged stream (Agarwal et al. 2012, Thm. 1). Only summary rows
    shuffle — the raw data is never revisited.
    """
    g = list(group_cols)
    # posexplode_outer keeps every partial row visible exactly once at
    # __pos 0 (or a single NULL-pos row for an empty counters map), so the
    # per-partial deduct/n_total can ride along the exploded frame instead
    # of a second scan of `partials` — the previous base/summed double
    # consumption re-computed the whole upstream partial-build subtree
    # (hh1 adjudication, r08). NULL-item rows (empty maps) survive the
    # first agg to carry their partial's deduct/n_total; they sort last in
    # the DESC ranking (NULL __cnt), can never displace a real item from
    # the top k+1, and the conditional collect_list drops them.
    first_of_partial = F.col("__pos").isNull() | (F.col("__pos") == 0)
    exploded = partials.select(
        *g,
        "deduct",
        "n_total",
        F.posexplode_outer("counters").alias("__pos", "__item", "__lb"),
    )
    summed = exploded.groupBy(*g, "__item").agg(
        F.sum("__lb").alias("__cnt"),
        F.sum(F.when(first_of_partial, F.col("deduct")).otherwise(0)).alias("__d"),
        F.sum(F.when(first_of_partial, F.col("n_total")).otherwise(0)).alias("__n"),
    )
    w = Window.partitionBy(*g).orderBy(F.desc("__cnt"), F.col("__item"))
    wg = Window.partitionBy(*g)
    ranked = summed.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__dk",
        F.max(F.when(F.col("__rn") == k + 1, F.col("__cnt")).otherwise(F.lit(0))).over(wg),
    )
    lb = F.col("__cnt") - F.col("__dk")
    return ranked.groupBy(*g).agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col("__rn") <= k) & (lb > 0),
                        F.struct(F.col("__item"), lb.alias("__lb")),
                    )
                )
            )
        ).alias("counters"),
        (F.sum("__d") + F.max("__dk")).alias("deduct"),
        F.sum("__n").alias("n_total"),
    )


def mg_topk(summary: DataFrame, group_cols: Sequence[str], topk: int) -> DataFrame:
    """Flatten a summary to ranked rows: ``group_cols…, item, est, err_ub,
    guaranteed`` — est is the lower bound, true count is in
    [est, est + err_ub], and ``guaranteed`` marks items that MUST be in the
    true top (est > deduct means no truncated item can outrank them)."""
    g = list(group_cols)
    rows = summary.select(
        *g, "deduct", "n_total", F.explode("counters").alias("item", "est")
    )
    w = Window.partitionBy(*g).orderBy(F.desc("est"), F.col("item"))
    return (
        rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topk)
        .select(
            *g,
            "item",
            "est",
            F.col("deduct").alias("err_ub"),
            (F.col("est") > F.col("deduct")).alias("guaranteed"),
        )
    )


def hh_partials_sink(
    out_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    k: int = DEFAULT_K,
):
    """foreachBatch sink: one Misra–Gries partial per group per micro-batch;
    ``mg_merge`` at read time answers top-K over the whole stream within the
    N/(k+1) bound. Same idempotence contract as ``sketch_partials_sink``:
    each batch lands in its own ``batch_id=`` partition under dynamic
    partition overwrite, so redelivery replaces rather than duplicates."""
    from tranquility_spark.operators.batch_sink import write_batch_partition

    def write(batch_df: DataFrame, batch_id: int) -> None:
        partials = mg_partial(batch_df, group_cols, value_col, k=k)
        write_batch_partition(partials, out_dir, batch_id)

    return write
