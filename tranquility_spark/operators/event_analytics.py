"""Event-analytics shapes (retention cohorts, ordered funnels) as
frame-level operators.

These are the signature Druid queries over the datasource tranquility
feeds (SURVEY.md §2 dq8/dq9). Factored out of the catalog so the batch
entries and the streaming-lifecycle twins (tests/test_streaming.py) run
the IDENTICAL code path over whatever events frame they hold — a table
scan, a merged partials read, or a rate-source synthesis.

Input contract: an events frame with ``user_id`` (long), ``ts``
(timestamp) and — for the funnel — ``event_type`` (string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_cohorts(ev: DataFrame) -> DataFrame:
    """(cohort_day, day_offset, n_users) retention cells.

    Plan: one (user, day) distinct (the only corpus-sized shuffle), then
    the per-user first-seen day as a WINDOW MIN over that same frame — one
    consumption, one user_id-partitioned window, no join back (the
    previous agg+join shape re-executed the whole distinct subtree for
    the first-seen side; the hh1 adjudication lesson, applied r8). Final
    agg is bounded by days^2 cells. The per-user min day is MIN-MERGEABLE,
    so a streaming pipeline can land per-batch first-seen partials and
    merge at read (the partials test asserts equality).
    """
    from pyspark.sql import Window

    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    return (
        act.withColumn("cohort_day", F.min("day").over(w))
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


def funnel_counts(ev: DataFrame) -> DataFrame:
    """One-row (n_viewed, n_clicked_after_view, n_purchased_after_click).

    Ordered-sequence funnel: each stage is a per-user min-timestamp agg
    joined to the previous stage's anchor with an ordering predicate. All
    three stage frames are per-user (bounded by |users|, not |events|) and
    every join is keyed on user_id — co-partitioned at scale, each stage's
    scan pre-filtered to its type. Unlike retention's first-seen, the
    staged mins are NOT independently mergeable (t_click depends on
    t_view), so the streaming twin lands per-batch DISTINCT
    (user, event_type, ts) triples and runs this operator over the merged
    log — dedup is the mergeable reduction, the funnel runs at read.
    """
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_viewed"),
            F.count("t_click").alias("n_clicked_after_view"),
            F.count("t_purchase").alias("n_purchased_after_click"),
        )
    )
