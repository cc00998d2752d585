"""Generic as-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right)`` attaches, to every left row, the latest right row
of the same key with ``right.ts <= left.ts`` (direction="backward"; ties go
to the right row). The classic implementations are a range join (O(n·m) worst
case, nested loop) or per-key sorted merge; the scalable Spark form used here
is **union + window**:

    union(left tagged 1, right tagged 0)
      → window per key ordered by (ts, tag): last(value, ignorenulls=True)
      → keep left rows

One shuffle on the key, one in-partition sort — O(n log n) per key, linear in
executors at 100 TB, and Catalyst handles skewed keys via AQE like any other
window. (This generalizes ``j4_asof_last_event``, which is the same pattern
within one table.)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _colq(name: str) -> F.Column:
    """Backtick-quoted column reference: names with dots resolve literally
    (F.col / string selects parse dots as nested-field paths)."""
    return F.col("`" + name.replace("`", "``") + "`")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: latest right row with ``right_ts <= left_ts`` per key.

    ``value_cols`` — right columns to attach (default: all but key+ts); they
    arrive suffixed. Right rows with no later left row simply never surface;
    left rows with no prior right row get NULLs (left-join semantics).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {by, right_ts}]
    out_cols = [f"{c}{suffix}" for c in value_cols]

    # the matched right row travels as ONE struct so every attached field
    # comes from the SAME row — per-column last(..., ignorenulls=True) would
    # back-fill a NULL field of the matched row from an older right row,
    # stitching together a row that never existed (true as-of semantics
    # attach one whole row, NULL fields included)
    row_struct = F.struct(*[_colq(c) for c in value_cols])
    struct_type = right.select(row_struct.alias("__rrow")).schema["__rrow"].dataType

    l_tagged = (
        left.withColumn("__ats", F.col(left_ts))
        .withColumn("__src", F.lit(1))
        .withColumn("__rrow", F.lit(None).cast(struct_type))
    )
    r_tagged = right.select(
        F.col(by),
        F.col(right_ts).alias("__ats"),
        row_struct.alias("__rrow"),
    ).withColumn("__src", F.lit(0))
    for c in left.columns:
        if c != by:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tagged.unionByName(r_tagged)
    # right rows (__src=0) sort before left rows at equal ts → a right row at
    # exactly left_ts is visible to that left row (ties-backward convention)
    w = (
        Window.partitionBy(by)
        .orderBy("__ats", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[_colq(c) for c in left.columns],
        "__src",
        F.last("__rrow", ignorenulls=True).over(w).alias("__rrow"),
    )
    return (
        filled.filter(F.col("__src") == 1)
        .select(
            *[_colq(c) for c in left.columns],
            # getField (not a parsed "__rrow.c" path) so value columns whose
            # names contain dots resolve literally
            *[F.col("__rrow").getField(c).alias(oc) for c, oc in zip(value_cols, out_cols)],
        )
    )
