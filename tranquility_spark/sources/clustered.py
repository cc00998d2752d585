"""Range-clustered file layout: min/max-pruned dimension-range reads (r14).

Druid's secondary partitioning (``partitionsSpec: single_dim`` / ``range``,
public Druid docs; reference ``server/.../SingleDimensionPartitionsSpec``
[recall]) splits each time chunk's segments on a DIMENSION range so queries
filtering on that dimension touch only the segments whose range overlaps.
The Spark-first analog needs no segment metadata server: write the corpus
``repartitionByRange(n, col).sortWithinPartitions(col)`` and every parquet
file (and every row group inside it) carries tight, near-disjoint min/max
statistics for ``col`` in its footer. A pushed range predicate then skips
whole files' row groups at scan time — Catalyst shows the filter under
``PushedFilters`` and the parquet reader drops non-overlapping row groups
before decoding a single page.

This is the third served-layout lever, complementing the other two:

- ``sources/bucketed.py`` — HASH layout: co-located equi-joins (no pruning);
- ``sources/spatial.py`` — DIRECTORY partitioning: the planner prunes whole
  partitions from the file listing (coarse, needs a small value domain);
- this module — RANGE clustering: file/row-group skipping via footer stats
  (fine-grained, works for high-cardinality numeric/time dimensions where
  directory-per-value would explode the namespace).

Scale: at 100 TB, directory partitioning on a high-cardinality key is not
viable (millions of dirs), but range clustering costs one shuffle at ingest
and bounds a selective range scan to ``selectivity x corpus + footers``.
Footers are O(files) small reads; choose ``n_files`` so files land in the
128 MB-1 GB guidance (the dd19 bucket-sizing lesson, SCALE.md r13). The
skip happens at ROW-GROUP granularity, so it degrades gracefully: an
unsorted layout still reads everything, a clustered one reads only the
overlapping groups. The measured verdict (SCALE.md r14) is nuanced and
recorded honestly: bytes-touched drops to the overlap fraction (2.4% at
1% selectivity, footer-audited) and sorted runs compress 43% smaller —
but on a cache-warm single box wall-clock does NOT improve, because the
filtered vectorized read already costs ~proportional to matching rows
and the hot region concentrates onto few tasks. The layout pays off
where IO is cold and parallelism is wide — i.e., exactly the 100 TB
object-store regime it exists for, and not the local fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_clustered(
    df: DataFrame,
    path: str,
    cols: list[str] | str,
    n_files: int = 8,
    row_group_bytes: int | None = None,
) -> None:
    """Write ``df`` range-clustered on ``cols``: each output file covers a
    narrow, near-disjoint slice of the leading column's domain, and rows
    inside a file are sorted, so every row group's footer min/max is tight.

    ``repartitionByRange`` samples the data to pick boundary values — the
    LAYOUT (which rows share a file) may vary across Spark versions, but
    the row CONTENT never does, and readers rely only on the footer stats
    actually written, so no reader ever depends on boundary placement.
    NULLs in the leading column sort into the first partition; a range
    predicate can never match them (SQL three-valued logic), and the
    parquet reader's null-count stats keep the skip sound.

    ``row_group_bytes`` (``parquet.block.size``) is both the skip unit
    and the intra-file parallelism unit. Range clustering CONCENTRATES a
    query's matching rows into few files; with the 128 MB default one hot
    file is one row group is ONE task, so a selective query's post-filter
    work serializes onto a single core while the rest idle (measured
    0.7x — SLOWER than unsorted — at 100M rows, SCALE.md r14). Size it
    near the reader's ``spark.sql.files.maxPartitionBytes`` so the hot
    region stays splittable. Note the honest scale verdict (SCALE.md
    r14): on cache-resident fixtures the layout does NOT win wall-clock —
    its measured wins are structural (2.4% vs 100% of rows touched at 1%
    selectivity; 43% better compression from sorted runs), which turn
    into wall-clock only where the skipped bytes are genuinely cold
    (object storage) and the hot region spans many splits.
    """
    if isinstance(cols, str):
        cols = [cols]
    writer = (
        df.repartitionByRange(n_files, *[F.col(c) for c in cols])
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
    )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)


def read_range_clustered(
    spark: SparkSession,
    path: str,
    predicate: Column,
) -> DataFrame:
    """Read a :func:`write_range_clustered` layout under ``predicate``.

    Deliberately thin: the whole point of the layout is that a plain
    declarative filter IS the pruned read — Catalyst pushes the range
    predicate into the parquet scan (``PushedFilters`` in the plan,
    plan-asserted in tests) and the reader skips row groups whose footer
    stats can't satisfy it. No bookkeeping sidecar, no manifest — the
    statistics live in the files themselves, so the layout stays correct
    under partial rewrites/compaction as long as writers go through
    :func:`write_range_clustered`.
    """
    return spark.read.parquet(path).filter(predicate)


def range_stats(path: str, col: str) -> list[tuple[str, object, object, int]]:
    """Footer-stats inventory for the layout: one row per parquet file —
    ``(file, min, max, null_count)`` for ``col``, aggregated over the
    file's row groups. Driver-side, reads ONLY footers (O(files) kilobyte
    reads — the same metadata the scan consults), so it is safe to call
    on a huge layout. Used by tests to prove skip-ability structurally
    (near-disjoint tight ranges) instead of relying on wall-clock, and
    usable as an ops probe ("how many files would this range touch?")."""
    import os

    import pyarrow.parquet as pq

    out: list[tuple[str, object, object, int]] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        mn = mx = None
        nulls = 0
        unbounded = False
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            st = grp.column(idx).statistics
            if st is not None and not st.has_min_max and (
                st.null_count == grp.num_rows
            ):
                # an ALL-NULL row group writes no min/max by design — it is
                # skippable for ANY range predicate (NULL never matches),
                # so it contributes nulls but does not unbound the file
                nulls += st.null_count
                continue
            if st is None or not st.has_min_max:
                # a populated group with no stats can never be skipped —
                # record the FILE as an unbounded range (null_count -1) so
                # callers see the pruning loss; keep inventorying the rest
                unbounded = True
                break
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
            nulls += st.null_count or 0
        out.append((name, None, None, -1) if unbounded else (name, mn, mx, nulls))
    return out


def files_overlapping(
    stats: list[tuple[str, object, object, int]],
    lo: object,
    hi: object,
) -> list[str]:
    """Which files of a :func:`range_stats` inventory could contain rows
    with ``lo <= col < hi``? Mirrors the reader's row-group test
    (overlap of [min, max] with the predicate range) so tests can assert
    "this query touches k of n files" from metadata alone.

    A file reported unbounded (``null_count == -1`` — some populated row
    group carries no stats) must be included: the reader cannot skip it.
    A file whose min/max are None with a real null count is ALL NULL —
    no range predicate can match it, so it is excluded, same as the
    reader would."""
    out = []
    for f, mn, mx, nulls in stats:
        if nulls == -1:
            out.append(f)  # unbounded — unskippable
        elif mn is None:
            continue  # all-NULL file — unmatchable by any range
        elif not (mx < lo or mn >= hi):  # type: ignore[operator]
            out.append(f)
    return out
