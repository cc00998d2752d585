"""Spatial cell layout: partition-pruned spatialFilter reads (r13).

The r12 spatial surface gave the pieces — ``specs.spatial_cell_column``
(the coarse geo-cell partition column) and ``specs.spatial_cells_for_bound``
(the covering IN-list that turns a spatialFilter into partition pruning,
reference ``processing/.../filter/SpatialFilter`` [recall] over Druid's
spatial index) — and tests/SCALE.md proved the plan shape and the
wall-clock payoff. This module makes the layout a first-class served path,
the dd19/sim3b pattern applied to geography:

- :func:`write_spatial_layout` — one-time write of the corpus partitioned
  by the cell of its "lat,lon" spatial dimension;
- :func:`read_spatial_filtered` — every subsequent spatialFilter read
  prunes to the covering cells (``PartitionFilters`` IN-list — only
  matching directories are listed/scanned) and applies the exact
  row-level predicate inside them. The covering list is a superset, so
  pruned ≡ unpruned row-for-row (the covering property, test-asserted).

Scale: at 100 TB the covering IN-list bounds the BYTES READ to the bound's
geographic footprint (measured 2.3× wall-clock at 100M rows for a 21%
covering, converging to the partition ratio as the scan dominates —
SCALE.md r13); choose ``cell_deg`` so cells land in the 128 MB–1 GB file
guidance, exactly like bucket counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tranquility_spark.specs import (
    CoveringTooWide,
    filter_to_column,
    spatial_cell_column,
    spatial_cells_for_bound,
)


def write_spatial_layout(
    df: DataFrame,
    path: str,
    dim: str = "coords",
    cell_deg: float = 30.0,
    n_dims: int = 2,
) -> None:
    """Write ``df`` partitioned by the geo cell of its spatial dimension.

    The cell column is derived, written as the partition directory, and
    dropped on read (Spark restores it from the path); rows with ANY
    malformed/NULL coordinate get a NULL cell id (spatial_cell_column's
    r13 guard) and land in the ``cell=__HIVE_DEFAULT_PARTITION__``
    directory — still visible to unpruned reads, never selected by a
    covering IN-list, never passed by a row-level bound (a NULL
    coordinate can't satisfy one), and sweepable as a quarantine
    partition (asserted in tests).

    The grid parameters (``cell_deg``, ``n_dims``) are recorded in a
    ``_spatial_meta.json`` sidecar next to the files (r14 code-review:
    they used to live only in the caller's head — a read on a different
    grid computes covering ids that match NO directory and silently
    prunes everything; dq20 worked around it by digest-pinning the grid
    into the location, but the guard belongs in this module)."""
    import json
    import os

    if "cell" in df.columns:
        # loud, not silent: the derived partition column would replace the
        # corpus's own 'cell' values and the originals would be gone from
        # the data files after the round trip (r14 code-review)
        raise ValueError(
            "df already has a 'cell' column — rename it before writing a "
            "spatial layout (the layout derives its own 'cell' partition)"
        )
    (
        df.withColumn("cell", spatial_cell_column(dim, cell_deg, n_dims))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    meta = os.path.join(path, "_spatial_meta.json")
    tmp = f"{meta}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"cell_deg": cell_deg, "n_dims": n_dims, "dim": dim}, fh)
    os.replace(tmp, meta)


def read_spatial_filtered(
    spark: SparkSession,
    path: str,
    spec: dict,
    cell_deg: float = 30.0,
    max_cells: int = 100_000,
) -> DataFrame:
    """Partition-pruned spatialFilter read over a
    :func:`write_spatial_layout` layout: covering-cell IN-list (pruning,
    driver-side arithmetic over the bound's constants) AND the exact
    row-level predicate (correctness). Returns exactly the rows the
    unpruned ``filter_to_column(spec)`` read would — the covering property
    — while scanning only the bound's cells.

    The read stays TOTAL — same rows as the unpruned filter, at worst a
    full scan — in every case where pruning is impossible or unsound
    (r13 found the first; r14's code-review the rest):

    - covering wider than ``max_cells`` (an IN-list that wide prunes
      nothing and bloats the plan);
    - a compound/filter spec with no top-level ``bound`` (e.g. an
      and/or wrapper — ``filter_to_column`` compiles it fine, but there
      is no single bound to cover);
    - bound dimensionality != the layout's recorded ``n_dims`` (a 2-D
      bound's covering ids like ``a_b`` match no 3-D ``a_b_c``
      directory — the IN-list would prune EVERYTHING);
    - an empty covering from a degenerate bound (e.g. negative radius:
      the row predicate d² <= r² still matches rows, the empty IN-list
      would not).

    Grid parameters come from the layout's ``_spatial_meta.json``
    sidecar when present (the files are the truth); the ``cell_deg``
    argument is the fallback for pre-r14 layouts without one."""
    import json
    import os

    # mergeSchema + basePath (ADVICE r14: the r14 hardening silently
    # dropped them from the r13 code): partitions of an evolved layout can
    # carry different schemas — a single-file-schema read would silently
    # drop columns present only in some cells, diverging from the
    # mergeSchema read contract the sink module documents. basePath keeps
    # the cell partition column discovered even when a future caller
    # passes a partition subdirectory.
    base = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(path)
    )
    pred = filter_to_column(spec)
    n_dims = None
    meta_path = os.path.join(path, "_spatial_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as fh:
            meta = json.load(fh)
        cell_deg = meta["cell_deg"]
        n_dims = meta["n_dims"]
    bound = spec.get("bound")
    if bound is None:
        return base.filter(pred)  # compound spec — nothing to cover
    coords = bound.get("coords") or bound.get("minCoords") or []
    max_coords = bound.get("maxCoords")
    well_formed = max_coords is None or len(max_coords) == len(coords)
    if well_formed and n_dims is not None and len(coords) != n_dims:
        # a VALID bound of different dimensionality than the layout grid:
        # its covering ids could never match the layout's directories, so
        # pruning would drop every row — scan instead (covering property)
        return base.filter(pred)
    try:
        cells = spatial_cells_for_bound(bound, cell_deg, max_cells)
    except CoveringTooWide:
        return base.filter(pred)  # covering too wide to help — scan
    # (genuine spec errors — INTERNALLY mismatched min/max dims, bad
    # bound type — propagate from the enumeration above)
    if not cells:
        return base.filter(pred)  # degenerate bound — empty IN-list
    return base.filter(F.col("cell").isin(cells) & pred)
