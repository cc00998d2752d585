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
    partition (asserted in tests)."""
    (
        df.withColumn("cell", spatial_cell_column(dim, cell_deg, n_dims))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


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

    A bound whose covering exceeds ``max_cells`` (near-full-extent over a
    fine grid — an IN-list that wide prunes nothing and bloats the plan)
    falls back to the UNPRUNED filter: same rows, full scan — the read
    API stays total where the raw enumeration
    (:func:`tranquility_spark.specs.spatial_cells_for_bound`) fails loudly
    (r13 code-review find: the guard alone turned previously-working
    wide-bound reads into hard failures with no remedy in this API)."""
    base = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(path)
    )
    pred = filter_to_column(spec)
    try:
        cells = spatial_cells_for_bound(spec["bound"], cell_deg, max_cells)
    except CoveringTooWide:
        return base.filter(pred)  # covering too wide to help — scan
    # (genuine spec errors — mismatched dims, bad bound type — propagate)
    return base.filter(F.col("cell").isin(cells) & pred)
