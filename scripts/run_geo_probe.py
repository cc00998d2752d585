"""Spatial-layout pruning probe (r13, VERDICT r12 #5): measure what the
geo-cell-partitioned layout actually buys at scale — the dq19 plan-level
pruning assertion (PartitionFilters INSET, tests/test_specs.py) shown as
wall-clock at a decade the fixture can't fake.

For each events fixture given, this writes the cell-partitioned layout once
(partitionBy on the 30-degree geo cell of the encoded "lat,lon" dimension),
then times the SAME rectangular spatialFilter aggregate two ways over the
SAME files:

- pruned:   covering-cell IN-list (specs.spatial_cells_for_bound) AND the
            exact row predicate -> partition-pruned scan
- unpruned: the exact row predicate alone -> full scan

Results are recorded in SCALE.md — measurement script, not bench (anchors
stay frozen). Timing is the r12 noop-sink materialization, min-of-3.

Usage: python3 scripts/run_geo_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/spark_graft_sf1)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LAYOUT_ROOT = "/tmp/spark_graft_geo"
CELL_DEG = 30.0


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tranquility_spark.catalog import _DQ19_RECT
    from tranquility_spark.sources.files import load_table
    from tranquility_spark.sources.spatial import (
        read_spatial_filtered,
        write_spatial_layout,
    )
    from tranquility_spark.specs import DimensionsSpec, filter_to_column

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    rows = []
    for sf_dir in dirs:
        layout = os.path.join(LAYOUT_ROOT, os.path.basename(sf_dir.rstrip("/")))
        if not os.path.exists(os.path.join(layout, "_SUCCESS")):
            ev = load_table(spark, sf_dir, "events")
            pts = ev.select(
                "event_type",
                ((F.col("user_id") % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
                ((F.col("event_id") % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
            )
            dspec = DimensionsSpec(
                dimensions=["event_type", "coords"],
                spatial_dimensions=[("coords", ("lat", "lon"))],
            )
            for name, expr in dspec.spatial_columns():
                pts = pts.withColumn(name, expr)
            # the SHIPPED write path (sources/spatial.py), so the probe
            # measures exactly the plan dq20 serves (r13 self-review: an
            # inline copy here could silently drift from the real path)
            write_spatial_layout(
                pts.select("event_type", "coords"), layout, cell_deg=CELL_DEG
            )
        base = spark.read.option("basePath", layout).parquet(layout)
        pred = filter_to_column(_DQ19_RECT)
        agg = lambda df: df.groupBy("event_type").agg(  # noqa: E731
            F.count(F.lit(1)).alias("n_in_rect")
        )
        pruned = best_of(
            agg(read_spatial_filtered(spark, layout, _DQ19_RECT, cell_deg=CELL_DEG))
        )
        unpruned = best_of(agg(base.filter(pred)))
        from tranquility_spark.specs import spatial_cells_for_bound

        cells = spatial_cells_for_bound(_DQ19_RECT["bound"], CELL_DEG)
        n_cells = len([d for d in os.listdir(layout) if d.startswith("cell=")])
        rows.append(
            {
                "sf_dir": sf_dir,
                "pruned_s": round(pruned, 3),
                "unpruned_s": round(unpruned, 3),
                "speedup": round(unpruned / pruned, 2),
                "covering_cells": len(cells),
                "layout_cells": n_cells,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"geo_probe": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
