"""Ingest-time rollup: the heart of the reference engine (SURVEY.md §2.4).

The operator: GROUP BY (queryGranularity-truncated timestamp, all dimensions)
→ apply every aggregator in metricsSpec. With rollup=false, events append
un-aggregated (projection only). Reference: ``core/.../druid/DruidRollup.scala``
+ metricsSpec parsing in ``core/.../druid/DruidBeams.scala#fromConfig``.

Spark-first execution notes (100 TB):
- ``groupBy().agg()`` compiles to HashAggregateExec with a partial (map-side)
  phase before the shuffle — this IS the reference's rollup-aware partitioner
  (``GenericTimeAndDimsPartitioner``, SURVEY.md §2.5 D2) done by Catalyst: the
  shuffle key is exactly (truncated ts, dims), and partial aggregation means
  each rollup group crosses the wire once per upstream partition, already
  collapsed.
- The same function works on a static DataFrame and a Structured Streaming
  DataFrame (streaming wraps it with a watermark — see
  ``tranquility_spark.streaming.pipeline``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tranquility_spark.specs import IngestSpec


def build_rollup(spec: IngestSpec) -> Callable[[DataFrame], DataFrame]:
    """Compile an IngestSpec into a pure DataFrame→DataFrame transform.

    Output schema: ``ts TIMESTAMP, <dims...>, <metric outputs...>`` where
    ``ts`` is the queryGranularity-truncated event timestamp.
    """
    spec.validate()

    def transform(df: DataFrame) -> DataFrame:
        ts_out = spec.timestamp_spec.output
        ts = spec.timestamp_spec.extract(df)
        # Druid drops rows whose timestamp is missing/unparseable (P3)
        parsed = df.withColumn(ts_out, ts).filter(F.col(ts_out).isNotNull())
        # derived spatial dims: "lat,lon" string encoding (Druid convention)
        for name, expr in spec.dimensions_spec.spatial_columns():
            parsed = parsed.withColumn(name, expr)

        metric_fields = sorted({f for m in spec.metrics for f in m.field_names})
        dims = spec.dimensions_spec.resolve(df, spec.timestamp_spec.column, metric_fields)

        gran = spec.granularity_spec
        if not gran.rollup:
            # A12: rollup=false — append raw projected rows
            keep = [ts_out, *dims, *metric_fields]
            return parsed.select(*keep)

        bucketed = parsed.withColumn(ts_out, gran.query_granularity.truncate(F.col(ts_out)))
        aggs = [m.column() for m in spec.metrics]
        if not aggs:
            # metric-less rollup: rows collapse to distinct rollup keys
            # (Druid with an empty metricsSpec still rolls duplicate keys up)
            return bucketed.select(ts_out, *dims).dropDuplicates()
        return bucketed.groupBy(ts_out, *dims).agg(*aggs)

    return transform


def rollup_oracle_sql(spec: IngestSpec, table: str, ts_expr: str | None = None) -> str:
    """Render the DuckDB oracle SQL for the same rollup.

    ``ts_expr`` overrides how the timestamp column is read (e.g. the driver's
    events view exposes a native TIMESTAMP while the spec might parse a
    string). Only SQL-checkable aggregators may appear (A6/A7 approx twins are
    rows-only — SURVEY.md §2.4 policy).
    """
    spec.validate()
    gran = spec.granularity_spec
    ts_out = spec.timestamp_spec.output
    src = ts_expr or spec.timestamp_spec.column

    if spec.dimensions_spec.dimensions is None:
        raise ValueError("oracle for schemaless dims: resolve dimensions explicitly first")
    dims = list(spec.dimensions_spec.dimensions)

    if not gran.rollup:
        metric_fields = sorted({f for m in spec.metrics for f in m.field_names})
        cols = ", ".join([f"{src} AS {ts_out}", *dims, *metric_fields])
        return f"SELECT {cols} FROM {table}"

    bucket = gran.query_granularity.truncate_sql(src)
    for m in spec.metrics:
        if not m.sql_checkable:
            raise ValueError(f"aggregator {m.name} is not SQL-checkable (approx twin)")
    aggs = ", ".join(m.oracle() for m in spec.metrics)
    group_cols = ", ".join([f"{bucket} AS {ts_out}", *dims])
    group_by = ", ".join(["1", *[str(i + 2) for i in range(len(dims))]])
    return f"SELECT {group_cols}, {aggs} FROM {table} GROUP BY {group_by}"
