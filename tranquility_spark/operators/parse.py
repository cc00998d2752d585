"""Event parsing (P1) — JSON bytes/strings → typed columns.

Reference: ``server/.../TranquilityServlet.scala`` (JSON POST bodies →
``Seq[Map[String, Any]]``) and ``kafka/.../writer/TranquilityEventWriter.scala``
(malformed events → drop, or raise when ``reportDropsAsExceptions`` is set).

Spark mapping: ``from_json`` with an explicit schema. PERMISSIVE mode yields
NULL for malformed input, which we either drop (Druid behavior) or surface in
a ``_corrupt_record``-style column. All JVM-side — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_events(
    df: DataFrame,
    json_col: str,
    schema: str,
    drop_malformed: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Parse a JSON-string column into typed fields (struct exploded to columns).

    ``schema`` is a DDL string, e.g. ``"k INT, tag STRING"``.
    ``drop_malformed=True`` mirrors Druid's drop-on-unparseable default;
    otherwise malformed rows keep NULL fields and the raw text lands in
    ``corrupt_col`` (reportDropsAsExceptions analog: caller can count/raise).
    """
    # from_json PERMISSIVE yields a struct of NULL fields for malformed input,
    # so malformed-ness is detected separately: does the text parse as JSON at all?
    valid = F.get_json_object(F.col(json_col), "$").isNotNull()
    parsed = df.withColumn("__parsed", F.from_json(F.col(json_col), schema))
    if drop_malformed:
        parsed = parsed.filter(valid)
    else:
        parsed = parsed.withColumn(corrupt_col, F.when(~valid, F.col(json_col)))
    out = parsed.select(
        *[c for c in df.columns],
        F.col("__parsed.*"),
        *([corrupt_col] if not drop_malformed else []),
    )
    return out


def flatten_json(
    df: DataFrame,
    json_col: str,
    fields: list[tuple[str, str, str]],
    keep: list[str] | None = None,
) -> DataFrame:
    """flattenSpec: project nested JSON paths to top-level typed columns.

    Reference: the daemon config path accepts a Druid ``flattenSpec`` in
    ``parseSpec`` (SURVEY.md §1.3, nested input JSON) with fields of
    ``{type: "path", name, expr: "$.a.b"}``. Spark mapping:
    ``get_json_object(col, path)`` per field + cast — each field is one
    JVM-side expression; no full-document parse, no Python.

    ``fields`` entries are ``(name, json_path, spark_type)``.
    """
    cols = [F.col(c) for c in (keep if keep is not None else df.columns)]
    for name, path, typ in fields:
        cols.append(F.get_json_object(F.col(json_col), path).cast(typ).alias(name))
    return df.select(*cols)
