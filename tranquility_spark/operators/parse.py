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


def parse_jsonl_file(
    spark,
    path: str,
    schema: str,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """JSON-Lines FILE parse — the LLM corpus interchange format (P1's file
    sibling, as p9 is for CSV): one JSON object per line, read with the
    splittable text source (one task per 128 MB split, never per file — the
    property that parallelizes a 100 TB JSONL backfill), parsed with ONE
    ``from_json`` per line carrying Spark's corrupt-record column.

    Returns one row per input line: ``line`` (the raw bytes — audit trail),
    ``is_valid`` (0/1 long), and the typed fields of ``schema`` (a DDL
    string), NULLED when the record is invalid so downstream never reads a
    half-parsed record.

    Validity contract (PERMISSIVE + columnNameOfCorruptRecord, pinned in
    tests): a line is valid iff it parses as a JSON OBJECT and every
    PRESENT field converts to its declared type. Structurally-broken lines,
    valid-but-non-object JSON (``42``, arrays, ``"str"``, ``null``) and
    type-mismatched records (``{"doc_id":"abc"}`` against ``doc_id long``
    — including lossy ones like 7.9) are ALL record-level invalid; a
    missing or ``null`` field is just a NULL column. This is stricter than
    per-field try_cast semantics: Spark corrupts the RECORD on a field
    type error — the contract a typed ingest wants.
    """
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    full = f"{schema}, {corrupt_col} string"
    parsed = lines.select(
        "line",
        F.from_json(
            "line", full, {"columnNameOfCorruptRecord": corrupt_col}
        ).alias("__p"),
    )
    # blank/whitespace-only lines: from_json treats them as a silent null
    # record WITHOUT setting the corrupt column (found by test — Jackson
    # yields no token, no error), which would verdict them "valid object"
    # against any JSON definition. Explicitly invalid instead.
    valid = F.col(f"__p.{corrupt_col}").isNull() & (F.trim("line") != "")
    field_names = [
        f for f in parsed.select("__p.*").columns if f != corrupt_col
    ]
    return parsed.select(
        "line",
        valid.cast("long").alias("is_valid"),
        *[F.when(valid, F.col(f"__p.{f}")).alias(f) for f in field_names],
    )


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
