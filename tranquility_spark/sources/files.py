"""Batch file sources for the driver's testdata tables.

The reference has no scan/read path at all (it is ingestion-only —
SURVEY.md §1.1); reading Parquet into DataFrames is our engine's native
source. Column pruning + predicate pushdown reach the parquet scan for free
via Catalyst, so callers should ``select``/``filter`` as early as possible and
let the optimizer do the rest.
"""

from __future__ import annotations

import os
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tranquility_spark.session import prepare

# Per-session cache of table *definitions* (logical plans, not data). Each
# spark.read.parquet costs ~0.1 s of driver-side work (file listing + footer
# schema read over py4j) — a fixed tax on EVERY catalog query that dominates
# sub-second entries (ADJUDICATION r07: emb3's 0.44 s was 0.12 s load + 0.30 s
# compute). The testdata tables are immutable for the life of a session, and
# a DataFrame is an immutable plan, so reuse is safe; keying the outer map
# weakly on the session means a stopped session's plans are dropped with it
# rather than leaking (or worse, being served to a new session).
_DEFS: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    WeakKeyDictionary()
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types.

    ``events.ts`` has been regenerated across rounds as parquet
    TIMESTAMP(NANOS) *and* as timestamp[us]-no-tz, so normalize BOTH here
    (one place — catalog entries always see TimestampType):

    - TIMESTAMP(NANOS): Spark reads it (under ``legacy.parquet.nanosAsLong``)
      as LongType nanos; integer-divide to micros (``div`` — float division
      of an int64 epoch-nanos value loses precision above 2^53).
    - timestamp[us] without tz: Spark 4 reads it as TIMESTAMP_NTZ, which
      rejects ``cast(ts as long)`` and diverges from DuckDB's naive read
      unless re-interpreted in the (UTC-pinned) session zone. Cast to
      TimestampType — with session tz UTC this is value-identical to the
      oracle's naive interpretation.
    """
    prepare(spark)  # unconditional — callers rely on the UTC-reset side effect
    key = (os.path.abspath(sf_dir), name)
    per_session = _DEFS.setdefault(spark, {})
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif ts_type == "string":
            # not yet observed in a regeneration, but cheap insurance:
            # ISO-8601 strings parse under the UTC session zone (try_ —
            # ANSI mode would otherwise fail the whole scan on one bad row)
            df = df.withColumn("ts", F.expr("try_to_timestamp(ts)"))
    per_session[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# CSV/TSV event-file ingestion (P1 sibling — the reference's server accepts
# only JSON/Smile, so delimited files are an extension, not parity; VERDICT
# r06 #5). The schema mirrors the events table plus a free-text note column
# that exercises the delimiter/quote edge cases.
CSV_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, note string"
)


def load_csv_events(spark: SparkSession, path: str, sep: str = ",") -> DataFrame:
    """Parse a delimited event file with an EXPLICIT schema.

    Scale notes: (a) schema is always explicit — inference costs a full
    extra pass over 100 TB and can mistype sparse columns; (b) no
    ``multiLine`` — embedded newlines would make the scan non-splittable
    (one task per FILE instead of per 128 MB split), so the ingest contract
    forbids them; (c) CSV mode uses RFC-4180 doubled-quote escaping
    (``quote='"', escape='"'`` — Spark's backslash default disagrees with
    every warehouse's writer, DuckDB included); (d) TSV mode disables
    quoting entirely (empty quote char): tabs are forbidden IN fields,
    quotes/commas are ordinary characters — the classic log-pipeline
    contract. Empty unquoted fields parse as NULL in both engines.
    """
    prepare(spark)
    reader = (
        spark.read.schema(CSV_EVENTS_SCHEMA)
        .option("header", True)
        .option("sep", sep)
    )
    if sep == ",":
        reader = reader.option("quote", '"').option("escape", '"')
    else:
        reader = reader.option("quote", "")  # empty string disables quoting
    return reader.csv(path)
