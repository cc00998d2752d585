"""Smile event sources — the reference's OWN wire format (P2), decoded.

Tranquility's server accepted JSON or SMILE bodies and its Kafka path
shipped Smile-serialized events (``core/.../typeclass/ObjectWriter.scala#
SmileObjectWriter`` [recall] — Jackson's binary JSON). Until round 9 the
repo declared P2 absent-by-design and covered the binary slot with the
Avro analog; ``operators/smile_codec.py`` now implements the public Smile
spec subset directly, so this module gives Smile the SAME source surface
as JSON/CSV/JSONL/Avro:

- :func:`load_smile_events` — file of back-to-back Smile records (the
  Jackson event-sequence shape: one header, shared tables across
  records) → typed rows; binaryFile + mapInPandas, parallel per file.
- :func:`parse_smile_column` — a BINARY column of standalone wire
  payloads (tranquility's HTTP/Kafka body shape) with p10's
  corrupt-record accounting (NULL/empty/truncated/bad-token payloads →
  is_valid 0, fields NULL).

Smile is schemaless JSON: fields are picked BY NAME from each decoded
object (missing → NULL, extra → ignored — exactly how the reference's
Jackson mapping behaved), with ``spark_schema`` as the explicit output
contract and integer epoch-micros accepted for timestamp fields (the
convention the fixture writer uses; Smile itself has no timestamp type).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tranquility_spark.session import prepare
from tranquility_spark.sources.avro_source import TS_MICROS_ABS_BOUND, _field_series


def _rows_to_pdf(rows: list, out_schema: StructType, keep_pdf=None, keep=()):
    import pandas as pd

    out = {}
    if keep_pdf is not None:
        for c in keep:
            out[c] = keep_pdf[c].reset_index(drop=True)
    for f in out_schema:
        if f.name in out:
            continue
        logical = (
            "timestamp-micros" if isinstance(f.dataType, TimestampType) else None
        )
        out[f.name] = _field_series(
            [r.get(f.name) if isinstance(r, dict) else None for r in rows],
            f.dataType,
            logical,
        )
    return pd.DataFrame(out)


def _record_fits(rec: dict, fields: StructType) -> bool:
    """Shared record-level type/range guard for the schemaless Smile paths
    (r12, extracted so the FILE reader gets the same protection as the
    column parse): a record whose field value cannot convert into the
    declared Arrow column — wrong type, out-of-int64/int32 BigInteger,
    unfloatable magnitude, datetime64-unrepresentable epoch micros,
    Decimal in any typed field — must be rejected per-record, never
    allowed to throw inside the pandas conversion and kill the batch.

    r13 (ADVICE r12): the type imports live at module level — this runs
    once per RECORD in the hot decode loop, and per-call import machinery
    (sys.modules lookups + attribute binds) is measurable there."""
    for f in fields:
        v = rec.get(f.name)
        if v is None:
            continue
        if isinstance(f.dataType, (LongType, IntegerType, TimestampType)):
            if not isinstance(v, int) or isinstance(v, bool):
                return False
            if isinstance(f.dataType, LongType) and not (
                -(1 << 63) <= v < 1 << 63
            ):
                return False
            if isinstance(f.dataType, IntegerType) and not (
                -(1 << 31) <= v < 1 << 31
            ):
                return False
            if isinstance(f.dataType, TimestampType) and not (
                -TS_MICROS_ABS_BOUND <= v <= TS_MICROS_ABS_BOUND
            ):
                return False
        elif isinstance(f.dataType, (DoubleType, FloatType)):
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                return False
            if isinstance(v, int):
                try:
                    float(v)
                except OverflowError:
                    return False
        elif isinstance(f.dataType, StringType):
            if not isinstance(v, str):
                return False
        elif isinstance(f.dataType, BooleanType):
            if not isinstance(v, bool):
                return False
        elif isinstance(f.dataType, BinaryType):
            if not isinstance(v, (bytes, bytearray)):
                return False
    return True


def load_smile_file(
    spark: SparkSession, path: str, spark_schema: str
) -> DataFrame:
    """Read file(s) of back-to-back Smile records into typed rows (fields
    matched by name; non-object root values and records whose values
    cannot represent in the declared schema are skipped — the r12 guard:
    a 0x26 BigInteger outside int64 in a long field would otherwise
    OverflowError the whole Arrow batch)."""
    prepare(spark)
    out_schema = StructType.fromDDL(spark_schema)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        from tranquility_spark.operators.smile_codec import decode_stream

        for pdf in batches:
            for content in pdf["content"]:
                rows = [
                    r
                    for r in decode_stream(bytes(content))
                    if isinstance(r, dict) and _record_fits(r, out_schema)
                ]
                yield _rows_to_pdf(rows, out_schema)

    blobs = spark.read.format("binaryFile").load(path).select("content")
    return blobs.mapInPandas(decode, schema=out_schema)


def load_smile_events(spark: SparkSession, path: str) -> DataFrame:
    """The events-fixture reader: Smile twin of ``load_csv_events`` /
    ``load_avro_events`` — same six typed output columns."""
    from tranquility_spark.sources.files import CSV_EVENTS_SCHEMA

    return load_smile_file(spark, path, CSV_EVENTS_SCHEMA)


def parse_smile_column(
    df: DataFrame,
    value_col: str,
    spark_schema: str,
    keep: Sequence[str] = (),
) -> DataFrame:
    """Decode a BINARY column of standalone Smile wire payloads — the
    reference's HTTP/Kafka body shape — with p10's corrupt-record
    accounting: ``keep`` columns + ``is_valid`` (1/0) + one typed column
    per schema field, all NULL when the payload is malformed or its root
    value is not an object. Decode never throws per-row."""
    fields = StructType.fromDDL(spark_schema)
    keep = list(keep)
    out_schema = StructType(
        [df.schema[c] for c in keep]
        + [StructField("is_valid", LongType(), False)]
        + list(fields)
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from tranquility_spark.operators.smile_codec import (
            SmileDecodeError,
            decode_record,
        )

        # Smile is schemaless, so a payload can carry ANY type in any
        # field — a mis-typed or unrepresentable value must invalidate
        # THAT record (the from_json record-corruption contract), not
        # poison the whole Arrow batch when the column converts. The
        # type/range matrix (incl. the r11 BinaryType branch and the r12
        # BigInteger/BigDecimal range guards) lives in _record_fits,
        # shared with the file reader.
        for pdf in batches:
            rows, valid = [], []
            for payload in pdf[value_col]:
                rec = None
                if payload is not None and len(payload) > 0:
                    try:
                        decoded = decode_record(bytes(payload))
                        rec = decoded if isinstance(decoded, dict) else None
                    except SmileDecodeError:
                        rec = None
                if rec is not None and not _record_fits(rec, fields):
                    rec = None
                rows.append(rec if rec is not None else {})
                valid.append(1 if rec is not None else 0)
            out = _rows_to_pdf(rows, StructType(list(fields)), pdf, keep)
            out.insert(len(keep), "is_valid", pd.array(valid, dtype="Int64"))
            yield out

    return df.select(*keep, value_col).mapInPandas(decode, schema=out_schema)
