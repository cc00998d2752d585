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
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

from tranquility_spark.session import prepare
from tranquility_spark.sources.avro_source import _field_series


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


def load_smile_file(
    spark: SparkSession, path: str, spark_schema: str
) -> DataFrame:
    """Read file(s) of back-to-back Smile records into typed rows (fields
    matched by name; non-object root values are skipped)."""
    prepare(spark)
    out_schema = StructType.fromDDL(spark_schema)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        from tranquility_spark.operators.smile_codec import decode_stream

        for pdf in batches:
            for content in pdf["content"]:
                rows = [
                    r for r in decode_stream(bytes(content)) if isinstance(r, dict)
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

        from pyspark.sql.types import (
            BinaryType as _BIN,
            BooleanType as _B,
            DoubleType as _D,
            FloatType as _F,
            IntegerType as _I,
            LongType as _L,
            StringType as _S,
            TimestampType as _T,
        )

        from tranquility_spark.operators.smile_codec import (
            SmileDecodeError,
            decode_record,
        )
        from tranquility_spark.sources.avro_source import TS_MICROS_ABS_BOUND

        def _typed(rec: dict) -> bool:
            """Smile is schemaless, so a payload can carry ANY type in any
            field — a mis-typed value must invalidate THAT record (the
            from_json record-corruption contract), not poison the whole
            Arrow batch when the column converts. r12 (BigInteger/
            BigDecimal tokens land here): decoded ints are now arbitrary
            precision, so integral fields need EXPLICIT range guards — an
            out-of-int64 value would OverflowError pd.array and kill the
            batch; same for an unfloatable magnitude in a double field.
            decimal.Decimal values dead-letter in every typed field (no
            silent precision loss; route them to a string/decimal schema
            downstream)."""
            for f in fields:
                v = rec.get(f.name)
                if v is None:
                    continue
                if isinstance(f.dataType, (_L, _I, _T)):
                    if not isinstance(v, int) or isinstance(v, bool):
                        return False
                    if isinstance(f.dataType, _L) and not (
                        -(1 << 63) <= v < 1 << 63
                    ):
                        return False
                    if isinstance(f.dataType, _I) and not (
                        -(1 << 31) <= v < 1 << 31
                    ):
                        return False
                    if isinstance(f.dataType, _T) and not (
                        -TS_MICROS_ABS_BOUND <= v <= TS_MICROS_ABS_BOUND
                    ):
                        # int64-valid but datetime64[ns]-unrepresentable
                        # epoch micros would OutOfBoundsDatetime the whole
                        # Arrow batch in to_datetime (ADVICE r9)
                        return False
                elif isinstance(f.dataType, (_D, _F)):
                    if not isinstance(v, (int, float)) or isinstance(v, bool):
                        return False
                    if isinstance(v, int):
                        try:
                            float(v)
                        except OverflowError:
                            return False
                elif isinstance(f.dataType, _S):
                    if not isinstance(v, str):
                        return False
                elif isinstance(f.dataType, _B):
                    if not isinstance(v, bool):
                        return False
                elif isinstance(f.dataType, _BIN):
                    # r11 (binary tokens land here): a non-bytes value in
                    # a declared binary field would throw in the Arrow
                    # conversion and kill the whole batch — dead-letter
                    # the record instead (the ADVICE r9 class)
                    if not isinstance(v, (bytes, bytearray)):
                        return False
            return True

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
                if rec is not None and not _typed(rec):
                    rec = None
                rows.append(rec if rec is not None else {})
                valid.append(1 if rec is not None else 0)
            out = _rows_to_pdf(rows, StructType(list(fields)), pdf, keep)
            out.insert(len(keep), "is_valid", pd.array(valid, dtype="Int64"))
            yield out

    return df.select(*keep, value_col).mapInPandas(decode, schema=out_schema)
