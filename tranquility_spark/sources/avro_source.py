"""Avro event sources — the binary wire-format ingest path.

Reference parity: tranquility's server accepts JSON or SMILE-encoded
events (``core/.../typeclass/ObjectWriter.scala#SmileObjectWriter``
[recall]; SURVEY §2 P2 declares the Smile wire detail absent by design).
The modern Kafka-ecosystem equivalent a real user ships is AVRO, so this
module is the binary sibling of ``files.load_csv_events`` /
``parse.parse_jsonl_file``: same explicit-schema, corrupt-record-accounted
contract, binary encoding instead of text.

Two impls behind one slot (the ``codecs.py`` discipline):

- ``impl="spark"`` — the PRODUCTION path: the ``spark-avro`` data source
  (``format("avro")`` for container files, ``from_avro`` for wire
  payloads), JVM-side, codec-complete (deflate/snappy), splittable at
  OCF block boundaries. It is an EXTERNAL Spark module; when the jar is
  not loaded we fail fast driver-side with the exact ``--packages``
  coordinate instead of an opaque analysis error mid-job.
- ``impl="native"`` (default here) — a pure-stdlib decoder
  (``operators/avro_codec.py``, public-spec subset, ``null`` codec) run
  inside Arrow-batched mapInPandas. Parallelism is per FILE for container
  reads (binaryFile source; a 100 TB backfill should be many files — the
  same contract as every whole-file format) and per PAYLOAD for wire
  decode — no shuffle on either path.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from tranquility_spark.session import prepare

SPARK_AVRO_HINT = (
    "the spark-avro data source is not loaded in this session; start Spark "
    "with --packages org.apache.spark:spark-avro_2.13:<spark-version> "
    "(or ship the jar), or use impl='native'"
)

#: Avro schema of the committed events fixture — the binary twin of
#: files.CSV_EVENTS_SCHEMA. Nullable fields are ``["null", T]`` unions;
#: ts is epoch-micros (timestamp-micros logical type).
EVENTS_AVRO_SCHEMA: dict = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "user_id", "type": ["null", "long"], "default": None},
        {"name": "event_type", "type": ["null", "string"], "default": None},
        {"name": "value", "type": ["null", "double"], "default": None},
        {"name": "note", "type": ["null", "string"], "default": None},
    ],
}


#: largest |epoch value| in the logical's own unit that still fits pandas
#: datetime64[ns] (the dtype to_datetime builds): +/-(2^63 - 1) ns.
TS_MICROS_ABS_BOUND = ((1 << 63) - 1) // 1_000
TS_MILLIS_ABS_BOUND = ((1 << 63) - 1) // 1_000_000


def _field_series(values: list, spark_type, logical: str | None):
    """One decoded column as a pandas Series with the NULL-faithful dtype:
    nullable extension dtypes for numerics (a plain float64 would turn
    None into NaN, which Spark keeps as NaN — NOT null), datetime64 for
    timestamps (epoch micros/millis per the Avro logical type)."""
    import pandas as pd

    if isinstance(spark_type, TimestampType):
        unit = "ms" if logical == "timestamp-millis" else "us"
        return pd.to_datetime(pd.Series(values, dtype="object"), unit=unit)
    if isinstance(spark_type, LongType):
        return pd.array(values, dtype="Int64")
    if isinstance(spark_type, IntegerType):
        return pd.array(values, dtype="Int32")
    if isinstance(spark_type, DoubleType):
        return pd.array(values, dtype="Float64")
    if isinstance(spark_type, FloatType):
        return pd.array(values, dtype="Float32")
    if isinstance(spark_type, BooleanType):
        return pd.array(values, dtype="boolean")
    return pd.Series(values, dtype="object")


def _avro_logical(avro_schema: dict, name: str) -> str | None:
    for f in avro_schema["fields"]:
        if f["name"] == name:
            t = f["type"]
            branches = t if isinstance(t, list) else [t]
            for b in branches:
                if isinstance(b, dict) and "logicalType" in b:
                    return b["logicalType"]
    return None


def load_avro_file(
    spark: SparkSession,
    path: str,
    spark_schema: str,
    avro_schema: dict,
    impl: str = "native",
    resolve: bool = False,
) -> DataFrame:
    """Read Avro Object Container File(s) into typed rows.

    ``spark_schema`` is the explicit DDL output schema (field order =
    output order; the explicit-schema contract of ``load_csv_events``);
    ``avro_schema`` is the expected schema — by default mismatched
    container metadata raises rather than mis-decoding. With
    ``resolve=True``, ``avro_schema`` acts as the READER schema instead
    and a container written with a DIFFERENT (compatible) schema engages
    Avro schema resolution — records decode with the file's embedded
    writer schema, then map by field name with defaults/promotions
    (``avro_codec.resolve_record``) — the rolling-schema-evolution read
    path. The spark impl gets the same semantics from the data source's
    ``avroSchema`` option.
    """
    prepare(spark)
    if impl == "spark":
        try:
            reader = spark.read.format("avro")
            if resolve:
                reader = reader.option("avroSchema", json.dumps(avro_schema))
            raw = reader.load(path)
        except Exception as ex:  # AnalysisException: AVRO_NOT_LOADED
            raise RuntimeError(f"impl='spark': {SPARK_AVRO_HINT}") from ex
        out = StructType.fromDDL(spark_schema)
        return raw.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in out]
        )
    if impl != "native":
        raise ValueError(f"unknown impl {impl!r}: use 'native' or 'spark'")

    out_schema = StructType.fromDDL(spark_schema)
    expected = json.dumps(avro_schema, sort_keys=True)
    logicals = {f.name: _avro_logical(avro_schema, f.name) for f in out_schema}

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from tranquility_spark.operators.avro_codec import (
            read_ocf,
            resolve_record,
        )

        for pdf in batches:
            for content in pdf["content"]:
                schema, records = read_ocf(bytes(content))
                if resolve:
                    rows = [
                        resolve_record(rec, schema, avro_schema)
                        for rec in records
                    ]
                    # logical-type semantics belong to the WRITER: Avro
                    # resolution passes the long VALUE through unchanged,
                    # so a millis-writer/micros-reader pair must convert
                    # by the writer's unit or every timestamp lands 1000x
                    # off. Reader-only (defaulted) fields keep the
                    # reader's logical annotation.
                    file_logicals = {
                        f.name: _avro_logical(schema, f.name)
                        or logicals[f.name]
                        for f in out_schema
                    }
                elif json.dumps(schema, sort_keys=True) != expected:
                    raise ValueError(
                        "OCF writer schema differs from the expected Avro "
                        f"schema: {json.dumps(schema, sort_keys=True)[:200]}"
                    )
                else:
                    rows = list(records)
                    file_logicals = logicals
                yield pd.DataFrame(
                    {
                        f.name: _field_series(
                            [r.get(f.name) for r in rows],
                            f.dataType,
                            file_logicals[f.name],
                        )
                        for f in out_schema
                    }
                )

    blobs = spark.read.format("binaryFile").load(path).select("content")
    return blobs.mapInPandas(decode, schema=out_schema)


def load_avro_events(
    spark: SparkSession, path: str, impl: str = "native"
) -> DataFrame:
    """The events-fixture reader: binary twin of ``load_csv_events`` —
    same six typed output columns, Avro OCF input."""
    from tranquility_spark.sources.files import CSV_EVENTS_SCHEMA

    return load_avro_file(
        spark, path, CSV_EVENTS_SCHEMA, EVENTS_AVRO_SCHEMA, impl=impl
    )


def parse_avro_column(
    df: DataFrame,
    value_col: str,
    avro_schema: dict,
    spark_schema: str,
    keep: Sequence[str] = (),
    impl: str = "native",
    reader_schema: dict | None = None,
) -> DataFrame:
    """Decode a BINARY column of single-record Avro wire payloads — the
    Kafka value-bytes shape, i.e. the ``from_avro`` analog — with p10's
    corrupt-record accounting: output is ``keep`` columns + ``is_valid``
    (1/0) + one typed column per record field, all fields NULL when the
    payload is malformed (NULL/empty payload, buffer under/overrun, bad
    union branch, invalid UTF-8 — decode never throws per-row).

    ``impl="spark"`` binds ``from_avro(..., mode=PERMISSIVE)`` (corrupt
    payloads null the whole struct — the same verdict shape), availability-
    gated with a clear driver-side error.

    ``reader_schema`` (native impl only): decode each payload with the
    WRITER ``avro_schema``, then apply Avro schema resolution to the
    reader's shape — field matching by name, reader defaults, spec
    promotions (``avro_codec.resolve_record``); ``spark_schema`` then
    describes the READER fields. Wire payloads carry no writer schema, so
    ``from_avro`` cannot resolve two schemas — passing ``reader_schema``
    with ``impl="spark"`` raises instead of silently mis-decoding.
    """
    fields = StructType.fromDDL(spark_schema)
    if impl == "spark" and reader_schema is not None:
        raise ValueError(
            "reader_schema requires impl='native': from_avro deserializes "
            "wire bytes with a single schema and cannot resolve writer vs "
            "reader"
        )
    if impl == "spark":
        try:
            from pyspark.sql.avro.functions import from_avro

            parsed = df.select(
                *keep,
                from_avro(
                    F.col(value_col),
                    json.dumps(avro_schema),
                    {"mode": "PERMISSIVE"},
                ).alias("__r"),
            )
            parsed.schema  # force analysis so a missing jar fails HERE
        except Exception as ex:
            raise RuntimeError(f"impl='spark': {SPARK_AVRO_HINT}") from ex
        return parsed.select(
            *keep,
            F.when(F.col("__r").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_valid"),
            *[F.col(f"__r.{f.name}").alias(f.name) for f in fields],
        )
    if impl != "native":
        raise ValueError(f"unknown impl {impl!r}: use 'native' or 'spark'")

    keep = list(keep)
    out_schema = StructType(
        [df.schema[c] for c in keep]
        + [StructField("is_valid", LongType(), False)]
        + list(fields)
    )
    logicals = {
        f.name: _avro_logical(reader_schema or avro_schema, f.name)
        for f in fields
    }
    # spec-valid int64 epoch values can still overflow pandas datetime64[ns]
    # (~years 1677-2262); to_datetime would then kill the whole Arrow batch
    # instead of dead-lettering the one payload (ADVICE r9) — bound per row
    ts_bounds = [
        (
            f.name,
            TS_MILLIS_ABS_BOUND
            if logicals[f.name] == "timestamp-millis"
            else TS_MICROS_ABS_BOUND,  # _field_series defaults to micros
        )
        for f in fields
        if isinstance(f.dataType, TimestampType)
    ]
    schema_dict = avro_schema
    reader_dict = reader_schema

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from tranquility_spark.operators.avro_codec import (
            AvroDecodeError,
            decode_record,
        )

        for pdf in batches:
            valid: list[int] = []
            cols: dict[str, list] = {f.name: [] for f in fields}
            for payload in pdf[value_col]:
                rec = None
                if payload is not None and len(payload) > 0:
                    try:
                        rec = decode_record(
                            bytes(payload), schema_dict, reader_dict
                        )
                    except AvroDecodeError:
                        rec = None
                if rec is not None:
                    for ts_name, bound in ts_bounds:
                        v = rec.get(ts_name)
                        if isinstance(v, int) and not -bound <= v <= bound:
                            rec = None  # datetime64[ns]-unrepresentable
                            break
                valid.append(1 if rec is not None else 0)
                for f in fields:
                    cols[f.name].append(None if rec is None else rec.get(f.name))
            out = {c: pdf[c].reset_index(drop=True) for c in keep}
            out["is_valid"] = pd.array(valid, dtype="Int64")
            for f in fields:
                out[f.name] = _field_series(
                    cols[f.name], f.dataType, logicals[f.name]
                )
            yield pd.DataFrame(out)

    return df.select(*keep, value_col).mapInPandas(decode, schema=out_schema)


def encode_avro_column(
    df: DataFrame,
    avro_schema: dict,
    out_col: str = "value",
    keep: Sequence[str] = (),
    impl: str = "native",
) -> DataFrame:
    """ENCODE rows into single-record Avro wire payloads — ``to_avro``'s
    analog and ``parse_avro_column``'s inverse, i.e. the serializer half
    of the reference's ObjectWriter role (events → wire bytes for a
    producer/HTTP body; ``ObjectWriter.scala`` [recall] did this with
    JSON/Smile).

    Each record field named in ``avro_schema`` is read from the matching
    DataFrame column: timestamps convert to epoch micros/millis per the
    field's logical type, NULLs take the union's null branch, and
    encoding errors (a non-nullable field holding NULL, a value matching
    no union branch) FAIL the task rather than emitting silent garbage —
    a producer must never ship undecodable bytes. Output: ``keep``
    columns + ``out_col BINARY``.

    ``impl="spark"`` binds ``to_avro`` (JVM-side) when the spark-avro jar
    is loaded, with the same availability gate as the decode path. Scale:
    narrow mapInPandas (or pure JVM for impl="spark"), no shuffle.
    """
    field_names = [f["name"] for f in avro_schema["fields"]]
    logicals = {
        f["name"]: _avro_logical(avro_schema, f["name"])
        for f in avro_schema["fields"]
    }
    if impl == "spark":
        try:
            from pyspark.sql.avro.functions import to_avro

            enc = df.select(
                *keep,
                to_avro(
                    F.struct(*[F.col(n) for n in field_names]),
                    json.dumps(avro_schema),
                ).alias(out_col),
            )
            enc.schema  # force analysis so a missing jar fails HERE
        except Exception as ex:
            raise RuntimeError(f"impl='spark': {SPARK_AVRO_HINT}") from ex
        return enc
    if impl != "native":
        raise ValueError(f"unknown impl {impl!r}: use 'native' or 'spark'")

    keep = list(keep)
    out_schema = StructType(
        [df.schema[c] for c in keep]
        + [StructField(out_col, BinaryType(), False)]
    )
    schema_dict = avro_schema

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from tranquility_spark.operators.avro_codec import encode_value

        def to_py(v, logical):
            # NULL can arrive as None, NaN, NaT, or pd.NA depending on the
            # column's dtype — normalize all to the union's null branch
            if v is None or (
                not isinstance(v, (bytes, bytearray, list, dict, str))
                and pd.isna(v)
            ):
                return None
            if logical in ("timestamp-micros", "timestamp-millis"):
                unit = 1_000_000 if logical == "timestamp-micros" else 1_000
                ts = pd.Timestamp(v)
                return int(ts.value // (1_000_000_000 // unit))
            if hasattr(v, "item"):  # numpy scalar -> python
                return v.item()
            return v

        for pdf in batches:
            payloads = []
            for i in range(len(pdf)):
                rec = {
                    n: to_py(pdf[n].iloc[i], logicals[n]) for n in field_names
                }
                payloads.append(encode_value(rec, schema_dict))
            out = {c: pdf[c].reset_index(drop=True) for c in keep}
            out[out_col] = pd.Series(payloads, dtype="object")
            yield pd.DataFrame(out)

    return df.select(*keep, *field_names).mapInPandas(encode, schema=out_schema)
