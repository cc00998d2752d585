"""Kafka source (S1): topic-pattern consumption + topic→dataSource demux.

Reference: ``kafka/src/main/scala/com/metamx/tranquility/kafka/KafkaConsumer.scala``
(subscribe ``topicPattern`` regex, N consumer threads, commit offsets every
``commit.periodMillis`` AFTER flushing all writers — at-least-once) and
``kafka/.../writer/WriterController.scala`` (first dataSource whose
``topicPattern`` matches the topic gets the message; ``useTopicAsDataSource``
maps topic name straight to dataSource).

Spark restatement (SURVEY.md §3.3): ``readStream.format("kafka")`` with
``subscribePattern`` — offset tracking moves into the checkpoint, which
upgrades delivery to exactly-once into idempotent sinks. The demux becomes a
column expression + sink ``partitionBy('datasource')`` (one query) instead of
per-topic writer threads.

The wire-schema transform (bytes → parsed events with a datasource column) is
a pure DataFrame function, unit-testable on static frames without a broker —
the broker-facing reader is just configuration around it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic_pattern: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Build the raw Kafka stream: columns ``key/value BINARY, topic STRING, …``.

    ``subscribePattern`` is the reference's ``topicPattern`` regex (Java regex
    in both engines). ``maxOffsetsPerTrigger`` bounds batch size — the
    ``maxBatchSize``/back-pressure analog (S3).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribePattern", topic_pattern)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def topic_to_datasource(
    topic: Column,
    mappings: Sequence[tuple[str, str]],
    use_topic_as_datasource: bool = False,
) -> Column:
    """First-match topic→dataSource routing (ref: ``WriterController.getWriter``).

    ``mappings`` is an ordered list of (topicPattern regex, dataSource).
    With ``use_topic_as_datasource`` a matching topic maps to itself
    (ref: ``useTopicAsDataSource`` — topic name IS the dataSource).
    Non-matching topics yield NULL (the reference logs-and-skips them).
    """
    expr = F.lit(None).cast("string")
    # build WHEN chain in reverse so the FIRST pattern in the list wins
    for pattern, datasource in reversed(list(mappings)):
        target = topic if use_topic_as_datasource else F.lit(datasource)
        expr = F.when(topic.rlike(f"^(?:{pattern})$"), target).otherwise(expr)
    return expr


def parse_kafka_batch(
    df: DataFrame,
    schema: str,
    mappings: Sequence[tuple[str, str]],
    use_topic_as_datasource: bool = False,
    drop_unmatched: bool = True,
    drop_malformed: "bool | str" = True,
    wire_format: str = "json",
    avro_schema: Optional[dict] = None,
    avro_impl: str = "native",
) -> DataFrame:
    """Kafka wire rows → parsed events tagged with ``datasource``.

    Input needs ``value BINARY`` (or STRING) + ``topic STRING`` columns — the
    shape both the real Kafka source and test fixtures share. JSON parse uses
    PERMISSIVE mode; malformed payloads are dropped (ref:
    ``reportDropsAsExceptions=false`` default) unless ``drop_malformed=False``,
    in which case they surface with NULL fields for dead-lettering (W3), or
    ``drop_malformed="mark"``, which also keeps an explicit ``is_valid``
    (1/0) column — the unambiguous dead-letter verdict: a VALID payload
    whose optional fields are all absent (Smile ``{}``, an Avro record of
    nulls, JSON ``{}``) is otherwise indistinguishable from a corrupt one
    in the NULL-fields convention.

    ``wire_format="avro"`` decodes the value bytes as single-record Avro
    wire payloads instead — the binary ingest path the reference served
    with Smile (SURVEY §2 P2; ``ObjectWriter.scala#SmileObjectWriter``
    [recall]) restated as the format today's Kafka users actually ship.
    Requires ``avro_schema`` (the writer's Avro record schema);
    ``avro_impl`` follows ``sources/avro_source.py`` ("native" stdlib
    decoder, "spark" = ``from_avro`` when the spark-avro jar is loaded).
    Identical drop/dead-letter semantics: corrupt payloads either drop or
    surface with NULL fields.
    """
    if wire_format not in ("json", "avro", "smile"):
        raise ValueError(f"unknown wire_format {wire_format!r}")
    if drop_malformed not in (True, False, "mark"):
        # a typo'd mode would otherwise silently behave like False
        raise ValueError(
            f"drop_malformed must be True, False or 'mark', got "
            f"{drop_malformed!r}"
        )
    if wire_format == "smile":
        # the reference's own Kafka wire format (SmileObjectWriter) —
        # schemaless like the JSON path: fields picked by name, same
        # drop/dead-letter semantics
        from tranquility_spark.sources.smile_source import parse_smile_column

        ds = topic_to_datasource(
            F.col("topic"), mappings, use_topic_as_datasource
        )
        tagged = df.select(
            ds.alias("datasource"), "topic", F.col("value").cast("binary")
        )
        if drop_unmatched:
            tagged = tagged.filter(F.col("datasource").isNotNull())
        parsed = parse_smile_column(
            tagged, "value", schema, keep=["datasource", "topic"]
        )
        if drop_malformed is True:
            parsed = parsed.filter(F.col("is_valid") == 1)
        return parsed if drop_malformed == "mark" else parsed.drop("is_valid")
    if wire_format == "avro":
        from tranquility_spark.sources.avro_source import parse_avro_column

        if avro_schema is None:
            raise ValueError("wire_format='avro' requires avro_schema")
        ds = topic_to_datasource(
            F.col("topic"), mappings, use_topic_as_datasource
        )
        tagged = df.select(
            ds.alias("datasource"), "topic", F.col("value").cast("binary")
        )
        if drop_unmatched:
            tagged = tagged.filter(F.col("datasource").isNotNull())
        parsed = parse_avro_column(
            tagged,
            "value",
            avro_schema,
            schema,
            keep=["datasource", "topic"],
            impl=avro_impl,
        )
        if drop_malformed is True:
            parsed = parsed.filter(F.col("is_valid") == 1)
        return parsed if drop_malformed == "mark" else parsed.drop("is_valid")
    ds = topic_to_datasource(F.col("topic"), mappings, use_topic_as_datasource)
    # PERMISSIVE from_json yields all-NULL fields for malformed payloads; the
    # corrupt-record column is the reliable malformed marker
    parse_schema = f"{schema}, _corrupt_record string"
    parsed = df.select(
        ds.alias("datasource"),
        F.col("topic"),
        F.from_json(
            F.col("value").cast("string"),
            parse_schema,
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("event"),
    )
    if drop_unmatched:
        parsed = parsed.filter(F.col("datasource").isNotNull())
    if drop_malformed is True:
        parsed = parsed.filter(F.col("event._corrupt_record").isNull())
    out = parsed.select("datasource", "topic", "event.*")
    if drop_malformed == "mark":
        return out.withColumn(
            "is_valid",
            F.when(F.col("_corrupt_record").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        ).drop("_corrupt_record")
    return out.drop("_corrupt_record")
