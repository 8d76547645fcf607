"""Kafka source/sink wrappers (SURVEY §2.1 S1-S7).

The reference moves every record through Kafka as a JSON-string message
keyed by ``service`` (kafka/log_producer.py:86-92); its Flink jobs consume
with value-only string deserialization (flink/incident_aggregator.py:76-84)
and the notebooks use the Spark Kafka source verbatim (alerts nb:99-106).

Spark's Kafka connector jar is not on the classpath in this test image, so
these wrappers are exercised for plan construction only; the JSON
encode/decode halves (the part with actual semantics) are plain column
expressions and fully unit-tested batch-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_json_stream(df: DataFrame, schema: T.StructType, *,
                       coerce_strings: bool = True) -> DataFrame:
    """Kafka value bytes -> typed columns.

    Mirrors the notebook pipeline (alerts nb:110-112):
    ``CAST(value AS STRING)`` -> ``from_json`` -> struct flatten.

    The reference's two alert producers emit *different JSON types* for
    the same logical fields (epoch seconds as strings from
    flink/error_rate_detector.py:99-102, as ints from
    flink/latency_slo_monitor.py:94-103 — SURVEY §1.2b).  The notebooks'
    fixed LongType schema silently nulls the string-typed shape on
    Spark 4 (from_json does not coerce string->long), so with
    ``coerce_strings`` we parse numeric fields as strings and try_cast
    to the declared type — both producer shapes land typed, malformed
    values become null instead of poisoning the row.
    """
    if not coerce_strings:
        return (
            df.selectExpr("CAST(value AS STRING) AS json")
            .select(F.from_json(F.col("json"), schema).alias("data"))
            .select("data.*")
        )
    stringly = T.StructType([
        T.StructField(
            f.name,
            T.StringType() if isinstance(f.dataType, T.NumericType) else f.dataType,
            True,
        )
        for f in schema.fields
    ])
    parsed = (
        df.selectExpr("CAST(value AS STRING) AS json")
        .select(F.from_json(F.col("json"), stringly).alias("data"))
        .select("data.*")
    )
    return parsed.select(*[
        F.expr(f"try_cast({f.name} AS {f.dataType.simpleString()})").alias(f.name)
        if isinstance(f.dataType, T.NumericType) else F.col(f.name)
        for f in schema.fields
    ])


def encode_json_keyed(df: DataFrame, key_col: str = "service") -> DataFrame:
    """Typed columns -> Kafka (key, value) pair, key = service.

    Mirrors the producer contract (kafka/log_producer.py:86-91): value is
    the full row as a JSON string, key partitions the topic by service so
    per-service ordering is preserved — the property the reference's
    stateful operators rely on.
    """
    payload = [c for c in df.columns if c != key_col] + [key_col]
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*payload)).alias("value"),
    )


#: Columns Spark's Kafka source exposes on every record — the schema the
#: decode layer builds on (value for S2-S4; key/timestamp pass through).
KAFKA_SOURCE_COLUMNS = (
    "key", "value", "topic", "partition", "offset", "timestamp",
    "timestampType",
)


def kafka_source_options(topic: str, *, brokers: str = "localhost:9092",
                         starting_offsets: str = "latest") -> dict[str, str]:
    """The exact reader-option contract of the Spark Kafka source, kept
    separate from the DataStreamReader so it is assertable without the
    connector jar.  ``earliest`` for replay consumers
    (flink/incident_aggregator.py:82), ``latest`` for live detectors."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(topic: str, *, brokers: str = "localhost:9092",
                       checkpoint: str) -> dict[str, str]:
    """Writer-option contract: topic + brokers + checkpoint.  The
    reference checkpoints 2 of its 3 jobs (30 s,
    flink/error_rate_detector.py:116) and silently loses state in the
    third; we checkpoint every query."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def read_kafka_stream(spark: SparkSession, topic: str, *,
                      brokers: str = "localhost:9092",
                      starting_offsets: str = "latest") -> DataFrame:
    """S2/S3/S4: value-only Kafka source."""
    return (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(topic, brokers=brokers,
                                        starting_offsets=starting_offsets))
        .load()
    )


def write_kafka_stream(df: DataFrame, topic: str, *,
                       brokers: str = "localhost:9092",
                       checkpoint: str):
    """S5 + S7: keyed JSON sink with checkpointing."""
    return (
        df.writeStream.format("kafka")
        .options(**kafka_sink_options(topic, brokers=brokers,
                                      checkpoint=checkpoint))
    )


def foreach_batch_non_empty(fn):
    """S6: the notebooks' empty-batch-skipping foreachBatch console sink
    (alerts nb:149-159)."""
    def _wrapped(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            fn(batch_df, epoch_id)
    return _wrapped
