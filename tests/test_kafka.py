"""Kafka connector wiring (SURVEY §2.1 S2-S5), exercised to the extent
the image allows: the connector jar is absent, so these tests pin the
option contract, the reader/writer construction path, and the full
encode -> wire-bytes -> decode hop — everything short of a live broker.

If a connector jar IS present (e.g. a future image), the reader test
upgrades itself to assert the real source schema instead of the
deterministic jar-missing error.
"""

from __future__ import annotations

import json

import pytest

from realtime_log_analytics_flink_kafka_spark.schemas import ALERT_SCHEMA
from realtime_log_analytics_flink_kafka_spark.sources.kafka import (
    KAFKA_SOURCE_COLUMNS, decode_json_stream, encode_json_keyed,
    kafka_sink_options, kafka_source_options, read_kafka_stream,
    write_kafka_stream,
)


def test_source_option_contract():
    """Option names/values match the Spark Kafka source contract the
    reference notebooks use verbatim (alerts nb:99-106): bootstrap
    servers under the kafka. prefix, subscribe (not assign), offsets."""
    assert kafka_source_options("app_logs_raw") == {
        "kafka.bootstrap.servers": "localhost:9092",
        "subscribe": "app_logs_raw",
        "startingOffsets": "latest",
    }
    assert kafka_source_options(
        "incident_alerts", brokers="b1:9092,b2:9092",
        starting_offsets="earliest") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "incident_alerts",
        "startingOffsets": "earliest",
    }


def test_sink_option_contract(tmp_path):
    cp = str(tmp_path / "cp")
    assert kafka_sink_options("incident_alerts", checkpoint=cp) == {
        "kafka.bootstrap.servers": "localhost:9092",
        "topic": "incident_alerts",
        "checkpointLocation": cp,
    }


def test_read_kafka_stream_construction(spark):
    """With the connector jar absent the reader fails at load() with the
    deterministic missing-data-source error (naming kafka and the
    deployment doc); with the jar present it must expose the standard
    Kafka source columns.  Either way the wrapper's wiring is executed,
    not just imported."""
    try:
        df = read_kafka_stream(spark, "app_logs_raw",
                               starting_offsets="earliest")
    except Exception as e:  # noqa: BLE001 — asserting on the error text
        msg = str(e)
        assert "kafka" in msg.lower(), msg
        assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg, msg
    else:
        assert set(KAFKA_SOURCE_COLUMNS) <= set(df.columns)


def test_write_kafka_stream_construction(spark, tmp_path):
    """The writer builds (format + options applied) without a broker;
    starting it without the jar raises the same deterministic error."""
    src = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    payload = encode_json_keyed(
        src.selectExpr("CAST(value AS STRING) AS service", "value AS n"),
        key_col="service")
    writer = write_kafka_stream(payload, "incident_alerts",
                                checkpoint=str(tmp_path / "cp"))
    try:
        q = writer.start()
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "kafka" in msg.lower(), msg
    else:  # connector present: clean up immediately
        q.stop()


def test_encode_decode_wire_hop(spark):
    """The producer -> topic -> consumer hop the reference runs through
    Kafka (kafka/log_producer.py:86-92 -> flink consumers), minus the
    broker: encode_json_keyed emits the (key, value) pair, the wire
    carries binary, decode_json_stream recovers typed columns."""
    alerts = spark.createDataFrame(
        [("auth-service", "ERROR_RATE_SPIKE", 1704067200, "0.0312"),
         ("payment-service", "LATENCY_SLO_BREACH", 1704067260, None)],
        "service string, type string, window_start long, error_rate string")
    wire = encode_json_keyed(alerts, key_col="service")

    # key partitions the topic by service (per-key ordering contract)
    keys = {r.key for r in wire.select("key").collect()}
    assert keys == {"auth-service", "payment-service"}
    for r in wire.collect():
        assert json.loads(r.value)["service"] == r.key

    decoded = decode_json_stream(
        wire.select(wire.value.cast("binary").alias("value")), ALERT_SCHEMA)
    rows = {r.service: r for r in decoded.collect()}
    assert rows["auth-service"].window_start == 1704067200
    assert rows["auth-service"].type == "ERROR_RATE_SPIKE"
    assert rows["payment-service"].window_start == 1704067260
    assert set(decoded.columns) == {f.name for f in ALERT_SCHEMA.fields}


def _kafka_connector_present(spark) -> bool:
    """True iff the spark-sql-kafka connector resolves in this session."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9092").option(
            "subscribe", "probe").load()
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg:
            return False
        # Connector present but no broker reachable — still "present".
        return True


def test_kafka_end_to_end_or_documented_skip(spark, tmp_path):
    """S2-S5 runtime path: one real produce -> detect -> consume round
    trip when the connector jar is available (enable with
    SPARK_GRAFT_KAFKA_PACKAGES=1 on a networked image — session.py gates
    spark.jars.packages on it).  On this image the jar is absent and the
    image is offline (maven unreachable), so the runtime hop cannot
    execute; the skip below documents that explicitly, and the
    encode/decode + option/plan contracts above cover everything short of
    the broker."""
    if not _kafka_connector_present(spark):
        pytest.skip(
            "spark-sql-kafka connector jar absent and image offline "
            "(repo1.maven.org unresolvable) — Kafka e2e round-trip not "
            "runnable; option contract, reader/writer construction, and "
            "the JSON wire hop are covered by the tests above")
    # Jar present: drive one micro-batch through a broker if one is up.
    import uuid
    topic = f"spark_graft_e2e_{uuid.uuid4().hex[:8]}"
    alerts = spark.createDataFrame(
        [("auth-service", "ERROR_RATE_SPIKE", 1704067200, "0.0312")],
        "service string, type string, window_start long, error_rate string")
    try:
        (encode_json_keyed(alerts, key_col="service")
         .write.format("kafka")
         .option("kafka.bootstrap.servers", "localhost:9092")
         .option("topic", topic).save())
    except Exception as e:  # noqa: BLE001 — jar present, broker absent
        pytest.skip(f"connector present but no broker at localhost:9092: {e}")
    got = (spark.read.format("kafka")
           .options(**kafka_source_options(topic,
                                           starting_offsets="earliest"))
           .load())
    decoded = decode_json_stream(got.select("value"), ALERT_SCHEMA)
    rows = decoded.collect()
    assert len(rows) == 1 and rows[0].service == "auth-service"


def test_wrapper_roundtrip_preserves_reference_topology_names():
    """The topic names the reference wires its three jobs through
    (flink/error_rate_detector.py:22 <-> incident_aggregator.py:18) are
    plain options here — no hidden renames."""
    src = kafka_source_options("incident_alerts", starting_offsets="earliest")
    snk = kafka_sink_options("incident_escalations", checkpoint="/tmp/cp")
    assert src["subscribe"] == "incident_alerts"
    assert snk["topic"] == "incident_escalations"
