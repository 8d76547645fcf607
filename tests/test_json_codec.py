"""JSON encode/decode semantics (SURVEY §2.1 S1, §2.2 P1-P3/P8, §1.2b).

The reference's two alert producers emit *different JSON types for the
same logical fields* (error-rate detector: epoch seconds + metrics as
strings, flink/error_rate_detector.py:99-102; SLO monitor: ints).  The
Spark consumer's fixed schema relies on from_json's lenient coercion —
that exact behavior is what these tests pin down.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.schemas import ALERT_SCHEMA
from realtime_log_analytics_flink_kafka_spark.sources.kafka import (
    decode_json_stream, encode_json_keyed,
)

ERROR_RATE_ALERT = {
    # string-typed numerics, exactly as flink/error_rate_detector.py:94-103
    "incident_id": "inc-aaaa1111", "service": "auth-service",
    "type": "ERROR_RATE_SPIKE", "severity": "HIGH",
    "window_start": "1704067200", "window_end": "1704067220",
    "error_rate": "0.0312", "total_logs": "160",
}
SLO_ALERT = {
    # int-typed numerics, exactly as flink/latency_slo_monitor.py:94-103
    "incident_id": "inc-bbbb2222", "service": "payment-service",
    "type": "LATENCY_SLO_BREACH", "severity": "CRITICAL",
    "p95_latency": 180, "breach_count": 3,
    "window_start": 1704067200, "window_end": 1704067260,
}


def _as_kafka_values(spark, dicts):
    return spark.createDataFrame(
        [(json.dumps(d).encode(),) for d in dicts], "value binary")


def test_heterogeneous_alert_decoding(spark):
    df = decode_json_stream(_as_kafka_values(spark, [ERROR_RATE_ALERT, SLO_ALERT]),
                            ALERT_SCHEMA)
    rows = {r.incident_id: r for r in df.collect()}
    er, slo = rows["inc-aaaa1111"], rows["inc-bbbb2222"]
    # string "1704067200" coerced into LongType (the §1.2b landmine)
    assert er.window_start == 1704067200 and isinstance(er.window_start, int)
    assert er.p95_latency is None and er.breach_count is None
    assert er.error_rate == "0.0312"
    assert slo.p95_latency == 180 and slo.breach_count == 3
    assert slo.error_rate is None
    # null-skipping avg over the union (alerts nb:132 semantics)
    avg = df.agg(F.avg("p95_latency").alias("a")).first().a
    assert avg == 180.0


def test_malformed_json_yields_nulls(spark):
    vals = _as_kafka_values(spark, [])
    vals = spark.createDataFrame(
        [(b"{not json",), (b"",), (json.dumps(SLO_ALERT).encode(),)],
        "value binary")
    df = decode_json_stream(vals, ALERT_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    ok = [r for r in rows if r.incident_id is not None]
    assert len(ok) == 1 and ok[0].incident_id == "inc-bbbb2222"


def test_encode_round_trip_keyed_by_service(spark):
    src = decode_json_stream(_as_kafka_values(spark, [ERROR_RATE_ALERT, SLO_ALERT]),
                             ALERT_SCHEMA)
    encoded = encode_json_keyed(src, key_col="service")
    assert encoded.columns == ["key", "value"]
    out = {r.key: json.loads(r.value) for r in encoded.collect()}
    # key partitions the topic by service (kafka/log_producer.py:88)
    assert set(out) == {"auth-service", "payment-service"}
    # to_json drops null fields; surviving fields round-trip typed
    assert out["payment-service"]["p95_latency"] == 180
    assert out["auth-service"]["window_start"] == 1704067200
    assert "p95_latency" not in out["auth-service"]
    decoded_again = decode_json_stream(
        encoded.select(F.col("value").cast("binary").alias("value")), ALERT_SCHEMA)
    assert {r.incident_id for r in decoded_again.collect()} == \
        {"inc-aaaa1111", "inc-bbbb2222"}
