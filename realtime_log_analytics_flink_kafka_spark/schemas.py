"""Typed schemas for the reference's three event shapes (SURVEY §1.2).

The reference declares these only on the Spark consumer side
(spark/spark_incident_alerts_metrics.ipynb:63-72,
spark/spark_incident_escalations_metrics.ipynb:63-72); the Flink side is
untyped dicts.  We adopt the fixed-schema approach engine-wide.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Raw log event, kafka topic ``app_logs_raw``
#: (reference: kafka/log_producer.py:66-74).
RAW_LOG_SCHEMA = T.StructType([
    T.StructField("timestamp", T.StringType(), False),   # ISO-8601 seconds, UTC
    T.StructField("service", T.StringType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("level", T.StringType(), False),        # ERROR | INFO
    T.StructField("request_id", T.StringType(), True),
    T.StructField("message", T.StringType(), True),
    T.StructField("latency_ms", T.IntegerType(), True),
])

#: Incident alert, kafka topic ``incident_alerts``.  Union schema of the
#: two producers (flink/error_rate_detector.py:94-103 emits string-typed
#: numerics; flink/latency_slo_monitor.py:94-103 emits ints) — LongType
#: here relies on from_json's lenient string->long coercion, exactly as
#: the reference notebook does (SURVEY §1.2b).
ALERT_SCHEMA = T.StructType([
    T.StructField("incident_id", T.StringType(), False),
    T.StructField("service", T.StringType(), False),
    T.StructField("type", T.StringType(), False),
    T.StructField("severity", T.StringType(), False),
    T.StructField("p95_latency", T.IntegerType(), True),   # null on ERROR_RATE_SPIKE
    T.StructField("breach_count", T.IntegerType(), True),  # null on ERROR_RATE_SPIKE
    T.StructField("window_start", T.LongType(), True),     # epoch seconds
    T.StructField("window_end", T.LongType(), True),
    T.StructField("error_rate", T.StringType(), True),     # error-rate alerts only
    T.StructField("total_logs", T.StringType(), True),
])

#: Escalation, topic ``incident_escalations``: alert schema + nullable
#: escalation_reason (flink/incident_aggregator.py:55-57; escal nb:64-72).
ESCALATION_SCHEMA = T.StructType(
    ALERT_SCHEMA.fields
    + [T.StructField("escalation_reason", T.StringType(), True)]
)

#: Driver-provided fixture tables (/root/testdata/sf*/, see TESTDATA.md).
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
