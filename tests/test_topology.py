"""End-to-end four-stage topology: the reference's full architecture
(README of the reference; topic chain flink/error_rate_detector.py:22 <->
incident_aggregator.py:18) run as one chained streaming flow —

  producer -> error-rate detector -> every-3rd escalator -> metrics

with each Kafka topic hop replaced by a file/table hop, and the final
streamed metrics asserted equal to the all-batch composition of the same
operators over the same ticks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.detect import error_rate_alerts
from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
    escalate_every_nth,
)
from realtime_log_analytics_flink_kafka_spark.operators.metrics import (
    escalation_metrics,
)
from realtime_log_analytics_flink_kafka_spark.sources.producer import ticks_to_logs
from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
    drain_query, error_rate_stream, start_memory_sink,
)
from realtime_log_analytics_flink_kafka_spark.streaming.state import (
    escalate_every_n_stateful,
)

N_TICKS = 1200          # 1200 s of 4-service traffic -> 20 one-minute windows
MIN_SUPPORT = 5
THRESHOLD = 0.01
ESC_SCHEMA = ("service string, event_id long, ts timestamp, severity string, "
              "escalation_reason string, alert_seq long")


def _producer_logs(df):
    """Stage-1 producer output -> the detector's log shape (ts/is_error)."""
    return ticks_to_logs(df).select(
        F.timestamp_seconds("ts_s").alias("ts"),
        "service",
        (F.col("level") == "ERROR").cast("int").alias("is_error"),
        F.col("latency_ms").cast("double").alias("latency_ms"),
    )


def _alerts_to_escalator_input(alerts):
    """Topic-hop projection between detector and aggregator: the
    aggregator keys on service and orders by (ts, event_id); the window
    start is both the alert's event time and a per-(service, window)
    unique id, exactly the role Kafka per-key ordering plays in the
    reference."""
    return alerts.select(
        "service",
        F.col("window_start").alias("event_id"),
        F.timestamp_seconds("window_start").alias("ts"),
        "severity",
    )


def _metrics_input(esc):
    # escalation_metrics averages p95_latency; the escalation stream has
    # none (error-rate alerts carry no p95 — SURVEY §1.2b null-skipping)
    return esc.withColumn("p95_latency", F.lit(None).cast("double"))


def test_four_stage_topology_stream_equals_batch(spark, tmp_path):
    ticks_path = str(tmp_path / "ticks")
    spark.range(N_TICKS).coalesce(1).write.parquet(ticks_path)

    # ---- stage 1+2 (streaming): producer -> windowed error-rate alerts
    tick_stream = spark.readStream.schema("id long").parquet(ticks_path)
    alerts_stream = error_rate_stream(
        _producer_logs(tick_stream), size="1 minute", slide="1 minute",
        min_support=MIN_SUPPORT, threshold=THRESHOLD,
    ).drop("incident_id")  # uuid, nondeterministic by design (F1)
    drain_query(start_memory_sink(alerts_stream, "topo_alerts",
                                  output_mode="update"))

    hop1 = str(tmp_path / "hop_alerts")
    _alerts_to_escalator_input(spark.table("topo_alerts")) \
        .coalesce(1).write.parquet(hop1)

    # ---- stage 3 (streaming): stateful every-3rd escalator over the hop
    esc_stream = escalate_every_n_stateful(
        spark.readStream.schema(
            "service string, event_id long, ts timestamp, severity string"
        ).parquet(hop1))
    drain_query(start_memory_sink(esc_stream, "topo_esc"))

    hop2 = str(tmp_path / "hop_esc")
    spark.table("topo_esc").coalesce(1).write.parquet(hop2)

    # ---- stage 4 (streaming): windowed escalation metrics over the hop
    metrics_stream = escalation_metrics(
        _metrics_input(
            spark.readStream.schema(ESC_SCHEMA).parquet(hop2)
        ).withWatermark("ts", "2 minutes"),
        size="1 minute")
    drain_query(start_memory_sink(metrics_stream, "topo_metrics",
                                  output_mode="update"))
    got = {tuple(r) for r in spark.table("topo_metrics").collect()}

    # ---- the all-batch composition of the same four stages
    batch_alerts = error_rate_alerts(
        _producer_logs(spark.read.parquet(ticks_path)),
        size="1 minute", slide="1 minute",
        min_support=MIN_SUPPORT, threshold=THRESHOLD)
    batch_esc = escalate_every_nth(_alerts_to_escalator_input(batch_alerts))
    batch_metrics = escalation_metrics(_metrics_input(batch_esc),
                                       size="1 minute")
    want = {tuple(r) for r in batch_metrics.collect()}

    assert got == want
    # the chain really exercised every stage: alerts fired, escalations
    # happened (counters crossed 3), metrics aggregated them
    assert spark.table("topo_alerts").count() >= 3
    esc_rows = spark.table("topo_esc")
    assert esc_rows.filter(F.col("severity") == "ESCALATED").count() > 0
    assert sum(r.escalated for r in spark.table("topo_metrics").collect()) > 0
