"""Observability layer (SURVEY §5.1): the reference's print-trace
counters re-expressed as observe() metrics — verified against the exact
row flows in both batch (Observation) and streaming (listener) modes.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import Observation
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.detect import (
    error_rate_alerts,
)
from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
    drain_query, error_rate_stream, start_memory_sink,
)
from realtime_log_analytics_flink_kafka_spark.streaming.observe import (
    MetricsRecorder, observe_emitted, observe_ingest,
)
from tests.fixtures import LOG_SCHEMA, gen_logs


def test_batch_observation_counts_exact_flows(spark):
    rows = gen_logs(n_seconds=60)
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    obs = Observation("ingest")
    observed = logs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_error").alias("n_errors"),
    )
    alerts = error_rate_alerts(observed, size="20 seconds",
                               slide="10 seconds", min_support=10,
                               threshold=0.01)
    n_alerts = alerts.count()
    got = obs.get
    assert got["n_rows"] == len(rows)
    assert got["n_errors"] == sum(r["is_error"] for r in rows)
    assert n_alerts > 0  # the seeded workload is designed to fire


def test_streaming_listener_captures_per_batch_metrics(spark, tmp_path):
    rows = gen_logs(n_seconds=60)
    path = str(tmp_path / "logs")
    spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(path)

    rec = MetricsRecorder()
    spark.streams.addListener(rec)
    try:
        stream = spark.readStream.schema(LOG_SCHEMA).parquet(path)
        pipeline = observe_emitted(error_rate_stream(
            observe_ingest(stream),
            size="20 seconds", slide="10 seconds",
            min_support=10, threshold=0.01,
        ).drop("incident_id"))
        q = start_memory_sink(pipeline, "obs_stream", output_mode="update")
        drain_query(q)
        # listener bus is async; poll until the progress events land
        deadline = time.time() + 20
        while time.time() < deadline and rec.total("ingest", "n_rows") < len(rows):
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(rec)

    assert rec.total("ingest", "n_rows") == len(rows)
    assert rec.total("ingest", "n_errors") == sum(r["is_error"] for r in rows)
    # every alert row the sink received was counted by the emit metric
    emitted = spark.table("obs_stream").count()
    assert rec.total("alerts", "n_emitted") == emitted > 0
