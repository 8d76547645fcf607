"""Property-based tests (SURVEY §5): the stateful operators against plain
Python simulators of the reference's KeyedProcessFunction logic, and the
detector's alert invariants under the seeded workload generator.

Each Spark example costs a job, so example counts are small but the
generators cover the structural edge cases (empty keys, single-element
runs, all-breach / no-breach patterns).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.detect import (
    error_rate_alerts,
)
from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
    consecutive_breaches, escalate_every_nth,
)
from tests.fixtures import LOG_SCHEMA, gen_logs


def simulate_escalation(n_events: int, n: int = 3) -> list[str]:
    """flink/incident_aggregator.py:41-66 in ten lines of Python."""
    out, count = [], 0
    for _ in range(n_events):
        count += 1
        if count >= n:
            out.append("ESCALATED")
            count = 0
        else:
            out.append("HIGH")
    return out


def simulate_breaches(pattern: list[bool], limit: int = 3) -> list[int]:
    """flink/latency_slo_monitor.py:68-109: emit positions."""
    out, streak = [], 0
    for i, b in enumerate(pattern):
        if b:
            streak += 1
            if streak >= limit:
                out.append(i)
                streak = 0
        else:
            streak = 0
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=4))
def test_escalation_matches_simulator(spark, key_sizes):
    rows = []
    eid = 0
    for k, size in enumerate(key_sizes):
        for _ in range(size):
            rows.append((eid, f"svc-{k}", float(eid), "HIGH"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, service string, ts double, severity string")
    got = escalate_every_nth(df, order_by=["ts"])
    for k, size in enumerate(key_sizes):
        seq = [r.severity for r in got.filter(F.col("service") == f"svc-{k}")
               .orderBy("alert_seq").collect()]
        assert seq == simulate_escalation(size)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=20))
def test_breach_islands_match_simulator(spark, pattern):
    rows = [("svc", i, 200.0 if b else 50.0) for i, b in enumerate(pattern)]
    df = spark.createDataFrame(rows, "service string, window_start long, p95 double")
    got = sorted(r.window_start for r in consecutive_breaches(
        df, breach=F.col("p95") > 100.0, order_col="window_start").collect())
    assert got == simulate_breaches(pattern)


@settings(max_examples=3, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_detector_alert_invariants(spark, seed):
    """Every emitted alert satisfies the gates (P9/P10); the spike regime
    (x10 error rate, log_producer.py:52-55) makes auth-service fire."""
    rows = [
        dict(event_id=r["event_id"], ts=r["ts"], service=r["service"],
             is_error=r["is_error"], latency_ms=r["latency_ms"])
        for r in gen_logs(n_seconds=60, seed=seed)
    ]
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    alerts = error_rate_alerts(logs, size="20 seconds", slide="10 seconds",
                               min_support=50, threshold=0.05).collect()
    assert all(a.total_logs >= 50 and a.error_rate >= 0.05 for a in alerts)
    # auth-service runs a 30% base error rate — it must alert
    assert any(a.service == "auth-service" for a in alerts)
