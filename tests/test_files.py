"""JSONL / CSV interchange layer (sources/files.py).

The reference's wire format is JSON strings (kafka/log_producer.py:86-92);
landed on storage that is JSONL.  These tests pin the two contracts that
matter at scale: (1) lossless round-trip under an explicit schema — no
inference pass, no type drift; (2) malformed records null out under
PERMISSIVE mode instead of failing the scan.
"""

from __future__ import annotations

import pytest

from realtime_log_analytics_flink_kafka_spark.sources.files import (
    read_csv, read_jsonl, write_csv, write_jsonl,
)
from tests.fixtures import LOG_SCHEMA, gen_logs


@pytest.fixture(scope="module")
def log_df(spark):
    return spark.createDataFrame(gen_logs(n_seconds=10), schema=LOG_SCHEMA)


def _sorted_rows(df):
    return sorted(df.collect(), key=lambda r: r.event_id)


def test_jsonl_round_trip(spark, log_df, tmp_path):
    path = str(tmp_path / "logs_jsonl")
    write_jsonl(log_df, path)
    back = read_jsonl(spark, path, LOG_SCHEMA)
    assert back.schema == log_df.schema
    assert _sorted_rows(back) == _sorted_rows(log_df)


def test_csv_round_trip(spark, log_df, tmp_path):
    path = str(tmp_path / "logs_csv")
    write_csv(log_df, path)
    back = read_csv(spark, path, LOG_SCHEMA)
    assert back.schema == log_df.schema
    assert _sorted_rows(back) == _sorted_rows(log_df)


def test_jsonl_malformed_records_null_out(spark, tmp_path):
    raw = tmp_path / "mixed"
    raw.mkdir()
    (raw / "part-0.json").write_text(
        '{"event_id": 1, "service": "auth-service", "latency_ms": 120.0}\n'
        'this is not json at all\n'
        '{"event_id": 2, "service": "payment-service", "latency_ms": "NaNish"}\n'
    )
    df = read_jsonl(spark, str(raw),
                    "event_id long, service string, latency_ms double")
    rows = {r.event_id: r for r in df.collect()}
    # Good record survives intact.
    assert rows[1].latency_ms == 120.0
    # Unparseable line -> all-null row, not a job failure.
    assert None in rows and rows[None].service is None
    # Type-mismatched field nulls out; the rest of the record survives.
    assert rows[2].service == "payment-service"
    assert rows[2].latency_ms is None


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC lands and reads back exactly, and a filter reaches the ORC
    scan as a pushed predicate (same plan posture as parquet)."""
    from realtime_log_analytics_flink_kafka_spark.sources.files import (
        read_orc, write_orc,
    )
    df = spark.createDataFrame(
        [(i, f"svc-{i % 3}", float(i)) for i in range(100)],
        "event_id long, service string, latency_ms double")
    path = str(tmp_path / "events_orc")
    write_orc(df, path)

    back = read_orc(spark, path)
    assert back.count() == 100
    assert dict(back.dtypes) == dict(df.dtypes)

    filtered = back.filter(back.service == "svc-1")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(service), EqualTo(service,svc-1)]" \
        in plan, f"service filter must reach the ORC scan:\n{plan}"
    assert filtered.count() == 33
