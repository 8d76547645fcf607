"""Fixture-table adapter: the ``events`` table plays ``app_logs_raw``.

Mapping per FIXTURES.md §4: ``ts`` -> event time, ``event_type='error'`` ->
``level=ERROR``, ``value`` -> ``latency_ms``, and ``user_id % 4`` -> a
4-valued ``service`` key mirroring the reference's 4 services
(kafka/log_producer.py:18-23).  Batch and streaming detectors consume this
one shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Number of synthetic services (reference has exactly 4).
N_SERVICES = 4

#: SQL rendering of the same mapping, for DuckDB oracles.
LOGS_CTE = """
logs AS (
    SELECT
        ts,
        event_id,
        'svc-' || CAST(user_id % 4 AS VARCHAR)                 AS service,
        CASE WHEN event_type = 'error' THEN 1 ELSE 0 END       AS is_error,
        value                                                  AS latency_ms
    FROM events
)
"""


def as_logs(events: DataFrame) -> DataFrame:
    """events -> (ts, event_id, service, is_error, latency_ms)."""
    return events.select(
        "ts",
        "event_id",
        F.concat(F.lit("svc-"), (F.col("user_id") % N_SERVICES).cast("string")).alias("service"),
        F.when(F.col("event_type") == "error", F.lit(1)).otherwise(F.lit(0)).alias("is_error"),
        F.col("value").alias("latency_ms"),
    )
