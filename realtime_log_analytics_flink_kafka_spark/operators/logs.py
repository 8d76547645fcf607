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


def error_logs(events: DataFrame) -> DataFrame:
    """Error-only logs, filtered on the RAW ``event_type`` column BEFORE
    the projection: Catalyst does not fold ``CASE WHEN event_type =
    'error' THEN 1 ELSE 0 END = 1`` back into a scan-pushable
    ``event_type = 'error'``, so every ``as_logs(...).filter(is_error ==
    1)`` query was reading all event rows and filtering after the scan.
    At 100 TB with a few-percent error rate that is a ~30x IO
    difference.  Same output as the post-projection filter (is_error is
    identically 1 on every surviving row)."""
    return as_logs(events.filter(F.col("event_type") == "error"))
