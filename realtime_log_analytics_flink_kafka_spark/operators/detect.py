"""Windowed detectors (SURVEY §2.4 A1-A3, §2.6 W1-W2).

Spark-first re-expression of the two PyFlink detector jobs:

- ``error_rate_alerts``: flink/error_rate_detector.py — keyed sliding
  event-time window, incremental {total, errors} accumulator
  (ErrorRateAgg, :40-68), min-support guard total>=N (:89), threshold
  error_rate>=theta (:93), 4-digit rounding (:101).  The hand-written
  partial/final merge becomes Catalyst's automatic partial->shuffle->final
  HashAggregate; count/sum are map-side combined, so the shuffle carries
  one row per (service, window) — at 100 TB the shuffle volume is bounded
  by key-cardinality x windows, not input rows.

- ``latency_p95``: flink/latency_slo_monitor.py:45-64 — keyed tumbling
  window, exact nearest-rank-low p95.  collect_list state is O(window
  rows per key); `approx=True` switches to percentile_approx for the
  scale path (documented fallback, SURVEY §7.3).

Both run identically under spark.read (oracle-testable) and
spark.readStream + withWatermark (reference parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.percentile import exact_percentile_disc
from ..functions.scalar import guarded_ratio

#: Reference thresholds (flink/error_rate_detector.py:89,93).
MIN_SUPPORT = 100
ERROR_RATE_THRESHOLD = 0.02


def windowed_error_rates(logs: DataFrame, *, size: str, slide: str | None = None,
                         key: str = "service") -> DataFrame:
    """Per (key, window) error-rate accumulator — ErrorRateAgg as two
    codegen'd aggregates; the ratio is a post-agg projection (A2)."""
    win = F.window("ts", size, slide) if slide else F.window("ts", size)
    return (
        logs.groupBy(F.col(key), win.alias("window"))
        .agg(
            F.count("*").alias("total_logs"),
            F.sum("is_error").alias("error_logs"),
        )
        .select(
            key,
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "total_logs",
            "error_logs",
            guarded_ratio(F.col("error_logs"), F.col("total_logs")).alias("error_rate"),
        )
    )


def error_rate_alerts(logs: DataFrame, *, size: str, slide: str | None = None,
                      min_support: int = MIN_SUPPORT,
                      threshold: float = ERROR_RATE_THRESHOLD,
                      key: str = "service") -> DataFrame:
    """Sliding-window error-rate spike detection.

    Filter order matters for semantics, not for the plan: the min-support
    HAVING (P9) applies before the threshold test (P10), exactly as the
    reference returns early on small windows (flink/error_rate_detector.py:89-91).
    """
    rates = windowed_error_rates(logs, size=size, slide=slide, key=key)
    return (
        rates
        .filter(F.col("total_logs") >= min_support)
        .filter(F.col("error_rate") >= threshold)
        .withColumn("type", F.lit("ERROR_RATE_SPIKE"))
        .withColumn("severity", F.lit("HIGH"))
    )


def latency_p95(logs: DataFrame, *, size: str, q: float = 0.95,
                key: str = "service", approx: bool = False) -> DataFrame:
    """Tumbling-window exact (or approx at scale) p95 latency per key."""
    p95 = (
        F.percentile_approx("latency_ms", q).alias("p95_latency")
        if approx
        else exact_percentile_disc(F.col("latency_ms"), q).alias("p95_latency")
    )
    return (
        logs.groupBy(F.col(key), F.window("ts", size).alias("window"))
        .agg(p95, F.count("*").alias("total_logs"))
        .select(
            key,
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "p95_latency",
            "total_logs",
        )
    )
