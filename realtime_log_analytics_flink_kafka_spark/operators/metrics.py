"""Windowed incident-metrics queries (SURVEY §2.4 A4-A8, §2.6 W3/W7).

Ports of the two Spark Structured Streaming notebooks — already Spark in
the reference, re-homed here as batch/stream-polymorphic operators:

- alert metrics   (spark/spark_incident_alerts_metrics.ipynb:124-146)
- escalation metrics (spark/spark_incident_escalations_metrics.ipynb:158-180)

Key semantics preserved: conditional counts via CASE-WHEN-1-END (count
skips the NULL else-branch, nb:130-131), null-skipping avg over
p95_latency (error-rate alerts contribute NULLs, nb:132 — SURVEY §1.2b),
and the ratio-of-aggregates critical_ratio (nb:134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.detmath import exact_round_div
from ..functions.scalar import guarded_ratio


def _count_if(cond) -> F.Column:
    """count(CASE WHEN cond THEN 1 END) — the notebooks' conditional count."""
    return F.count(F.when(cond, F.lit(1)))


def alert_metrics(alerts: DataFrame, *, size: str = "1 minute",
                  key: str = "service") -> DataFrame:
    """Per (service, tumbling window) operational metrics over the alert
    stream — 1:1 with alerts nb:124-146 (window size parameterized; the
    reference pins 1 minute)."""
    return (
        alerts.groupBy(F.col(key), F.window("ts", size).alias("window"))
        .agg(
            F.count("*").alias("total_alerts"),
            _count_if(F.col("type") == "LATENCY_SLO_BREACH").alias("latency_breaches"),
            _count_if(F.col("type") == "ERROR_RATE_SPIKE").alias("error_spikes"),
            # PRECONDITION: p95_latency is integer-valued (exact
            # nearest-rank percentile over integer latency_ms, see
            # functions/percentile.py) — exact_round_div casts its
            # numerator to long, so a fractional latency source (e.g.
            # interpolated percentiles) would silently truncate; switch
            # to det_round(sum/count) if that ever changes (ADVICE r5)
            exact_round_div(F.sum("p95_latency"),
                            F.count("p95_latency")).alias("avg_p95_latency"),
            F.max("breach_count").alias("max_breach_count"),
            guarded_ratio(
                F.sum(F.when(F.col("severity") == "CRITICAL", 1).otherwise(0)),
                F.count("*"),
            ).alias("critical_ratio"),
        )
        .select(
            key,
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "total_alerts", "latency_breaches", "error_spikes",
            "avg_p95_latency", "max_breach_count", "critical_ratio",
        )
    )


def escalation_metrics(escalations: DataFrame, *, size: str = "1 minute",
                       key: str = "service") -> DataFrame:
    """Escalation-stream variant (escal nb:158-180): adds escalated count
    and escalation_ratio over the pass-through stream."""
    return (
        escalations.groupBy(F.col(key), F.window("ts", size).alias("window"))
        .agg(
            F.count("*").alias("total_events"),
            _count_if(F.col("severity") == "ESCALATED").alias("escalated"),
            _count_if(F.col("escalation_reason") == "MULTIPLE_INCIDENTS")
                .alias("multiple_incident_escalations"),
            exact_round_div(F.sum("p95_latency"),
                            F.count("p95_latency")).alias("avg_p95_latency"),
            guarded_ratio(
                F.sum(F.when(F.col("severity") == "ESCALATED", 1).otherwise(0)),
                F.count("*"),
            ).alias("escalation_ratio"),
        )
        .select(
            key,
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "total_events", "escalated", "multiple_incident_escalations",
            "avg_p95_latency", "escalation_ratio",
        )
    )


def ewma_p95_daily(p95_daily: DataFrame) -> DataFrame:
    """Per-service exponentially-weighted smoothing of the daily p95
    latency series: ``e_t = (x_t + 3·e_{t-1}) div 4`` (α = ¼, a
    power-of-two weight chosen so the recurrence stays in EXACT BIGINT
    arithmetic — no float accumulates, so the fold is bit-identical
    across engines and partitionings), seeded ``e_0 = x_0``.  The
    standard trend-vs-noise smoother for SLO dashboards: a one-day
    latency spike moves the EWMA 25%, a regime change converges in ~5
    days.

    Input is the output of :func:`~..operators.detect.latency_p95`
    (service, window_start, p95_latency, …) — composition over the same
    daily-p95 operator the SLO detector uses, not a re-aggregation.

    Scale shape: groupBy(service) over the DAYS table (|services| ×
    |days| rows, already thousands of times smaller than the log
    stream), ordered struct fold per group — the sorted array is
    days-long, not events-long, so collect never sees a raw event.

    Determinism: p95 values are floored to whole ms before the fold
    (see the inline note — the raw daily p95 is a non-integral but
    bit-identical double); the fold order is fixed by array_sort on
    window_start; both operands of the division are non-negative so
    Spark ``div`` (trunc) and DuckDB ``//`` (floor) agree; the mean is
    exact_round_div.
    """
    # latency_ms (events.value) is a 2-decimal DOUBLE, so the daily p95
    # is a non-integral double (bit-identical across engines — nearest-
    # rank picks an actual data value, no arithmetic).  The fold needs
    # integers: an explicit floor() is the same correctly-rounded IEEE
    # op on both sides, whereas a bare BIGINT cast truncates on Spark
    # but rounds on DuckDB.
    p95i = F.floor("p95_latency").cast("long")
    days = (
        p95_daily.groupBy("service")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(p95i).alias("_s"),
            F.array_sort(
                F.collect_list(F.struct("window_start",
                                        p95i.alias("p95_latency")))
            ).alias("_xs"),
        )
    )
    from ..functions.detmath import int_div

    fold = F.aggregate(
        F.transform("_xs", lambda s: s["p95_latency"]),
        F.lit(None).cast("long"),
        lambda acc, x: F.when(acc.isNull(), x)
                        .otherwise(int_div(x + 3 * acc, F.lit(4))),
    )
    return days.select(
        "service",
        "n_days",
        exact_round_div(F.col("_s"), F.col("n_days"), 4).alias("mean_p95"),
        fold.alias("ewma_p95"),
    )
