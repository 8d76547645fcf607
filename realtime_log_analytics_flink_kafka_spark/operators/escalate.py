"""Batch equivalents of the reference's keyed-state operators
(SURVEY §2.4 A9-A11, §2.6 W9-W12).

The reference implements these as Flink KeyedProcessFunctions with
ValueState; in batch they are window-function queries (gaps-and-islands),
provably equal on replayed history.  The streaming adapters live in
``streaming/state.py`` (applyInPandasWithState).

Both are shuffle-efficient: one hash exchange on the key, then a
per-partition sort — no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Reference constants (flink/incident_aggregator.py:55, latency_slo_monitor.py:23).
ESCALATION_EVERY = 3
BREACH_LIMIT = 3


def escalate_every_nth(alerts: DataFrame, *, key: str = "service",
                       order_by: list[str] | None = None,
                       n: int = ESCALATION_EVERY) -> DataFrame:
    """IncidentAggregator semantics (flink/incident_aggregator.py:41-66):
    count alerts per key; every n-th gets severity=ESCALATED +
    escalation_reason=MULTIPLE_INCIDENTS (state resets on emit, i.e. fires
    at counts n, 2n, 3n ...); ALL events pass through.

    Batch: ``row_number() % n == 0`` over (key, arrival order).  The
    reference's arrival order is Kafka per-key order; here the explicit
    ``order_by`` columns make it deterministic.
    """
    order_by = order_by or ["ts", "event_id"]
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_by])
    rn = F.row_number().over(w)
    escalated = (rn % n) == 0
    return (
        alerts
        .withColumn("alert_seq", rn)
        .withColumn(
            "severity",
            F.when(escalated, F.lit("ESCALATED")).otherwise(F.col("severity")),
        )
        .withColumn(
            "escalation_reason",
            F.when(escalated, F.lit("MULTIPLE_INCIDENTS")).otherwise(F.lit(None).cast("string")),
        )
    )


def consecutive_breaches(windowed: DataFrame, *, breach: Column,
                         key: str = "service", order_col: str = "window_start",
                         limit: int = BREACH_LIMIT) -> DataFrame:
    """BreachDetector semantics (flink/latency_slo_monitor.py:68-109): a
    per-key counter increments on each breaching window, resets to 0 on a
    healthy one, and emits an alert (then resets) when it reaches
    ``limit`` — i.e. alerts fire on the limit-th, 2*limit-th ...
    consecutive breach.

    Batch gaps-and-islands: group consecutive breaching windows into
    islands via the row_number-difference trick, take every limit-th row
    within an island.  Emitted ``breach_count`` is always ``limit``
    (the counter value at emission, :94-103).
    """
    w_all = Window.partitionBy(key).orderBy(order_col)
    flagged = windowed.withColumn("is_breach", breach.cast("int"))
    islands = flagged.withColumn(
        "island",
        F.row_number().over(w_all)
        - F.row_number().over(
            Window.partitionBy(key, "is_breach").orderBy(order_col)
        ),
    )
    w_island = Window.partitionBy(key, "island", "is_breach").orderBy(order_col)
    return (
        islands
        .withColumn("streak", F.row_number().over(w_island))
        .filter((F.col("is_breach") == 1) & (F.col("streak") % limit == 0))
        .withColumn("breach_count", F.lit(limit))
        .withColumn("type", F.lit("LATENCY_SLO_BREACH"))
        .withColumn("severity", F.lit("CRITICAL"))
        .drop("is_breach", "island", "streak")
    )
