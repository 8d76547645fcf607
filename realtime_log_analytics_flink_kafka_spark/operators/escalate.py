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


def escalate_every_nth_scalable(alerts: DataFrame, *, key: str = "service",
                                ts_col: str = "ts",
                                order_by: list[str] | None = None,
                                n: int = ESCALATION_EVERY,
                                bucket_span_s: int = 86400) -> DataFrame:
    """``escalate_every_nth`` without the per-key serial window.

    The plain formulation window-partitions by ``key`` alone, so one
    task sorts a key's ENTIRE history — with a handful of services that
    means a handful of tasks regardless of cluster size.  This variant
    restores parallelism with a two-phase prefix count:

    1. bucket rows by a coarse event-time range (``floor(epoch /
       bucket_span_s)``) and number rows per (key, bucket) — parallelism
       is keys x buckets;
    2. aggregate per-(key, bucket) counts (a tiny table: keys x buckets
       rows), prefix-sum them per key ordered by bucket, and broadcast
       the offsets back;
    3. global seq = bucket offset + within-bucket row number.

    Identical output to ``escalate_every_nth`` (asserted in tests):
    bucket order is a prefix of the (ts, ...) sort order because equal
    timestamps can never straddle a bucket boundary.  ``alert_seq`` is
    long (the serial variant's int row_number overflows past 2^31 rows
    per key — exactly the regime this variant exists for).
    """
    order_by = order_by or [ts_col, "event_id"]
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_span_s) \
        .cast("long")
    w_local = Window.partitionBy(key, "_esc_bucket") \
        .orderBy(*[F.col(c) for c in order_by])
    local = (
        alerts.withColumn("_esc_bucket", bucket)
        .withColumn("_local_seq", F.row_number().over(w_local).cast("long"))
    )
    counts = local.groupBy(key, "_esc_bucket").agg(F.count("*").alias("_cnt"))
    w_prefix = Window.partitionBy(key).orderBy("_esc_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_cnt").over(w_prefix), F.lit(0))
    ).drop("_cnt")
    rn = F.col("_offset") + F.col("_local_seq")
    escalated = (rn % n) == 0
    return (
        local.join(F.broadcast(offsets), [key, "_esc_bucket"])
        .withColumn("alert_seq", rn)
        .withColumn(
            "severity",
            F.when(escalated, F.lit("ESCALATED")).otherwise(F.col("severity")),
        )
        .withColumn(
            "escalation_reason",
            F.when(escalated, F.lit("MULTIPLE_INCIDENTS"))
             .otherwise(F.lit(None).cast("string")),
        )
        .drop("_esc_bucket", "_local_seq", "_offset")
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


def throttle_alerts(alerts: DataFrame, *, key: str = "service",
                    ts_col: str = "ts", bucket_seconds: int = 86_400,
                    limit: int = 2, order_col: str = "event_id") -> DataFrame:
    """Alert-fatigue limiter: pass through only the FIRST ``limit``
    alerts per (key, time bucket), drop the rest — the dual of
    ``escalate_every_nth`` (which samples every nth; this truncates the
    head).  Production alerting pipelines need both: unthrottled
    detectors at scale page someone thousands of times for one sustained
    incident.

    One windowed rank per (key, bucket) — the partition key includes the
    time bucket, so no per-key serial window grows with history; state
    at 100 TB is bounded by alerts-per-(key, bucket), and the rank
    column doubles as the "how noisy was this incident" signal.
    """
    bucket = (F.col(ts_col).cast("long") / bucket_seconds).cast("long")
    w = Window.partitionBy(key, "_th_bucket").orderBy(ts_col, order_col)
    return (
        alerts.withColumn("_th_bucket", bucket)
        .withColumn("alert_seq", F.row_number().over(w).cast("long"))
        .filter(F.col("alert_seq") <= limit)
        .withColumn("bucket_start",
                    (F.col("_th_bucket") * bucket_seconds).cast("long"))
        .drop("_th_bucket")
    )
