"""Structured Streaming ports of the reference's three Flink jobs plus the
two notebook metrics queries (SURVEY §3).

Topology mapping:

  kafka(app_logs_raw) -> error_rate_detector  -> kafka(incident_alerts)
  kafka(app_logs_raw) -> latency_slo_monitor  -> kafka(incident_alerts)
  kafka(incident_alerts) -> incident_aggregator -> kafka(incident_escalations)
  kafka(incident_alerts|escalations) -> windowed metrics -> console

Every transformation here is source-agnostic: the same functions accept a
Kafka stream (decode_json_stream first), a file stream, or a batch
DataFrame — which is how the tests drive them (file/memory sources; the
Kafka connector jar isn't in this image).

The latency job chains two stateful operators (window-agg then breach
counting, W11) — Spark restricts stateful chaining in one query, so
``latency_slo_pipeline`` composes them with foreachBatch: the windowed
aggregate streams in update mode, each micro-batch's finalized rows feed
the stateful breach detector via a loopback memory source.  Simpler and
restriction-free: run the two stages as two queries chained through a
topic/table, exactly like the reference chains Kafka topics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.detect import (ERROR_RATE_THRESHOLD, MIN_SUPPORT,
                                error_rate_alerts, latency_p95)
from ..functions.scalar import incident_id

#: Reference watermark: 5 s bounded out-of-orderness
#: (flink/error_rate_detector.py:134-136).  The 10 s idleness advance
#: (W5) has no direct Spark setting — Spark's watermark only moves when
#: data flows, so an idle source stalls it and open windows never
#: finalize in append mode.  ``with_idle_keepalive`` emulates it.
WATERMARK_DELAY = "5 seconds"

def with_idle_keepalive(spark, stream: DataFrame, *, ts_col: str = "ts",
                        watermark: str = WATERMARK_DELAY,
                        rows_per_second: int = 1) -> DataFrame:
    """W5 (idle-source watermark advance), Spark-style: union a 1-row/s
    rate-source heartbeat carrying the CURRENT processing time as event
    time, so the watermark keeps advancing while the real source is
    idle and open windows finalize instead of hanging forever —
    Flink's "watermark ≈ now − delay while idle" idleness policy
    (flink/error_rate_detector.py:138), which Spark has no setting for.

    Heartbeat rows carry NULL in every non-``ts_col`` column; they flow
    into downstream keyed aggregations as null-key groups, and callers
    drop those groups with a HAVING-style guard on an aggregate that
    skips nulls — ``F.count(<key_col>) > 0`` — NOT with a row-level
    predicate.  Two optimizer traps force this exact shape, both
    verified the hard way:

    - a literal marker column (``lit(True) AS _keepalive`` + pre-agg
      ``filter(~_keepalive)``) constant-folds per union branch and
      PRUNES THE HEARTBEAT SOURCE out of the plan entirely;
    - a key predicate after the aggregation (``service IS NOT NULL``)
      is a grouping-column filter, so Catalyst pushes it below the
      aggregate and the union, where it folds against the heartbeat's
      null literal — same pruning.  An aggregate-derived predicate
      cannot be pushed below the aggregate, and ``count(key)`` is 0 for
      the pure-heartbeat groups.

    Caveat, stated honestly: the heartbeat advances the watermark to
    wall-clock time, so a real source that is not idle but merely
    LAGGING beyond the delay gets its events dropped as late — Flink's
    per-partition idleness marking is finer-grained.  Use this where
    the reference uses idleness (live sources that can go quiet), never
    on historical replays.
    """
    hb = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second).load()
        .select(F.col("timestamp").alias(ts_col))
    )
    for name, dtype in stream.dtypes:
        if name != ts_col:
            hb = hb.withColumn(name, F.lit(None).cast(dtype))
    return (
        stream.unionByName(hb.select(*stream.columns))
        .withWatermark(ts_col, watermark)
    )


def error_rate_stream(logs: DataFrame, *, size: str = "20 seconds",
                      slide: str = "10 seconds",
                      min_support: int = MIN_SUPPORT,
                      threshold: float = ERROR_RATE_THRESHOLD,
                      watermark: str = WATERMARK_DELAY) -> DataFrame:
    """flink/error_rate_detector.py as one streaming query: sliding
    event-time window error rates, min-support + threshold gates, alert
    projection with generated incident ids."""
    alerts = error_rate_alerts(
        logs.withWatermark("ts", watermark),
        size=size, slide=slide, min_support=min_support, threshold=threshold,
    )
    return alerts.withColumn("incident_id", incident_id())


def latency_p95_stream(logs: DataFrame, *, size: str = "1 minute",
                       watermark: str = WATERMARK_DELAY,
                       approx: bool = False) -> DataFrame:
    """First half of flink/latency_slo_monitor.py: tumbling-window exact
    p95 per service.  approx=True switches to percentile_approx (bounded
    state at scale)."""
    return latency_p95(logs.withWatermark("ts", watermark),
                       size=size, approx=approx)


def alert_stream_union(*alert_streams: DataFrame) -> DataFrame:
    """The implicit UNION ALL of both detectors writing one topic
    (SURVEY §2.5): union-by-name with missing columns null-filled."""
    out = alert_streams[0]
    for s in alert_streams[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out


def start_memory_sink(df: DataFrame, name: str, *, output_mode: str = "append",
                      checkpoint: str | None = None):
    """Test/demo sink: named in-memory table, one micro-batch per
    processAllAvailable().  Mirrors the notebooks' foreachBatch console
    sink in spirit (S6) while staying assertable."""
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def dedup_stream(df: DataFrame, keys: list[str], *, ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: one record per key within the watermark
    horizon — the streaming complement of the batch ``dedup_exact``
    operator.

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: with plain
    ``dropDuplicates(keys)`` the watermark only evicts state when the
    event-time column is itself part of the dedup keys — keyed on a guid
    alone, every key ever seen stays in the state store forever, which
    is unbounded state at 100 TB/day (this module shipped exactly that
    bug; tests/test_streaming.py::test_dedup_state_evicted_by_watermark
    now pins eviction via the stateOperators metrics).  The
    WithinWatermark variant expires each key once the watermark passes
    its event time + delay, trading a bounded re-emit window (a
    duplicate arriving later than ``watermark`` after the original is
    treated as new) for bounded state — the correct trade for
    at-least-once sources like the reference's Kafka topics, where
    redelivery happens within seconds, not days.
    """
    return (df.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def alert_metrics_stream(alerts: DataFrame, *, size: str = "1 minute",
                         watermark: str = "2 minutes") -> DataFrame:
    """The alerts-notebook metrics query in streaming form, verbatim
    semantics (alerts nb:123-146): 2-minute watermark, per-service
    tumbling windows, update output mode pairs with a processing-time
    trigger at the caller (W13/W14)."""
    from ..operators.metrics import alert_metrics

    return alert_metrics(alerts.withWatermark("ts", watermark), size=size)


def drain_query(q, *, idle_polls: int = 3, poll_s: float = 0.5,
                timeout_s: float = 120.0) -> None:
    """Synchronously drain a streaming query, then stop it.

    ``processAllAvailable`` never returns for queries with
    ProcessingTimeTimeout state (the periodic timeout-evaluation batches
    keep the query from looking idle), so poll the status until the
    source reports no available data for ``idle_polls`` consecutive
    checks.  Raises on query failure instead of hanging.
    """
    import time as _time

    deadline = _time.monotonic() + timeout_s
    idle = 0
    last_batch = -1
    while idle < idle_polls:
        if q.exception() is not None:
            raise q.exception()
        if _time.monotonic() > deadline:
            q.stop()
            raise TimeoutError("streaming query did not drain in time")
        # stateful (ProcessingTimeTimeout) queries never look idle in
        # status — they run timeout-evaluation batches forever; count
        # consecutive zero-input batches instead.  Non-stateful queries
        # stop producing batches entirely — count idle status polls.
        p = q.lastProgress
        if p is not None and p["batchId"] != last_batch:
            last_batch = p["batchId"]
            idle = idle + 1 if p["numInputRows"] == 0 else 0
        else:
            st = q.status
            if not st["isDataAvailable"] and not st["isTriggerActive"]:
                idle += 1
        _time.sleep(poll_s)
    q.stop()
    q.awaitTermination(30)


def latency_slo_pipeline(logs: DataFrame, *, size: str = "1 minute",
                         agg_query_name: str = "p95_windows"):
    """Stage 1 of the two-stage SLO pipeline (W11 workaround): streams
    windowed p95s into a memory table in update mode.

    Returns the stage-1 StreamingQuery.  Stage 2 — the stateful breach
    detector with its threshold/limit knobs — is run BY THE CALLER over
    the accumulated table (``streaming.state.consecutive_breach_stateful``
    on a stream hop, or its batch twin
    ``operators.escalate.consecutive_breaches``), exactly as the
    reference chains jobs through a topic; this function deliberately
    takes no threshold/limit arguments so nothing is silently ignored.
    """
    agg = latency_p95_stream(logs, size=size)
    return start_memory_sink(agg, agg_query_name, output_mode="update")


def interval_join_streams(left: DataFrame, right: DataFrame, keys: list[str],
                          left_ts: str = "ts", right_ts: str = "ts", *,
                          lookback: str = "1 hour", strict_past: bool = True,
                          watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Stream-stream event-time interval join — Flink's interval join
    (absent from the reference, which chains topics instead; SURVEY §2.5)
    expressed Spark-natively: watermarks on BOTH inputs plus a time-range
    join condition, which is exactly what lets Spark bound the join state
    (each side's buffered rows are evicted once the other side's
    watermark passes their range).

    Emits (l, r) where r[right_ts] ∈ [l[left_ts] - lookback, l[left_ts])
    and all key columns match; the batch twin is
    ``operators.joins.range_join`` (bucketed equi-join), proven
    pair-identical in tests/test_streaming.py.
    """
    l, r = left.withWatermark(left_ts, watermark), \
        right.withWatermark(right_ts, watermark)
    cond = None
    for k in keys:
        c = l[k] == r[k]
        cond = c if cond is None else cond & c
    cond = cond & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {lookback}"))
    cond = cond & ((r[right_ts] < l[left_ts]) if strict_past
                   else (r[right_ts] <= l[left_ts]))
    out = l.join(r, cond)
    for k in keys:
        out = out.drop(r[k])
    return out


def enrich_stream(stream: DataFrame, dim: DataFrame,
                  keys: list[str], *, how: str = "left") -> DataFrame:
    """Stream-static enrichment join (Flink's lookup join): each
    micro-batch joins against the static dimension with an explicit
    broadcast hint — no shuffle of the stream, no state, the dimension
    ships once per executor.

    The static side is re-read per micro-batch by Spark, so a dimension
    backed by a mutable table picks up slowly-changing updates between
    batches; at 100 TB keep it broadcast-sized (or pre-bucket both sides
    and drop the hint).
    """
    return stream.join(F.broadcast(dim), on=keys, how=how)


def anomaly_stream(logs: DataFrame, baseline: DataFrame, *,
                   z: int = 3) -> DataFrame:
    """Streaming latency anomaly scoring against a HISTORICAL baseline:
    the production shape of operators/detect.py:latency_anomalies.  The
    batch operator computes per-(service, day) moment sums and flags
    within the same day; a live stream can't see its own day's full
    distribution, so the streaming twin scores each event against a
    precomputed per-service baseline table (n, s, q moment sums from
    yesterday/last week — the output of the batch op's stats stage),
    broadcast onto the stream.

    Per-event test is the same cross-multiplied integer z-score,
    (n*x - s)^2 > z^2 * (n*q - s^2), evaluated in DECIMAL — stateless,
    so the stream needs no watermark, no aggregation state, and emits
    in append mode with per-event latency (no window close to wait
    for).  The baseline is re-read per micro-batch (stream-static join
    semantics), so rolling the baseline table forward daily takes
    effect without restarting the query.
    """
    cs = logs.filter(F.col("latency_ms").isNotNull()).withColumn(
        "x_cs", F.round(F.col("latency_ms") * 100).cast("decimal(18,0)"))
    j = cs.join(F.broadcast(baseline), ["service"])
    dev = F.col("n") * F.col("x_cs") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        j.withColumn("is_anomaly", (dev * dev) > F.lit(z * z) * var_n2)
        .drop("n", "s", "q", "x_cs")
    )


def latency_baseline(logs: DataFrame, *, key: str = "service") -> DataFrame:
    """The baseline-building stage for :func:`anomaly_stream`: per-key
    moment sums (n, s, q) over a historical window of logs, in the same
    centi-ms DECIMAL arithmetic as the batch detector.  Run as a daily
    batch job over yesterday's partition; output is key-cardinality
    rows, trivially broadcastable."""
    return (
        logs.filter(F.col("latency_ms").isNotNull())
        .withColumn("x_cs",
                    F.round(F.col("latency_ms") * 100).cast("decimal(18,0)"))
        .groupBy(key)
        .agg(
            F.count("*").cast("decimal(18,0)").alias("n"),
            F.sum("x_cs").alias("s"),
            F.sum(F.col("x_cs") * F.col("x_cs")).alias("q"),
        )
    )


def dau_stream(events: DataFrame, *, ts_col: str = "ts",
               user_col: str = "user_id",
               watermark: str = "25 hours") -> DataFrame:
    """Streaming daily-active-users: the streaming twin of the batch
    ``dau_wau`` query's DAU column.  Composition of two stateful ops the
    engine already bounds individually: dropDuplicatesWithinWatermark on
    (user, day) collapses each user's repeat events, then a 1-day
    tumbling window counts survivors in update mode.  Spark 3.4+ allows
    this stateful chaining in update/append because the dedup emits
    append-only rows with intact event time.

    The dedup horizon IS the watermark delay: dropDuplicatesWithinWatermark
    evicts a (user, day) entry once the watermark passes its first event's
    time + delay, so a delay shorter than the day bucket re-emits (and
    double-counts) a user who goes quiet and comes back later the same
    day.  Hence the 25-hour default — a full 24 h bucket span plus 1 h of
    late-arrival slack; equivalence with batch DAU holds only for
    duplicates within that delay (ADVICE r4).  State cost is one entry
    per active user-day held ~one day — the same order as the window
    aggregation itself.

    WAU deliberately has no streaming twin here: a 7-day sliding
    distinct would hold 7x user-day state per window pane; run the
    batch query over the streamed bronze table instead (the standard
    lambda split).
    """
    daily = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.date_trunc("day", F.col(ts_col)).alias("day"),
    )
    deduped = (daily.withWatermark("ts", watermark)
               .dropDuplicatesWithinWatermark(["user_id", "day"]))
    return (
        deduped.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("dau"))
        .select(F.col("w.start").alias("day"), "dau")
    )
