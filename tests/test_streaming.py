"""Structured Streaming semantics tests: streaming results must equal the
batch operators on the same data (batch/stream polymorphism, SURVEY §7.0),
state must persist across micro-batches, and watermarks must drop late
events (W4/W8).

File sources + memory sinks + processAllAvailable() make each test
synchronous and deterministic.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.detect import error_rate_alerts
from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
    consecutive_breaches, escalate_every_nth,
)
from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
    alert_metrics_stream, dedup_stream, drain_query, error_rate_stream,
    start_memory_sink,
)
from realtime_log_analytics_flink_kafka_spark.streaming.state import (
    consecutive_breach_stateful, escalate_every_n_stateful,
)
from tests.fixtures import LOG_SCHEMA, T0, gen_logs


def _write_logs(spark, rows, path, schema=LOG_SCHEMA):
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _read_stream(spark, path, schema=LOG_SCHEMA, per_trigger=None):
    r = spark.readStream.schema(schema)
    if per_trigger:
        r = r.option("maxFilesPerTrigger", per_trigger)
    return r.parquet(path)


def _drain(q):
    drain_query(q)


def test_error_rate_stream_matches_batch(spark, tmp_path):
    rows = gen_logs(n_seconds=90)
    path = str(tmp_path / "logs")
    _write_logs(spark, rows, path)

    stream = error_rate_stream(
        _read_stream(spark, path),
        size="20 seconds", slide="10 seconds", min_support=50, threshold=0.05,
    ).drop("incident_id")  # uuid-based, nondeterministic by design (F1)
    q = start_memory_sink(stream, "er_stream", output_mode="update")
    _drain(q)

    batch = error_rate_alerts(
        spark.read.parquet(path),
        size="20 seconds", slide="10 seconds", min_support=50, threshold=0.05,
    )
    got = {tuple(r) for r in spark.table("er_stream").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_escalation_state_spans_microbatches(spark, tmp_path):
    rows = [r for r in gen_logs(n_seconds=40) if r["is_error"]]
    for r in rows:
        r["severity"] = "HIGH"
    # split on event-time order: the batch twin replays history in event
    # time, so stream arrival order must match for seq-for-seq equality
    rows.sort(key=lambda r: (r["ts"], r["event_id"]))
    mid = len(rows) // 2
    base = tmp_path / "alerts"
    schema = LOG_SCHEMA + ", severity string"
    # two files -> two micro-batches, in event-time order
    _write_logs(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)  # file-source ordering is by modification time
    _write_logs(spark, rows[mid:], str(base / "b=1"), schema)

    stream = escalate_every_n_stateful(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1)
    )
    q = start_memory_sink(stream, "esc_stream")
    _drain(q)

    got = spark.table("esc_stream")
    batch = escalate_every_nth(
        spark.createDataFrame(rows, schema)).select(
        "service", "event_id", "ts", "severity", "escalation_reason",
        F.col("alert_seq").cast("long").alias("alert_seq"))
    g = {tuple(r) for r in got.select(*batch.columns).collect()}
    w = {tuple(r) for r in batch.collect()}
    assert g == w and len(w) > 0
    # counters continued across the batch boundary: seqs are globally
    # consecutive per service, so escalations land at 3, 6, 9, ...
    assert got.filter(F.col("severity") == "ESCALATED").count() > 0


def test_consecutive_breach_stateful_matches_batch(spark, tmp_path):
    # pre-aggregated (service, window) p95 rows: crafted streaks
    win_rows = []
    p95s = {"auth-service": [150, 160, 170, 90, 120, 130, 140, 155],
            "payment-service": [90, 80, 150, 160, 90, 120, 110, 105]}
    for svc, vals in p95s.items():
        for i, v in enumerate(vals):
            win_rows.append({"service": svc, "window_start": i * 60,
                             "window_end": (i + 1) * 60,
                             "p95_latency": float(v)})
    schema = "service string, window_start long, window_end long, p95_latency double"
    path = str(tmp_path / "wins")
    spark.createDataFrame(win_rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(path)

    stream = consecutive_breach_stateful(
        _read_stream(spark, path, schema), limit=3, p95_threshold=100.0)
    q = start_memory_sink(stream, "breach_stream")
    _drain(q)
    got = {(r.service, r.window_start, r.breach_count)
           for r in spark.table("breach_stream").collect()}

    batch = consecutive_breaches(
        spark.createDataFrame(win_rows, schema),
        breach=F.col("p95_latency") > 100.0, limit=3)
    want = {(r.service, r.window_start, r.breach_count) for r in batch.collect()}
    assert got == want
    # auth: breaches at idx 0,1,2 (emit @2), then reset at 3, then 4..7 is a
    # 4-streak -> emit @6
    assert ("auth-service", 2 * 60, 3) in got and ("auth-service", 6 * 60, 3) in got


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicates state spans micro-batches: a duplicate event_id
    redelivered in a later batch is suppressed."""
    from datetime import datetime

    base = tmp_path / "dd"
    rows1 = [dict(event_id=i, ts=datetime(2024, 1, 1, 0, 0, i), service="auth",
                  is_error=1, latency_ms=1.0) for i in range(5)]
    rows2 = ([dict(event_id=3, ts=datetime(2024, 1, 1, 0, 0, 3), service="auth",
                   is_error=1, latency_ms=1.0)]          # exact redelivery
             + [dict(event_id=i, ts=datetime(2024, 1, 1, 0, 0, i), service="auth",
                     is_error=1, latency_ms=1.0) for i in (7, 8)])
    _write_logs(spark, rows1, str(base / "b=0"))
    time.sleep(1.1)
    _write_logs(spark, rows2, str(base / "b=1"))

    out = dedup_stream(
        _read_stream(spark, str(base / "b=*"), per_trigger=1), ["event_id"])
    q = start_memory_sink(out, "dd_stream")
    _drain(q)
    got = sorted(r.event_id for r in spark.table("dd_stream").collect())
    assert got == [0, 1, 2, 3, 4, 7, 8]  # 3 delivered once despite redelivery


def test_throttle_stateful_matches_batch(spark, tmp_path):
    """Streaming alert throttle (keyed state, O(1) per key) emits
    exactly the rows the batch window formulation keeps, across
    micro-batch boundaries: the state (bucket, emitted) must carry over
    so a key's quota is not reset per batch."""
    from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
        throttle_alerts)
    from realtime_log_analytics_flink_kafka_spark.streaming.state import (
        throttle_alerts_stateful)

    base = tmp_path / "thr"
    # 6 alerts for one service inside one hour-bucket, split across two
    # files -> two micro-batches; limit 2 must span the boundary
    rows1 = [dict(event_id=i, ts=datetime(2024, 1, 1, 0, 0, i),
                  service="auth", is_error=1, latency_ms=50.0 + i)
             for i in range(3)]
    rows2 = ([dict(event_id=i, ts=datetime(2024, 1, 1, 0, 10, i),
                   service="auth", is_error=1, latency_ms=50.0 + i)
              for i in range(3, 6)]
             # second bucket: quota resets
             + [dict(event_id=10 + i, ts=datetime(2024, 1, 2, 1, 0, i),
                     service="auth", is_error=1, latency_ms=90.0 + i)
                for i in range(3)])
    _write_logs(spark, rows1, str(base / "b=0"))
    time.sleep(1.1)
    _write_logs(spark, rows2, str(base / "b=1"))

    stream_in = _read_stream(spark, str(base / "b=*"), per_trigger=1).select(
        "service", "ts", "event_id", "latency_ms")
    q = start_memory_sink(
        throttle_alerts_stateful(stream_in, limit=2), "thr_stream")
    _drain(q)
    got = {(r.service, r.bucket_start, r.event_id, r.alert_seq)
           for r in spark.table("thr_stream").collect()}

    batch_in = spark.createDataFrame(rows1 + rows2, LOG_SCHEMA).select(
        "service", "ts", "event_id", "latency_ms")
    want = {(r.service, r.bucket_start, r.event_id, r.alert_seq)
            for r in throttle_alerts(batch_in, limit=2).collect()}
    assert got == want
    # quota spans the micro-batch boundary: day-1 bucket emits ids 0,1
    # only (id 3 arrives in batch 2 but the bucket is exhausted)
    day1 = {eid for (_, b, eid, _) in got if b == 1704067200}
    assert day1 == {0, 1}


def test_dedup_state_evicted_by_watermark(spark, tmp_path):
    """The at-scale property of dropDuplicatesWithinWatermark: dedup
    state is EVICTED once the watermark passes a key's event time +
    delay.  Plain dropDuplicates(guid) under a watermark never evicts
    (the event-time column isn't in the keys), so state grows by one
    entry per unique key forever — at 100 TB/day that is the difference
    between a working job and an OOM.  Asserted via the state-store
    metrics, not inferred from output."""
    base = tmp_path / "ddev"
    rows1 = [dict(event_id=i, ts=datetime(2024, 1, 1, 0, 0, i),
                  service="auth", is_error=1, latency_ms=1.0)
             for i in range(5)]
    # one event a full hour later: watermark (10 min delay) advances to
    # 00:50, far past every batch-1 key's expiry
    rows2 = [dict(event_id=100, ts=datetime(2024, 1, 1, 1, 0, 0),
                  service="auth", is_error=1, latency_ms=1.0)]
    _write_logs(spark, rows1, str(base / "b=0"))
    time.sleep(1.1)
    _write_logs(spark, rows2, str(base / "b=1"))

    out = dedup_stream(
        _read_stream(spark, str(base / "b=*"), per_trigger=1), ["event_id"])
    q = start_memory_sink(out, "ddev_stream")
    _drain(q)
    assert sorted(r.event_id for r in spark.table("ddev_stream").collect()) \
        == [0, 1, 2, 3, 4, 100]
    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress for op in (p["stateOperators"] or [])
    ]
    assert state_rows, "no state-operator metrics captured"
    # batch-1 peak is 5 keys; after the watermark jump the five expire —
    # the final micro-batch holds only the new key (plus nothing stale)
    assert max(state_rows) >= 5
    assert state_rows[-1] <= 2, (
        f"dedup state not evicted by watermark: {state_rows}")


def test_alert_metrics_stream_update_mode(spark, tmp_path):
    """The notebook metrics query under update mode + processing-time
    trigger (W13/W14): streamed result equals the batch operator."""
    from realtime_log_analytics_flink_kafka_spark.operators.metrics import alert_metrics

    rows = [r for r in gen_logs(n_seconds=90) if r["is_error"]]
    for r in rows:
        r["severity"] = "CRITICAL" if r["latency_ms"] > 150 else "HIGH"
        r["type"] = ("LATENCY_SLO_BREACH" if r["latency_ms"] > 150
                     else "ERROR_RATE_SPIKE")
        r["p95_latency"] = int(r["latency_ms"]) if r["latency_ms"] > 150 else None
        r["breach_count"] = 3 if r["latency_ms"] > 150 else None
    schema = (LOG_SCHEMA + ", severity string, type string, "
              "p95_latency int, breach_count int")
    path = str(tmp_path / "alerts")
    _write_logs(spark, rows, path, schema)

    stream = alert_metrics_stream(_read_stream(spark, path, schema))
    q = (stream.writeStream.format("memory").queryName("am_stream")
         .outputMode("update").trigger(processingTime="1 second").start())
    _drain(q)

    got = {tuple(r) for r in spark.table("am_stream").collect()}
    want = {tuple(r) for r in
            alert_metrics(spark.createDataFrame(rows, schema)).collect()}
    assert got == want and len(want) > 0


def test_latency_slo_two_stage_pipeline(spark, tmp_path):
    """W11 (two chained stateful ops) via the topic-chain split: stage 1
    streams windowed p95s; stage 2 runs the stateful breach counter over
    stage 1's output stream — the reference's exact topology
    (flink/latency_slo_monitor.py:139-146) with the Kafka hop replaced by
    a table hop."""
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        latency_slo_pipeline,
    )

    rows = gen_logs(n_seconds=240)  # 4 one-minute windows, spikes at 0 and 60
    path = str(tmp_path / "logs")
    _write_logs(spark, rows, path)
    logs = _read_stream(spark, path)

    q1 = latency_slo_pipeline(logs, size="1 minute",
                              agg_query_name="p95_two_stage")
    _drain(q1)
    wins = spark.table("p95_two_stage") \
        .select("service", "window_start", "window_end",
                F.col("p95_latency").cast("double").alias("p95_latency"))
    assert wins.count() > 0

    hop = str(tmp_path / "hop")
    wins.coalesce(1).write.parquet(hop)
    stream2 = consecutive_breach_stateful(
        _read_stream(spark, hop,
                     "service string, window_start long, window_end long, "
                     "p95_latency double"),
        limit=2, p95_threshold=200.0)
    q2 = start_memory_sink(stream2, "breach_two_stage")
    _drain(q2)

    got = {(r.service, r.window_start) for r in
           spark.table("breach_two_stage").collect()}
    want = {(r.service, r.window_start) for r in consecutive_breaches(
        wins, breach=F.col("p95_latency") > 200.0, limit=2).collect()}
    assert got == want


def test_streaming_session_windows(spark, tmp_path):
    """session_window under streaming (append mode): sessions split on
    the 30 s inactivity gap and match the batch operator."""
    from datetime import datetime

    rows = []
    # user 1: two sessions (gap 60 s); user 2: one session
    for i, (u, s) in enumerate([(1, 0), (1, 5), (1, 10), (1, 70), (1, 75),
                                (2, 0), (2, 20)]):
        rows.append(dict(event_id=i, ts=datetime(2024, 1, 1, 0, 1 + s // 60, s % 60),
                         service=f"u{u}", is_error=0, latency_ms=1.0))
    nudge = [dict(event_id=99, ts=datetime(2024, 1, 1, 1, 0, 0),
                  service="u1", is_error=0, latency_ms=1.0)]
    base = tmp_path / "sess"
    _write_logs(spark, rows, str(base / "b=0"))
    time.sleep(1.1)
    _write_logs(spark, nudge, str(base / "b=1"))
    time.sleep(1.1)
    _write_logs(spark, [dict(event_id=100, ts=datetime(2024, 1, 1, 2, 0, 0),
                             service="u1", is_error=0, latency_ms=1.0)],
                str(base / "b=2"))

    sessions = (
        _read_stream(spark, str(base / "b=*"), per_trigger=1)
        .withWatermark("ts", "5 seconds")
        .groupBy("service", F.session_window("ts", "30 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("service", F.col("w.start").cast("long").alias("ss"), "n")
    )
    q = start_memory_sink(sessions, "sess_stream", output_mode="append")
    _drain(q)
    got = {(r.service, r.ss, r.n) for r in spark.table("sess_stream").collect()}
    t0 = int(datetime(2024, 1, 1, 0, 1).timestamp())
    assert {("u1", t0, 3), ("u1", t0 + 70, 2), ("u2", t0, 2)} <= got


def test_foreach_batch_skips_empty(spark):
    """S6: the notebooks' empty-batch console guard (alerts nb:149-159)."""
    from realtime_log_analytics_flink_kafka_spark.sources.kafka import (
        foreach_batch_non_empty,
    )

    seen = []
    fn = foreach_batch_non_empty(lambda df, epoch: seen.append(epoch))
    fn(spark.range(0), 1)   # empty batch -> skipped
    fn(spark.range(3), 2)   # non-empty -> forwarded
    assert seen == [2]


def test_watermark_drops_late_events(spark, tmp_path):
    from datetime import datetime

    base = tmp_path / "wm"
    schema = LOG_SCHEMA

    def ev(eid, m, s):
        return dict(event_id=eid, ts=datetime(2024, 1, 1, 0, m, s),
                    service="auth-service", is_error=1, latency_ms=50.0)

    # b0: window [0,10) gets 3 events; b1 advances the watermark past the
    # window end; b2's nudge makes the window EMIT (append-mode windows
    # finalize one batch after the watermark passes); b3 then delivers a
    # LATE event for the now-evicted window — Spark only guarantees
    # late-drop after eviction — plus a nudge.
    batches = [
        [ev(i, 0, s) for i, s in enumerate([1, 2, 3, 12, 13])],
        [ev(100, 2, 0)],
        [ev(101, 4, 0)],
        [ev(102, 0, 4), ev(103, 6, 0)],
    ]
    for i, b in enumerate(batches):
        _write_logs(spark, b, str(base / f"b={i}"))
        time.sleep(1.1)  # file-source ordering is by modification time

    counts = (
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1)
        .withWatermark("ts", "5 seconds")
        .groupBy("service", F.window("ts", "10 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("service", F.col("w.start").cast("long").alias("ws"), "n")
    )
    q = start_memory_sink(counts, "wm_counts", output_mode="append",
                          checkpoint=str(tmp_path / "ckpt"))
    _drain(q)
    got = {(r.ws, r.n) for r in spark.table("wm_counts").collect()}
    t0 = int(datetime(2024, 1, 1).timestamp())
    # the late event (00:00:04, arriving after the watermark passed the
    # window end) was dropped: count stays 3, and no amended row appears
    assert (t0, 3) in got
    assert (t0, 4) not in got


def test_interval_join_stream_matches_batch_range_join(spark, tmp_path):
    """Stream-stream interval join emits exactly the pairs the batch
    bucketed range_join finds (clicks in the hour before each error)."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import range_join
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        interval_join_streams, start_memory_sink,
    )

    base = 1_700_000_000  # epoch seconds
    def ev(eid, uid, off_s):
        return (eid, uid, datetime.fromtimestamp(base + off_s, tz=timezone.utc)
                .replace(tzinfo=None))

    err_schema = "error_event_id long, user_id long, ts timestamp"
    clk_schema = "click_event_id long, user_id long, cts timestamp"
    # user 1: clicks at 0s, 1800s, 3599s, 3600s; error at 3600s
    #   -> pairs with clicks at 1800 (in window) and 3599; 0s is exactly
    #      3600s before -> inside closed lower bound; 3600s is not strict past
    # user 2: click after its error only -> no pair
    errors = [ev(100, 1, 3600), ev(200, 2, 100)]
    clicks = [ev(10, 1, 0), ev(11, 1, 1800), ev(12, 1, 3599), ev(13, 1, 3600),
              ev(20, 2, 200)]
    epath, cpath = str(tmp_path / "errs"), str(tmp_path / "clicks")
    spark.createDataFrame(errors, err_schema).write.parquet(epath)
    spark.createDataFrame(clicks, clk_schema).write.parquet(cpath)

    joined = interval_join_streams(
        _read_stream(spark, epath, err_schema),
        _read_stream(spark, cpath, clk_schema),
        ["user_id"], left_ts="ts", right_ts="cts", lookback="1 hour",
    ).select("user_id", "error_event_id", "click_event_id")
    q = start_memory_sink(joined, "ij_stream", output_mode="append")
    _drain(q)
    got = {tuple(r) for r in spark.table("ij_stream").collect()}

    batch = range_join(
        spark.read.parquet(epath).select(
            "user_id", "error_event_id", F.unix_micros("ts").alias("e_us")),
        spark.read.parquet(cpath).select(
            "user_id", "click_event_id", F.unix_micros("cts").alias("c_us")),
        ["user_id"], "e_us", "c_us", lower=-3_600_000_000, upper=-1,
    ).select("user_id", "error_event_id", "click_event_id")
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert (1, 100, 10) in got and (1, 100, 11) in got and (1, 100, 12) in got
    assert (1, 100, 13) not in got and all(u != 2 for u, *_ in got)


def test_checkpoint_recovery_resumes_state(spark, tmp_path):
    """S7 fault-tolerance parity: a checkpointed windowed aggregation,
    stopped mid-stream and restarted, resumes from the offset log and
    produces exactly the batch result — no lost or double-counted rows
    (the Flink jobs checkpoint every 30 s for the same guarantee;
    flink/error_rate_detector.py:116)."""
    from datetime import datetime

    src = str(tmp_path / "cksrc")
    ckpt = str(tmp_path / "ckpt")

    def ev(eid, m, s, err):
        return dict(event_id=eid, ts=datetime(2024, 1, 1, 0, m, s),
                    service="auth-service", is_error=err, latency_ms=50.0)

    first = [ev(i, 0, i, i % 2) for i in range(20)]
    second = [ev(100 + i, 1, i, 1) for i in range(10)]
    _write_logs(spark, first, f"{src}/b=0")
    time.sleep(1.1)

    def counts_stream():
        return (
            _read_stream(spark, f"{src}/b=*", per_trigger=1)
            .groupBy("service", F.window("ts", "1 minute").alias("w"))
            .agg(F.count("*").alias("n"), F.sum("is_error").alias("errs"))
            .select("service", F.col("w.start").cast("long").alias("ws"),
                    "n", "errs")
        )

    def run(name):
        q = (counts_stream().writeStream.format("memory").queryName(name)
             .outputMode("complete").option("checkpointLocation", ckpt)
             .start())
        drain_query(q)

    run("ck_run1")
    assert spark.table("ck_run1").count() == 1  # only minute-0 so far

    _write_logs(spark, second, f"{src}/b=1")  # arrives while query is DOWN
    run("ck_run2")  # restart from the same checkpoint

    got = {(r.ws, r.n, r.errs) for r in spark.table("ck_run2").collect()}
    batch = (
        spark.read.parquet(f"{src}/b=*")
        .groupBy("service", F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("is_error").alias("errs"))
        .select(F.col("w.start").cast("long").alias("ws"), "n", "errs")
    )
    want = {(r.ws, r.n, r.errs) for r in batch.collect()}
    assert got == want and len(want) == 2


def test_stream_static_enrichment_broadcasts(spark, tmp_path):
    """Stream-static lookup join: every micro-batch row is enriched from
    the static dimension without shuffling the stream side."""
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import enrich_stream

    path = str(tmp_path / "enrich_src")
    rows = gen_logs(n_seconds=30)
    _write_logs(spark, rows, path)
    dim = spark.createDataFrame(
        [("auth-service", "team-a", 1), ("payment-service", "team-b", 2),
         ("order-service", "team-c", 3)],
        "service string, owner string, tier int")

    out = enrich_stream(_read_stream(spark, path), dim, ["service"])
    q = start_memory_sink(out, "enriched")
    _drain(q)

    got = spark.table("enriched")
    assert got.count() == len(rows)  # left join keeps unmatched services
    matched = got.filter(F.col("owner").isNotNull())
    assert matched.count() == sum(
        1 for r in rows if r["service"] in
        ("auth-service", "payment-service", "order-service"))
    # single-row spot check: enrichment values came from the dimension
    one = matched.filter(F.col("service") == "auth-service").first()
    assert one.owner == "team-a" and one.tier == 1


def test_synthetic_log_stream_matches_batch_generator(spark):
    """The rate-source producer emits exactly the rows the batch
    generator derives for the same tick ids — the workload is one
    deterministic function of the tick, regardless of source."""
    from realtime_log_analytics_flink_kafka_spark.sources.producer import (
        BASE_EPOCH, synthetic_log_batch, synthetic_log_stream,
    )

    q = start_memory_sink(synthetic_log_stream(spark, rows_per_second=500),
                          "synlogs")
    deadline = time.time() + 20
    while time.time() < deadline and spark.table("synlogs").count() < 200:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    got = spark.table("synlogs").collect()
    assert len(got) >= 200
    n = max(r.ts_s for r in got) - BASE_EPOCH + 1
    want = {tuple(r) for r in synthetic_log_batch(spark, n=n).collect()}
    assert {tuple(r) for r in got} <= want
    svcs = {r.service for r in got}
    assert "auth-service" in svcs and all(r.latency_ms >= 10 for r in got)


def test_idle_keepalive_finalizes_windows(spark, tmp_path):
    """W5: with a finite (then idle) source, append-mode windows past the
    last event never finalize — Spark's watermark only moves with data.
    with_idle_keepalive unions a processing-time heartbeat that advances
    the watermark, so ALL windows (including the final one) emit and the
    result equals the batch aggregation; the pure-heartbeat null-key
    groups are dropped by the count(key) > 0 HAVING guard the helper
    prescribes."""
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        with_idle_keepalive,
    )

    rows = gen_logs(n_seconds=180)  # exactly 3 one-minute windows
    path = str(tmp_path / "logs")
    _write_logs(spark, rows, path)

    def windowed(df):
        # count(service) (not count(*)): null-skipping, so heartbeat
        # groups score 0 and the post-agg guard removes them without a
        # pushable (hence branch-pruning) row-level predicate
        return (
            df.groupBy("service", F.window("ts", "1 minute").alias("w"))
            .agg(F.count("service").alias("n"))
            .select("service", F.col("w.start").cast("long").alias("ws"), "n")
        )

    want = {tuple(r) for r in windowed(spark.read.parquet(path)).collect()}
    assert len(want) == 3 * len({r["service"] for r in rows})

    # the gap: no keepalive -> the last window stays open forever
    plain = windowed(_read_stream(spark, path).withWatermark("ts", "5 seconds"))
    _drain(start_memory_sink(plain, "idle_plain", output_mode="append"))
    got_plain = {tuple(r) for r in spark.table("idle_plain").collect()}
    assert got_plain < want  # strictly missing the unfinalized tail

    # the fix: heartbeat advances the watermark past every event window
    merged = with_idle_keepalive(spark, _read_stream(spark, path),
                                 watermark="5 seconds")
    out = windowed(merged).filter(F.col("n") > 0)
    q = start_memory_sink(out, "idle_alive", output_mode="append")
    deadline = time.monotonic() + 90
    got = set()
    try:
        while time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            got = {tuple(r) for r in spark.table("idle_alive").collect()}
            if got == want:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert got == want


def test_text_operators_are_stream_polymorphic(spark, tmp_path):
    """The stateless text operators are plain DataFrame->DataFrame
    functions, so the SAME code runs on a readStream: quality scoring /
    token stats / fingerprinting over a micro-batched document stream
    produce exactly the batch results.  (The streaming side of the
    'batch/stream-polymorphic operators' claim in operators/__init__.)"""
    from realtime_log_analytics_flink_kafka_spark.operators import text
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs")
    docs.write.parquet(path)

    from realtime_log_analytics_flink_kafka_spark.operators.pii import pii_metrics

    for op in (text.quality_scores, text.token_stats, text.fingerprints,
               pii_metrics):
        stream = spark.readStream.schema(docs.schema).option(
            "maxFilesPerTrigger", 1).parquet(path)
        name = f"poly_{op.__name__}"
        q = op(stream).writeStream.format("memory").queryName(name) \
            .outputMode("append").start()
        _drain(q)
        got = {tuple(r) for r in spark.table(name).collect()}
        want = {tuple(r) for r in op(docs).collect()}
        assert got == want, op.__name__


def test_anomaly_stream_scores_against_static_baseline(spark, tmp_path):
    """Stateless stream-static anomaly scoring: events far outside the
    historical per-service distribution flag, in-distribution events
    don't, and the stream needs no watermark or state."""
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        anomaly_stream, latency_baseline,
    )
    hist_rows = [
        (i, datetime(2024, 1, 1, 12, 0, i, tzinfo=timezone.utc),
         "svc-0", 0, 100.0 + (i % 5)) for i in range(40)
    ]
    history = spark.createDataFrame(hist_rows, LOG_SCHEMA)
    baseline = latency_baseline(history)

    live = [
        (100, datetime(2024, 1, 2, 9, 0, 0, tzinfo=timezone.utc), "svc-0", 0, 102.0),
        (101, datetime(2024, 1, 2, 9, 0, 1, tzinfo=timezone.utc), "svc-0", 0, 9000.0),
        (102, datetime(2024, 1, 2, 9, 0, 2, tzinfo=timezone.utc), "svc-0", 0, 99.0),
    ]
    path = str(tmp_path / "live")
    _write_logs(spark, live, path)

    q = start_memory_sink(
        anomaly_stream(_read_stream(spark, path), baseline),
        "anom_stream")
    _drain(q)
    out = {r["event_id"]: r["is_anomaly"]
           for r in spark.table("anom_stream").collect()}
    assert out == {100: False, 101: True, 102: False}


def test_incremental_dedup_per_microbatch(spark, tmp_path):
    """Daily-ingest dedup as a stream: each micro-batch of new docs is
    LSH-flagged against the static corpus via foreachBatch, so state is
    the (externally stored) corpus index, not stream state."""
    from realtime_log_analytics_flink_kafka_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "completely unrelated corpus document with other words")],
        "doc_id long, text string")

    batches = [
        [(10, "the quick brown fox jumps over the lazy dog again")],
        [(20, "novel fresh content nothing shared with anything")],
    ]
    path = str(tmp_path / "docs")
    spark.createDataFrame(batches[0], "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite").parquet(path)

    flagged = []

    def step(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        rows = dedup.incremental_dedup_flags(corpus, batch_df).collect()
        flagged.extend((r["doc_id"], r["matched_corpus_doc"]) for r in rows)

    stream = spark.readStream.schema("doc_id long, text string").parquet(path)
    q = stream.writeStream.foreachBatch(step) \
        .option("checkpointLocation", str(tmp_path / "ckpt")) \
        .start()
    q.processAllAvailable()
    spark.createDataFrame(batches[1], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(path)
    q.processAllAvailable()
    q.stop()

    assert flagged == [(10, 1)]  # dup flagged; fresh batch doc passed


def test_demo_topology_fires_alerts(spark):
    """The runnable demo (python -m realtime_log_analytics_flink_kafka_spark.demo): producer ->
    both detectors -> union -> foreachBatch, one process, must emit
    alert rows and exit cleanly within a short run."""
    from realtime_log_analytics_flink_kafka_spark import demo

    assert demo.main(duration_s=12, rows_per_second=400) == 0


def test_dau_stream_matches_batch_daily_distinct(spark, tmp_path):
    """dau_stream (dropDuplicatesWithinWatermark -> 1-day window count)
    equals the batch per-day distinct-user count — the chained-stateful
    streaming twin of q_dau_wau's DAU column."""
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import dau_stream

    rows = []
    eid = 0
    # 3 days x 4 users with repeat events; user 3 active day 0 only
    for day in range(3):
        for user in range(4):
            if user == 3 and day > 0:
                continue
            for rep in range(3):  # repeats must collapse
                eid += 1
                rows.append((eid, datetime(2024, 1, 1 + day, 8 + rep), user))
    schema = "event_id long, ts timestamp, user_id long"
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)

    stream = dau_stream(spark.readStream.schema(schema).parquet(path))
    q = (stream.writeStream.format("memory").queryName("dau_stream_t")
         .outputMode("update").trigger(processingTime="1 second").start())
    _drain(q)

    # second micro-batch: users re-activate LATE the same day (>1 h after
    # their first events, spread across days) — the ADVICE-r4 case where
    # a too-short dedup horizon evicts the (user, day) entry between
    # micro-batches and double-counts the user on re-activation.  With
    # the 25 h horizon these must all collapse into the counts above.
    late = [(1000 + i, datetime(2024, 1, 1 + d, 22), u)
            for i, (d, u) in enumerate([(0, 0), (0, 1), (1, 0), (2, 2)])]
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append") \
        .parquet(path)
    _drain(q)

    got = {(r["day"], r["dau"]) for r in
           spark.table("dau_stream_t").collect()}
    want = {(datetime(2024, 1, 1), 4), (datetime(2024, 1, 2), 3),
            (datetime(2024, 1, 3), 3)}
    assert got == want


def test_hll_registers_merge_and_stream(spark, tmp_path):
    """The sketch property that makes HLL the distributed/streaming
    distinct counter: (1) registers over a split corpus merged by MAX
    equal registers over the union (partition-order independence at
    100 TB); (2) a readStream over the same items through
    hll_bucket_rho -> update-mode max aggregation converges to the
    batch register file across micro-batch boundaries."""
    from realtime_log_analytics_flink_kafka_spark.functions.hashing import (
        md5_long,
    )
    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        hll_bucket_rho, hll_registers,
    )

    rows = [("k1", f"a{i}") for i in range(300)]
    rows += [("k2", f"b{i}") for i in range(40)]
    schema = "key string, s string"
    with_h = lambda df: df.select("key", md5_long(F.col("s")).alias("h"))

    full = spark.createDataFrame(rows, schema)
    batch_regs = {(r.key, r.bucket): r.M
                  for r in hll_registers(with_h(full), "key", "h").collect()}

    # (1) mergeability: max-merge of two half-corpus register files
    half_a = spark.createDataFrame(rows[::2], schema)
    half_b = spark.createDataFrame(rows[1::2], schema)
    merged = (
        hll_registers(with_h(half_a), "key", "h")
        .unionAll(hll_registers(with_h(half_b), "key", "h"))
        .groupBy("key", "bucket").agg(F.max("M").alias("M"))
    )
    assert {(r.key, r.bucket): r.M for r in merged.collect()} == batch_regs

    # (2) streaming: two micro-batches, update mode, last emission per
    # (key, bucket) equals the batch OCCUPIED registers (the spine adds
    # the empties read-side)
    base = tmp_path / "items"
    mid = len(rows) // 2
    _write_logs(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write_logs(spark, rows[mid:], str(base / "b=1"), schema)
    stream_regs = (
        hll_bucket_rho(
            with_h(_read_stream(spark, str(base / "b=*"), schema,
                                per_trigger=1)),
            "key", "h")
        .groupBy("key", "bucket").agg(F.max("rho").alias("M"))
    )
    q = (stream_regs.writeStream.format("memory")
         .queryName("hll_stream").outputMode("update").start())
    _drain(q)
    got = (spark.table("hll_stream")
           .groupBy("key", "bucket").agg(F.max("M").alias("M")))
    occupied = {k: v for k, v in batch_regs.items() if v > 0}
    assert {(r.key, r.bucket): r.M for r in got.collect()} == occupied


def test_cms_grid_merges_and_streams(spark, tmp_path):
    """The sketch property that makes Count-Min the distributed/
    streaming frequency sketch (VERDICT r6 #6, the HLL treatment for
    CMS): (1) half-corpus grids merge by cell ADDITION into the
    full-corpus grid (partition-order independence at 100 TB); (2) a
    readStream over the same terms through cms_bucket_rows ->
    update-mode count aggregation converges to the batch grid of
    cms_cells across micro-batch boundaries (counters only grow, so
    the LAST emission per cell is the total)."""
    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        cms_bucket_rows, cms_cells,
    )

    # skewed deterministic corpus: term t_i appears ~500/(i+1) times
    rows = [(f"t{i}",) for i in range(40) for _ in range(500 // (i + 1))]
    schema = "term string"
    full = spark.createDataFrame(rows, schema)
    batch = {(r.row, r.bucket): r.counter
             for r in cms_cells(full, "term").collect()}

    # (1) mergeability: cell-addition of two half-corpus grids
    half_a = cms_cells(spark.createDataFrame(rows[::2], schema), "term")
    half_b = cms_cells(spark.createDataFrame(rows[1::2], schema), "term")
    merged = (half_a.unionAll(half_b)
              .groupBy("row", "bucket")
              .agg(F.sum("counter").cast("long").alias("counter")))
    assert {(r.row, r.bucket): r.counter
            for r in merged.collect()} == batch

    # (2) streaming convergence across two micro-batches
    base = tmp_path / "terms"
    mid = len(rows) // 2
    _write_logs(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write_logs(spark, rows[mid:], str(base / "b=1"), schema)
    grid_stream = (
        cms_bucket_rows(
            _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
            "term")
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("counter"))
    )
    q = (grid_stream.writeStream.format("memory")
         .queryName("cms_stream").outputMode("update").start())
    _drain(q)
    got = (spark.table("cms_stream")
           .groupBy("row", "bucket").agg(F.max("counter").alias("counter")))
    assert {(r.row, r.bucket): r.counter for r in got.collect()} == batch


def test_bloom_bits_stream_union(spark, tmp_path):
    """Bloom completes the streaming-sketch trio (HLL max-merge, CMS
    cell-addition, Bloom set-UNION): the set-bit relation over a
    readStream — stateful Deduplicate in update mode — converges to
    the batch filter across micro-batch boundaries, because set bits
    only ever accumulate."""
    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        bloom_set_bits,
    )

    rows = [("sA", f"t{i}") for i in range(200)] + \
           [("sB", f"u{i}") for i in range(80)]
    schema = "source string, term string"
    full = spark.createDataFrame(rows, schema)
    batch = {(r.source, r.bit)
             for r in bloom_set_bits(full, "term", ("source",)).collect()}

    base = tmp_path / "terms"
    mid = len(rows) // 2
    _write_logs(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write_logs(spark, rows[mid:], str(base / "b=1"), schema)
    stream_bits = bloom_set_bits(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
        "term", ("source",))
    q = (stream_bits.writeStream.format("memory")
         .queryName("bloom_stream").outputMode("update").start())
    _drain(q)
    got = {(r.source, r.bit)
           for r in spark.table("bloom_stream").distinct().collect()}
    assert got == batch


def test_cusum_stream_matches_batch(spark, tmp_path):
    """cusum_drift's streaming decomposition (the error-trend pattern):
    daily error counts as a complete-mode streaming aggregation, the
    CUSUM window identity re-derived from the maintained state —
    equal to the one-shot batch operator because the accumulator is a
    pure function of the (service, day) count table."""
    from datetime import timedelta

    from realtime_log_analytics_flink_kafka_spark.functions.detmath import int_div
    from realtime_log_analytics_flink_kafka_spark.operators.detect import (
        cusum_drift, cusum_from_daily)

    rows, eid = [], 0
    for svc, counts in [("svc-shift", [5] * 6 + [15] * 6),
                        ("svc-flat", [7] * 12)]:
        for d, n in enumerate(counts):
            for i in range(n):
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(days=d, seconds=i),
                    "service": svc,
                    "is_error": 1,
                    "latency_ms": 100.0,
                })
                eid += 1
    path = str(tmp_path / "errlogs")
    _write_logs(spark, rows, path)

    daily_stream = (
        _read_stream(spark, path)
        .groupBy("service", F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    q = start_memory_sink(daily_stream, "cusum_daily", output_mode="complete")
    _drain(q)
    daily = spark.table("cusum_daily").select(
        "service",
        int_div(F.col("w.start").cast("long"), F.lit(86400)).alias("x"),
        "y",
    )
    got = {tuple(r) for r in cusum_from_daily(daily).collect()}
    want = {tuple(r) for r in
            cusum_drift(spark.read.parquet(path)).collect()}
    assert got == want and len(want) == 2
    by_svc = {r[0]: r for r in want}
    assert by_svc["svc-shift"][4] > 0      # n_alarm_days
    assert by_svc["svc-flat"][4] == 0


def test_hdr_cells_stream_converges_to_batch(spark, tmp_path):
    """HDR histogram cells merge by addition, so hdr_cells — a single
    projection+aggregation — runs UNCHANGED on a readStream in update
    mode and its final emission per cell equals the batch histogram
    (the CMS convergence property, for the quantile sketch)."""
    import random

    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        hdr_cells,
    )

    rng = random.Random(13)
    rows = [("svc", rng.randint(1, 10**6)) for _ in range(1_000)]
    schema = "k string, c long"
    batch = {(r.k, r.bucket): r.cnt
             for r in hdr_cells(
                 spark.createDataFrame(rows, schema), "k", "c").collect()}

    base = tmp_path / "vals"
    mid = len(rows) // 2
    _write_logs(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write_logs(spark, rows[mid:], str(base / "b=1"), schema)
    grid = hdr_cells(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
        "k", "c")
    q = (grid.writeStream.format("memory")
         .queryName("hdr_stream").outputMode("update").start())
    _drain(q)
    got = (spark.table("hdr_stream")
           .groupBy("k", "bucket").agg(F.max("cnt").alias("cnt")))
    assert {(r.k, r.bucket): r.cnt for r in got.collect()} == batch


def test_error_trend_stream_matches_batch(spark, tmp_path):
    """error_trend_slope's streaming decomposition: daily error counts
    as a complete-mode streaming aggregation (tiny state: services x
    days), slope re-derived from the maintained state — equal to the
    one-shot batch operator because the four sufficient statistics are
    pure functions of that state."""
    from datetime import timedelta

    from realtime_log_analytics_flink_kafka_spark.functions.detmath import int_div
    from realtime_log_analytics_flink_kafka_spark.operators.detect import (
        DAY_REBASE, error_trend_slope, trend_slope_from_daily)

    # 6 days, deterministic per-day error counts: one rising service,
    # one falling, one flat
    rows, eid = [], 0
    for svc, counts in [("svc-up", [10, 13, 16, 19, 22, 25]),
                        ("svc-down", [40, 35, 30, 25, 20, 15]),
                        ("svc-flat", [7, 7, 7, 7, 7, 7])]:
        for d, n in enumerate(counts):
            for i in range(n):
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(days=d, seconds=i),
                    "service": svc,
                    "is_error": 1,
                    "latency_ms": 100.0,
                })
                eid += 1
    path = str(tmp_path / "errlogs")
    _write_logs(spark, rows, path)

    daily_stream = (
        _read_stream(spark, path)
        .groupBy("service", F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("y"))
    )
    q = start_memory_sink(daily_stream, "trend_daily", output_mode="complete")
    _drain(q)

    daily = spark.table("trend_daily").select(
        "service",
        (int_div(F.col("w.start").cast("long"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x"),
        "y",
    )
    got = {tuple(r) for r in trend_slope_from_daily(daily).collect()}
    want = {tuple(r) for r in
            error_trend_slope(spark.read.parquet(path)).collect()}
    assert got == want and len(want) == 3
    by_svc = {r[0]: r[3] for r in want}
    assert by_svc["svc-up"] == 3.0
    assert by_svc["svc-down"] == -5.0
    assert by_svc["svc-flat"] == 0.0


def test_misra_gries_candidates_superset_across_microbatches(spark, tmp_path):
    """Misra-Gries completes the streaming coverage of the mergeable
    sketch family (VERDICT r7 #5 — CMS/HLL/Bloom/HDR already have
    convergence twins): MG's distributed guarantee is the candidate
    SUPERSET property — every term with global frequency >= num/den is
    a local heavy hitter in at least one input slice (averaging
    argument), so the k-entry summary of SOME slice retains it.  Micro-
    batch boundaries only slice the input further, which can ADD
    candidates but never lose a true heavy hitter.  Gate: (1) the union
    of per-batch candidate emissions over a 3-batch stream contains
    every true >= 1/20 heavy hitter; (2) the exact recount of those
    candidates reproduces frequent_terms' batch output unchanged."""
    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        frequent_terms, misra_gries_candidates,
    )

    # deterministic zipf-ish corpus: t_i appears 600/(i+1) times
    rows = [(f"t{i:02d}",) for i in range(60) for _ in range(600 // (i + 1))]
    schema = "term string"
    num, den = 1, 20
    full = spark.createDataFrame(rows, schema)
    total = len(rows)
    from collections import Counter
    freq = Counter(r[0] for r in rows)
    true_hh = {t for t, c in freq.items() if c * den >= total * num}
    assert 3 <= len(true_hh) <= 15  # fixture sanity: non-trivial set
    batch_exact = {(r.term, r.n, r.total_terms)
                   for r in frequent_terms(full, "term",
                                           num=num, den=den).collect()}

    base = tmp_path / "terms"
    third = len(rows) // 3
    for b, lo in enumerate(range(0, len(rows), third)):
        if b:
            time.sleep(1.1)
        _write_logs(spark, rows[lo:lo + third], str(base / f"b={b}"), schema)
    k = max(1, (2 * den) // num)  # frequent_terms' own k
    cand_stream = misra_gries_candidates(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
        "term", k=k)
    q = (cand_stream.writeStream.format("memory")
         .queryName("mg_stream").outputMode("update").start())
    _drain(q)
    cands = {r.term for r in spark.table("mg_stream").distinct().collect()}

    # (1) superset: no true heavy hitter lost at any batch boundary
    assert true_hh <= cands, sorted(true_hh - cands)

    # (2) exact recount of the streamed candidates == batch output
    cand_df = spark.createDataFrame([(t,) for t in sorted(cands)], schema)
    recount = (full.join(cand_df, "term")
               .groupBy("term").agg(F.count("*").cast("long").alias("n"))
               .crossJoin(full.select(
                   F.count("*").cast("long").alias("total_terms")))
               .filter(F.col("n") * den >= F.col("total_terms") * num))
    assert {(r.term, r.n, r.total_terms)
            for r in recount.collect()} == batch_exact


def test_robust_trend_stream_matches_batch(spark, tmp_path):
    """robust_trend's streaming decomposition (the cusum/trend
    pattern): daily error counts as a complete-mode streaming
    aggregation, Theil-Sen + Mann-Kendall re-derived from the
    maintained state — equal to the one-shot batch operator because
    the statistics are pure functions of the (service, day) table."""
    from datetime import timedelta

    from realtime_log_analytics_flink_kafka_spark.functions.detmath import int_div
    from realtime_log_analytics_flink_kafka_spark.operators.detect import (
        DAY_REBASE, robust_trend, robust_trend_from_daily)

    rows, eid = [], 0
    for svc, counts in [("svc-ramp", [4, 6, 8, 10, 12, 14]),
                        ("svc-spike", [5, 5, 5, 400, 5, 5])]:
        for d, n in enumerate(counts):
            for i in range(n):
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(days=d, seconds=i),
                    "service": svc,
                    "is_error": 1,
                    "latency_ms": 100.0,
                })
                eid += 1
    path = str(tmp_path / "errlogs")
    _write_logs(spark, rows, path)

    daily_stream = (
        _read_stream(spark, path)
        .groupBy("service", F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    q = start_memory_sink(daily_stream, "robust_daily",
                          output_mode="complete")
    _drain(q)
    daily = spark.table("robust_daily").select(
        "service",
        (int_div(F.col("w.start").cast("long"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x"),
        "y",
    )
    got = {tuple(r) for r in robust_trend_from_daily(daily).collect()}
    want = {tuple(r) for r in
            robust_trend(spark.read.parquet(path)).collect()}
    assert got == want and len(want) == 2
    by_svc = {r[0]: r for r in want}
    assert by_svc["svc-ramp"][4] == 2.0      # clean +2/day ramp
    assert by_svc["svc-spike"][4] == 0.0     # spike shrugged off


def test_auc_stream_matches_batch(spark, tmp_path):
    """error_latency_auc's streaming decomposition: per-(service, day,
    score-bucket) pos/neg counts are MERGEABLE sums, maintained as a
    streaming aggregation; the exact Mann-Whitney AUC re-derived from
    that state (queries/advanced.auc_from_buckets) equals the one-shot
    batch statistic — the same maintained-state-then-recompute twin
    contract as cusum/robust_trend."""
    from datetime import timedelta

    from realtime_log_analytics_flink_kafka_spark.functions.detmath import int_div
    from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
        AUC_SCORE_SCALE, auc_from_buckets)

    rows, eid = [], 0
    # svc-sep: errors strictly slower than successes -> AUC 1.0
    # svc-mix: interleaved latencies -> a mid AUC, exercises ties too
    for svc, lat_err, lat_ok in [
            ("svc-sep", [200.0, 210.5, 305.25], [10.0, 20.0, 30.0, 40.0]),
            ("svc-mix", [50.0, 100.0, 100.0], [50.0, 75.0, 150.0, 100.0])]:
        for is_err, lats in ((1, lat_err), (0, lat_ok)):
            for j, lat in enumerate(lats):
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(seconds=10 * j),
                    "service": svc,
                    "is_error": is_err,
                    "latency_ms": lat,
                })
                eid += 1
    path = str(tmp_path / "auclogs")
    _write_logs(spark, rows, path)

    day = int_div(F.unix_timestamp("ts"), F.lit(86400)).alias("day")
    bucket = F.floor(F.col("latency_ms") * AUC_SCORE_SCALE) \
        .cast("long").alias("b")
    bk_stream = (
        _read_stream(spark, path)
        .groupBy("service", day, bucket)
        .agg(F.sum("is_error").cast("long").alias("pos"),
             (F.count("*") - F.sum("is_error")).cast("long").alias("neg"))
    )
    q = start_memory_sink(bk_stream, "auc_buckets", output_mode="complete")
    _drain(q)

    got = {tuple(r) for r in
           auc_from_buckets(spark.table("auc_buckets")).collect()}
    batch_bk = (spark.read.parquet(path)
                .groupBy("service", day, bucket)
                .agg(F.sum("is_error").cast("long").alias("pos"),
                     (F.count("*") - F.sum("is_error")).cast("long")
                     .alias("neg")))
    want = {tuple(r) for r in auc_from_buckets(batch_bk).collect()}
    assert got == want and len(want) == 2
    by_svc = {r[0]: r for r in want}
    assert by_svc["svc-sep"][6] == 1.0          # perfect separation
    # svc-mix by hand: pos lat (50,100,100) vs neg (50,75,100,150):
    # concordant (err slower) = 0 + 2 + 2 = 4; ties = 1 + 1 + 1 = 3
    assert by_svc["svc-mix"][4] == 4 and by_svc["svc-mix"][5] == 3
    assert by_svc["svc-mix"][6] == (2 * 4 + 3) / (2 * 3 * 4)


def test_holt_stream_matches_batch(spark, tmp_path):
    """holt_forecast's streaming decomposition: the daily error counts
    are maintained as a complete-mode streaming aggregation and the
    Holt recurrence re-folded from that state (the cusum/robust_trend
    twin contract — the statistic is a pure function of the (service,
    day) table, so maintained state + refold == one-shot batch)."""
    from datetime import timedelta

    from realtime_log_analytics_flink_kafka_spark.functions.detmath import int_div
    from realtime_log_analytics_flink_kafka_spark.operators.detect import (
        DAY_REBASE, holt_forecast, holt_from_daily)

    rows, eid = [], 0
    for svc, counts in [("svc-ramp", [4, 6, 8, 10, 12, 14]),
                        ("svc-level", [9, 9, 9, 9, 9])]:
        for d, n in enumerate(counts):
            for i in range(n):
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(days=d, seconds=i),
                    "service": svc,
                    "is_error": 1,
                    "latency_ms": 100.0,
                })
                eid += 1
    path = str(tmp_path / "holtlogs")
    _write_logs(spark, rows, path)

    daily_stream = (
        _read_stream(spark, path)
        .groupBy("service", F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    q = start_memory_sink(daily_stream, "holt_daily", output_mode="complete")
    _drain(q)
    daily = spark.table("holt_daily").select(
        "service",
        (int_div(F.col("w.start").cast("long"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x"),
        "y",
    )
    got = {tuple(r) for r in holt_from_daily(daily).collect()}
    want = {tuple(r) for r in
            holt_forecast(spark.read.parquet(path)).collect()}
    assert got == want and len(want) == 2
    by_svc = {r[0]: r for r in want}
    # a constant series smooths to itself: level == y, trend == 0
    assert by_svc["svc-level"][2] == 9.0 and by_svc["svc-level"][3] == 0.0
    assert by_svc["svc-level"][5] == 0.0   # zero one-step SSE


def test_acf_stream_matches_batch(spark, tmp_path):
    """acf_daily's streaming decomposition: the daily error counts are
    maintained as a complete-mode streaming aggregation and the ACF
    sufficient statistics re-folded from that state (the cusum/holt
    twin contract — the statistic is a pure function of the (service,
    day) table, so maintained state + refold == one-shot batch)."""
    from datetime import timedelta

    from realtime_log_analytics_flink_kafka_spark.functions.detmath import int_div
    from realtime_log_analytics_flink_kafka_spark.operators.detect import (
        DAY_REBASE, acf_daily, acf_from_daily)

    rows, eid = [], 0
    for svc, counts in [("svc-alt", [4, 9, 4, 9, 4, 9]),
                        ("svc-ramp", [2, 4, 6, 8])]:
        for d, n in enumerate(counts):
            for i in range(n):
                rows.append({
                    "event_id": eid,
                    "ts": T0 + timedelta(days=d, seconds=i),
                    "service": svc,
                    "is_error": 1,
                    "latency_ms": 100.0,
                })
                eid += 1
    path = str(tmp_path / "acflogs")
    _write_logs(spark, rows, path)

    daily_stream = (
        _read_stream(spark, path)
        .groupBy("service", F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("long").alias("y"))
    )
    q = start_memory_sink(daily_stream, "acf_daily_state",
                          output_mode="complete")
    _drain(q)
    daily = spark.table("acf_daily_state").select(
        "service",
        (int_div(F.col("w.start").cast("long"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x"),
        "y",
    )
    got = {tuple(r) for r in acf_from_daily(daily).collect()}
    want = {tuple(r) for r in acf_daily(spark.read.parquet(path)).collect()}
    assert got == want and len(want) == 6  # 2 services x 3 lags
    alt1 = next(r for r in want if r[0] == "svc-alt" and r[1] == 1)
    assert alt1[4] < 0  # alternating series anti-correlates at lag 1


def test_sequence_match_stream_matches_batch(spark, tmp_path):
    """CEP streaming twin: the keyed last-k ring in
    match_sequence_stateful must emit exactly the batch matcher's rows,
    including matches that SPAN micro-batches (the second error and the
    purchase arriving in later files than the first error)."""
    from datetime import datetime, timedelta

    from realtime_log_analytics_flink_kafka_spark.operators.sequences import (
        match_sequence, match_sequence_stateful)

    pat = ("error", "error", "purchase")
    t0 = datetime(2024, 1, 1)
    # user 1: full match split across files; user 2: broken by an
    # in-alphabet purchase; user 3: match over the time bound
    rows = [
        (0, t0, 1, "error"), (1, t0 + timedelta(seconds=5), 1, "view"),
        (2, t0 + timedelta(seconds=10), 1, "error"),
        (3, t0 + timedelta(seconds=20), 1, "purchase"),
        (10, t0, 2, "error"), (11, t0 + timedelta(seconds=5), 2, "purchase"),
        (12, t0 + timedelta(seconds=10), 2, "error"),
        (13, t0 + timedelta(seconds=20), 2, "purchase"),
        (20, t0, 3, "error"), (21, t0 + timedelta(seconds=10), 3, "error"),
        (22, t0 + timedelta(seconds=5000), 3, "purchase"),
    ]
    schema = ("event_id long, ts timestamp, user_id long,"
              " event_type string")
    path = str(tmp_path / "seqev")
    # one file per event-time third, so the user-1 match spans batches
    df = spark.createDataFrame(rows, schema)
    for i, cut in enumerate([(0, 6), (6, 15), (15, 10**6)]):
        (df.filter((F.col("ts") >= t0 + timedelta(seconds=cut[0]))
                   & (F.col("ts") < t0 + timedelta(seconds=cut[1])))
         .coalesce(1).write.mode("overwrite")
         .parquet(f"{path}/part{i}"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{path}/part*"))
    out = match_sequence_stateful(stream, pattern=pat, window_s=60)
    q = start_memory_sink(out, "seq_matches", output_mode="append")
    _drain(q)
    got = {tuple(r) for r in spark.table("seq_matches").collect()}
    want = {tuple(r) for r in
            match_sequence(spark.read.parquet(f"{path}/part*"),
                           pattern=pat, window_s=60).collect()}
    assert got == want
    assert len(want) == 1 and next(iter(want))[0] == 1  # only user 1


def test_sequence_match_stream_drops_late(spark, tmp_path):
    """Late cross-batch arrival: an event OLDER than the ring's newest
    must be dropped, not appended — appending would let the ring spell
    the pattern over a non-monotonic timestamp sequence and emit a
    spurious match with NEGATIVE duration (user 4 below: two errors in
    batch 0, then a purchase from BEFORE them in batch 1).  The batch
    matcher, which sorts by event time, finds no match for that user.
    An in-order cross-batch match (user 5) must still emit."""
    import os
    from datetime import datetime, timedelta

    from realtime_log_analytics_flink_kafka_spark.operators.sequences import (
        match_sequence, match_sequence_stateful)

    pat = ("error", "error", "purchase")
    t0 = datetime(2024, 1, 1)
    schema = ("event_id long, ts timestamp, user_id long,"
              " event_type string")
    path = str(tmp_path / "seqlate")
    # batch 0: user 4's two errors (t+10, t+20) and user 5's two errors;
    # batch 1: user 4's LATE purchase (t+5 — older than both buffered
    # errors) and user 5's in-order purchase (t+30).
    batches = [
        [(40, t0 + timedelta(seconds=10), 4, "error"),
         (41, t0 + timedelta(seconds=20), 4, "error"),
         (50, t0 + timedelta(seconds=1), 5, "error"),
         (51, t0 + timedelta(seconds=2), 5, "error")],
        [(42, t0 + timedelta(seconds=5), 4, "purchase"),
         (52, t0 + timedelta(seconds=30), 5, "purchase")],
    ]
    for i, rows in enumerate(batches):
        f = f"{path}/part{i}"
        (spark.createDataFrame(rows, schema)
         .coalesce(1).write.mode("overwrite").parquet(f))
        # file-source batch order follows mtime; pin it explicitly
        for name in os.listdir(f):
            os.utime(os.path.join(f, name), (1_700_000_000 + i * 10,) * 2)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{path}/part*"))
    out = match_sequence_stateful(stream, pattern=pat, window_s=60)
    q = start_memory_sink(out, "seq_late", output_mode="append")
    _drain(q)
    got = {tuple(r) for r in spark.table("seq_late").collect()}
    want = {tuple(r) for r in
            match_sequence(spark.read.parquet(f"{path}/part*"),
                           pattern=pat, window_s=60).collect()}
    assert all(r[3] >= 0 for r in got)  # no negative durations, ever
    assert {r[0] for r in got} == {5}   # user 4's late match dropped
    # streaming may only MISS late matches, never invent rows
    assert got <= want and next(iter(got))[3] == 29_000_000
