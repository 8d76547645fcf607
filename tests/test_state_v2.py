"""Native transformWithStateInPandas operators (streaming/state_v2).

Two layers:

1. Direct-drive unit tests (always run): the StatefulProcessor logic —
   counter continuity, emit-and-clear, Arrow-chunk ordering — executed
   against a fake state handle, so the ported semantics are proven even
   where the TWS runtime can't start.
2. Integration tests (skipif not HAS_TWS): cross-micro-batch equality
   with the batch twins and NATIVE TTL expiry.  Since round 5 these RUN
   on this image — the repo vendors the pure-python protobuf runtime the
   TWS state client needs (vendor/google/protobuf, wired up by
   vendor_support.ensure_protobuf before the JVM starts).
"""

from __future__ import annotations

import time
from datetime import datetime

import pandas as pd
import pytest

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.streaming import state_v2

LOG_SCHEMA = ("event_id long, ts timestamp, service string, is_error int, "
              "latency_ms double")


# --- layer 1: direct-drive of the processor logic ---------------------------

class FakeValueState:
    def __init__(self):
        self.value = None
        self.ttl_ms = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = v

    def clear(self):
        self.value = None


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        s = self.states.setdefault(name, FakeValueState())
        s.ttl_ms = ttlDurationMs
        return s


def _alerts_pdf(ids, severity="HIGH"):
    return pd.DataFrame({
        "event_id": list(ids),
        "ts": [pd.Timestamp(2024, 1, 1, 0, 0, i % 60) for i in ids],
        "service": "auth",
        "is_error": 1,
        "latency_ms": 50.0,
        "severity": severity,
    })


def test_escalate_processor_counts_across_batches_and_chunks():
    p = state_v2._EscalateEveryN(3, 3_600_000)
    h = FakeHandle()
    p.init(h)
    assert h.states["count"].ttl_ms == 3_600_000  # native TTL requested

    # micro-batch 1 split across two UNORDERED Arrow chunks: rows 3,4
    # arrive in the first chunk — concat-then-sort must still number
    # them 1..5 in event-time order
    out1 = pd.concat(list(p.handleInputRows(
        ("auth",), iter([_alerts_pdf([3, 4]), _alerts_pdf([0, 1, 2])]), None)))
    assert list(out1.sort_values("event_id")["alert_seq"]) == [1, 2, 3, 4, 5]
    assert list(out1.sort_values("event_id")["severity"]) == [
        "HIGH", "HIGH", "ESCALATED", "HIGH", "HIGH"]

    # micro-batch 2 continues the counter: seq 6 escalates
    out2 = pd.concat(list(p.handleInputRows(
        ("auth",), iter([_alerts_pdf([10])]), None)))
    assert list(out2["alert_seq"]) == [6]
    assert list(out2["severity"]) == ["ESCALATED"]
    assert h.states["count"].get() == (6,)


def test_breach_processor_emit_and_clear_across_batches():
    p = state_v2._ConsecutiveBreach(3, 100.0)
    h = FakeHandle()
    p.init(h)
    assert h.states["streak"].ttl_ms is None  # reference has no TTL here

    def wins(vals, start):
        return pd.DataFrame({
            "service": "auth",
            "window_start": [start + i * 60 for i in range(len(vals))],
            "window_end": [start + (i + 1) * 60 for i in range(len(vals))],
            "p95_latency": [float(v) for v in vals],
        })

    # 2 breaches, then the batch ends mid-streak
    out1 = list(p.handleInputRows(("auth",), iter([wins([150, 160], 0)]), None))
    assert out1 == [] and h.states["streak"].get() == (2,)
    # 3rd breach arrives next batch -> emit with count 3, clear; the
    # healthy 90-window then keeps it cleared
    out2 = pd.concat(list(p.handleInputRows(
        ("auth",), iter([wins([170, 90], 120)]), None)))
    assert list(out2["breach_count"]) == [3]
    assert list(out2["window_start"]) == [120]
    assert h.states["streak"].get() == (0,)


def test_throttle_processor_quota_spans_chunks_and_batches():
    p = state_v2._ThrottleAlerts(2, 86_400, 3_600_000)
    h = FakeHandle()
    p.init(h)
    assert h.states["throttle"].ttl_ms == 3_600_000

    def alerts(ids, day=1):
        return pd.DataFrame({
            "event_id": list(ids),
            "ts": [pd.Timestamp(2024, 1, day, 0, 0, i % 60) for i in ids],
            "service": "auth",
            "latency_ms": 50.0,
        })

    # batch 1 split across chunks, out of order: quota 2 must go to the
    # two EARLIEST alerts (0, 1), not first-chunk arrivals
    out1 = pd.concat(list(p.handleInputRows(
        ("auth",), iter([alerts([2, 3]), alerts([0, 1])]), None)))
    assert sorted(out1["event_id"]) == [0, 1]
    assert h.states["throttle"].get() == (19723, 2)  # bucket, exhausted

    # batch 2 same day-bucket: quota already spent -> nothing
    assert list(p.handleInputRows(("auth",), iter([alerts([7])]), None)) == []
    # next day: bucket advances, quota resets
    out3 = pd.concat(list(p.handleInputRows(
        ("auth",), iter([alerts([10, 11, 12], day=2)]), None)))
    assert sorted(out3["event_id"]) == [10, 11]
    assert list(out3.sort_values("event_id")["alert_seq"]) == [1, 2]


def test_dispatchers_follow_session_capability(spark):
    """The *_stream dispatchers pick the native TWS plan only when BOTH
    the runtime (protobuf, Spark 4) and the session's RocksDB state store
    are available; otherwise they return the working
    applyInPandasWithState emulation rather than a plan that fails at
    start()."""
    df = (spark.readStream.format("rate").load()
          .selectExpr("value AS event_id", "timestamp AS ts",
                      "'auth' AS service", "1 AS is_error",
                      "50.0 AS latency_ms", "'HIGH' AS severity"))

    def analyzed():
        return state_v2.escalate_every_n_stream(df)._jdf \
            .queryExecution().analyzed().toString()

    # this session has the default HDFS-backed store -> emulation
    assert "FlatMapGroupsInPandasWithState" in analyzed()

    if not state_v2.HAS_TWS:
        pytest.skip("no TWS runtime; native direction untestable")
    key, value = state_v2.rocksdb_conf()
    spark.conf.set(key, value)
    try:
        assert "TransformWithStateInPySpark" in analyzed()
    finally:
        spark.conf.unset(key)


# --- layer 2: full TWS runtime (needs protobuf) -----------------------------

pytestmark_integration = pytest.mark.skipif(
    not state_v2.HAS_TWS,
    reason="transformWithStateInPandas runtime needs Spark >= 4 plus a "
           "protobuf runtime (native or repo-vendored); processor logic "
           "covered by the direct-drive tests above")


@pytest.fixture()
def rocksdb(spark):
    key, value = state_v2.rocksdb_conf()
    prev = spark.conf.get(key, None)
    spark.conf.set(key, value)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _write(spark, rows, path, schema):
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _read_stream(spark, path, schema, per_trigger=None):
    r = spark.readStream.schema(schema)
    if per_trigger:
        r = r.option("maxFilesPerTrigger", per_trigger)
    return r.parquet(path)


@pytestmark_integration
def test_tws_escalation_spans_microbatches(spark, tmp_path, rocksdb):
    from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
        escalate_every_nth)
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        drain_query, start_memory_sink)

    schema = LOG_SCHEMA + ", severity string"
    rows = [dict(event_id=i, ts=datetime(2024, 1, 1, 0, 0, i),
                 service="auth" if i % 2 else "pay", is_error=1,
                 latency_ms=50.0, severity="HIGH") for i in range(14)]
    rows.sort(key=lambda r: (r["ts"], r["event_id"]))
    mid = len(rows) // 2
    base = tmp_path / "alerts"
    _write(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write(spark, rows[mid:], str(base / "b=1"), schema)

    stream = state_v2.escalate_every_n_tws(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1))
    q = start_memory_sink(stream, "tws_esc")
    drain_query(q)

    batch = escalate_every_nth(spark.createDataFrame(rows, schema)).select(
        "service", "event_id", "ts", "severity", "escalation_reason",
        F.col("alert_seq").cast("long").alias("alert_seq"))
    got = {tuple(r) for r in
           spark.table("tws_esc").select(*batch.columns).collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


@pytestmark_integration
def test_tws_breach_spans_microbatches(spark, tmp_path, rocksdb):
    """A breach streak split across micro-batches still emits at the
    3rd consecutive over-SLO window, matching the batch
    gaps-and-islands twin row for row."""
    from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
        consecutive_breaches)
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        drain_query, start_memory_sink)

    schema = ("service string, window_start long, window_end long, "
              "p95_latency double")
    # auth: breach, breach | breach (emit), ok, breach...; pay: never 3
    vals = {"auth": [150, 160, 170, 90, 180, 190, 200],
            "pay": [150, 90, 160, 170, 95, 180, 185]}
    rows = [dict(service=s, window_start=i * 60, window_end=(i + 1) * 60,
                 p95_latency=float(v))
            for s, seq in vals.items() for i, v in enumerate(seq)]
    rows.sort(key=lambda r: r["window_start"])
    mid = len(rows) // 2
    base = tmp_path / "wins"
    _write(spark, rows[:mid], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write(spark, rows[mid:], str(base / "b=1"), schema)

    stream = state_v2.consecutive_breach_tws(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
        limit=3, p95_threshold=100.0)
    q = start_memory_sink(stream, "tws_breach")
    drain_query(q)

    batch = consecutive_breaches(
        spark.createDataFrame(rows, schema),
        breach=F.col("p95_latency") > 100.0, limit=3,
    ).select("service", "window_start", "window_end", "p95_latency",
             "breach_count", "type", "severity")
    got = {tuple(r) for r in
           spark.table("tws_breach").select(*batch.columns).collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0


@pytestmark_integration
def test_tws_throttle_spans_microbatches(spark, tmp_path, rocksdb):
    """The per-(service, day) quota is state: spent in batch 1, a
    same-day batch 2 emits nothing, the next day resets — matching the
    batch windowed-rank twin."""
    from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
        throttle_alerts)
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        drain_query, start_memory_sink)

    schema = "service string, event_id long, ts timestamp, latency_ms double"

    def alerts(ids, day):
        return [dict(service="auth", event_id=i,
                     ts=datetime(2024, 1, day, 0, 0, i % 60),
                     latency_ms=50.0) for i in ids]

    day1, day1b, day2 = (alerts(range(3), 1), alerts(range(5, 8), 1),
                         alerts(range(10, 13), 2))
    base = tmp_path / "alerts"
    _write(spark, day1, str(base / "b=0"), schema)
    time.sleep(1.1)
    # batch 2: MORE same-day alerts (quota already spent) + next day
    _write(spark, day1b + day2, str(base / "b=1"), schema)

    stream = state_v2.throttle_alerts_tws(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
        limit=2)
    q = start_memory_sink(stream, "tws_throttle")
    drain_query(q)

    got = {(r.service, r.bucket_start, r.event_id, r.alert_seq)
           for r in spark.table("tws_throttle").collect()}
    batch = throttle_alerts(
        spark.createDataFrame(day1 + day1b + day2, schema), limit=2)
    want = {(r.service, r.bucket_start, r.event_id, r.alert_seq)
            for r in batch.collect()}
    assert got == want and len(want) == 4  # 2 per day


@pytestmark_integration
def test_tws_event_transitions_span_microbatches(spark, tmp_path, rocksdb):
    """The last-event ValueState carries across micro-batches: the
    boundary-crossing (click -> purchase) pair is emitted even though
    its two events arrive in different batches."""
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        drain_query, start_memory_sink)

    schema = "user_id long, event_id long, ts timestamp, event_type string"
    seq = ["view", "click", "purchase", "view"]
    rows = [dict(user_id=7, event_id=i, ts=datetime(2024, 1, 1, 0, 0, i),
                 event_type=t) for i, t in enumerate(seq)]
    base = tmp_path / "events"
    _write(spark, rows[:2], str(base / "b=0"), schema)
    time.sleep(1.1)
    _write(spark, rows[2:], str(base / "b=1"), schema)

    stream = state_v2.event_transitions_tws(
        _read_stream(spark, str(base / "b=*"), schema, per_trigger=1))
    q = start_memory_sink(stream, "tws_trans")
    drain_query(q)

    got = [(r.from_type, r.to_type) for r in
           spark.table("tws_trans").orderBy("ts").collect()]
    assert got == [("view", "click"), ("click", "purchase"),
                   ("purchase", "view")]


@pytestmark_integration
def test_tws_native_ttl_expires_counter(spark, tmp_path, rocksdb):
    """W9 TTL on the NATIVE API: the value state written in batch 1
    expires after ttl_ms of wall-clock, so batch 2's sequence restarts
    at 1 — no processing-time-timeout emulation involved.

    The sink is a parquet file sink because the second run restarts
    FROM THE SAME CHECKPOINT (that is the whole point — state must
    survive the restart and then be expired by the store, not lost with
    the query) and the memory sink refuses checkpoint recovery.
    """
    from realtime_log_analytics_flink_kafka_spark.streaming.jobs import (
        drain_query)

    schema = LOG_SCHEMA + ", severity string"
    base = tmp_path / "ttl"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def alerts(ids, minute):
        return [dict(event_id=i, ts=datetime(2024, 1, 1, 0, minute, i % 60),
                     service="auth", is_error=1, latency_ms=50.0,
                     severity="HIGH") for i in ids]

    def run_once():
        stream = state_v2.escalate_every_n_tws(
            _read_stream(spark, str(base / "b=*"), schema, per_trigger=1),
            ttl_ms=1_500)
        q = (stream.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt).outputMode("append")
             .start())
        drain_query(q)

    _write(spark, alerts(range(4), 0), str(base / "b=0"), schema)
    run_once()
    got = spark.read.parquet(out)
    assert sorted(r.alert_seq for r in got.collect()) == [1, 2, 3, 4]

    time.sleep(2.5)  # let the TTL lapse in wall-clock
    _write(spark, alerts(range(100, 103), 2), str(base / "b=1"), schema)
    run_once()
    # counter restarted at 1, NOT 5..7: the state expired in the store
    new = spark.read.parquet(out).where(F.col("event_id") >= 100)
    assert sorted(r.alert_seq for r in new.collect()) == [1, 2, 3]


class TestEventTransitionsDirect:
    """Direct-drive of _EventTransitions: last-event continuity across
    micro-batches and Arrow chunks, and count-equivalence with the batch
    transition matrix."""

    def _events_pdf(self, ids, types):
        return pd.DataFrame({
            "event_id": list(ids),
            "ts": [pd.Timestamp(2024, 1, 1, 0, 0, i % 60) for i in ids],
            "event_type": list(types),
        })

    def _drive(self, proc, key, batches):
        out = []
        for chunks in batches:
            for pdf in proc.handleInputRows(key, iter(chunks), None):
                out.extend(pdf.to_dict("records"))
        return out

    def test_transitions_span_micro_batches(self):
        proc = state_v2._EventTransitions(ttl_ms=3_600_000)
        proc.init(FakeHandle())
        out = self._drive(proc, ("u1",), [
            [self._events_pdf([1, 2], ["view", "click"])],
            [self._events_pdf([3], ["purchase"])],
        ])
        assert [(r["from_type"], r["to_type"]) for r in out] == \
            [("view", "click"), ("click", "purchase")]

    def test_chunk_split_preserves_event_time_order(self):
        proc = state_v2._EventTransitions(ttl_ms=3_600_000)
        proc.init(FakeHandle())
        # one micro-batch arriving as two Arrow chunks, out of order
        out = self._drive(proc, ("u1",), [[
            self._events_pdf([3], ["error"]),
            self._events_pdf([1, 2], ["view", "click"]),
        ]])
        assert [(r["from_type"], r["to_type"]) for r in out] == \
            [("view", "click"), ("click", "error")]

    def test_first_event_emits_nothing(self):
        proc = state_v2._EventTransitions(ttl_ms=3_600_000)
        proc.init(FakeHandle())
        out = self._drive(proc, ("u1",),
                          [[self._events_pdf([1], ["signup"])]])
        assert out == []

    def test_count_equivalence_with_batch_matrix(self, spark):
        """Σ streaming pairs grouped by (from, to) == the batch query's
        n_transitions, for a multi-user stream split across batches."""
        from collections import Counter

        seqs = {
            "u1": ["view", "click", "view", "purchase", "view"],
            "u2": ["signup", "view", "view", "click"],
        }
        emitted = Counter()
        for u, types in seqs.items():
            proc = state_v2._EventTransitions(ttl_ms=3_600_000)
            proc.init(FakeHandle())
            ids = list(range(1, len(types) + 1))
            # feed one event per micro-batch — worst case for continuity
            for i, t in zip(ids, types):
                for r in self._drive(proc, (u,),
                                     [[self._events_pdf([i], [t])]]):
                    emitted[(r["from_type"], r["to_type"])] += 1
        expected = Counter()
        for types in seqs.values():
            for a, b in zip(types, types[1:]):
                expected[(a, b)] += 1
        assert emitted == expected
