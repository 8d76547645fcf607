"""Native Spark 4 ``transformWithStateInPandas`` ports of the keyed-state
operators (SURVEY §2.6 W9/W10) — the API the applyInPandasWithState
versions in streaming/state.py emulate.

What the native API buys over the 3.x emulation:

- REAL state TTL: ``getValueState(..., ttlDurationMs=...)`` expires the
  value in the state store itself (matching Flink's OnCreateAndWrite TTL,
  flink/incident_aggregator.py:27-33, re-armed on every update) instead
  of a processing-time timeout callback that only fires when a
  micro-batch happens to run — and the stream no longer needs an armed
  timeout to stay drainable (streaming/jobs.py:drain_query exists for
  exactly that workaround).
- Typed state handles (value/list/map) on RocksDB, so per-key state
  scales past executor memory.

The 3.x ``applyInPandasWithState`` twins in streaming/state.py stay as
the fallback path for Spark < 4 — or for images whose Python environment
lacks ``protobuf`` (the TWS worker's state client requires it).  This
repo additionally vendors the pure-python protobuf runtime
(``vendor/google/protobuf``, wired up by
:func:`..vendor_support.ensure_protobuf`), so on this image the NATIVE
path runs and the integration tests in tests/test_state_v2.py execute
for real — cross-micro-batch counter continuity and state-store TTL
expiry across a checkpoint restart included.  Pick per environment via
:func:`escalate_every_n_stream` / :func:`consecutive_breach_stream`.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``RocksDBStateStoreProvider``) — transformWithState is not implemented on
the default HDFS-backed store.  :func:`rocksdb_conf` returns the pair.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from ..vendor_support import ensure_protobuf

try:  # Spark >= 4 ... and a usable python state client: the TWS worker
    # speaks protobuf to the JVM state server (pyspark.sql.streaming.proto),
    # so an image without google.protobuf can hold the API but not run it.
    # ensure_protobuf() falls back to the repo-vendored pure-python
    # runtime (must run before the JVM starts so workers inherit the
    # PYTHONPATH — session.get_spark calls it too); if neither exists the
    # *_stream dispatchers fall back to the applyInPandasWithState twins
    # and the processor logic is direct-driven in tests/test_state_v2.py.
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    if not ensure_protobuf():
        raise ImportError("no protobuf runtime (native or vendored)")
    HAS_TWS = True
except ImportError:  # Spark 3.x, or no protobuf in the image
    HAS_TWS = False
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor, StatefulProcessorHandle)
    except ImportError:  # pragma: no cover - Spark 3.x
        StatefulProcessor = object  # type: ignore[assignment,misc]
        StatefulProcessorHandle = Any  # type: ignore[assignment,misc]

from .state import (BREACH_OUTPUT_SCHEMA, ESCALATED_OUTPUT_SCHEMA,
                    ESCALATION_EVERY, STATE_TTL_MS, THROTTLE_OUTPUT_SCHEMA,
                    consecutive_breach_stateful, escalate_every_n_stateful,
                    throttle_alerts_stateful)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")


def rocksdb_conf() -> tuple[str, str]:
    """(key, value) to enable the state store transformWithState needs."""
    return ("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


def tws_usable() -> bool:
    """True when the *_stream dispatchers should take the native path.

    Needs both the TWS runtime (Spark 4 + a protobuf runtime, native or
    vendored) AND the RocksDB state store on the active session —
    transformWithState is not implemented on the default HDFS-backed
    store, so dispatching to it on an unconfigured session would trade a
    working emulation for a runtime failure.  With no active session the
    runtime check alone decides (plan construction before start()).
    """
    if not HAS_TWS:
        return False
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    if spark is None:
        return True
    key, _ = rocksdb_conf()
    return "RocksDB" in (spark.conf.get(key, "") or "")


class _EscalateEveryN(StatefulProcessor):
    """IncidentAggregator (flink/incident_aggregator.py:22-66) on native
    typed state: per service, count alerts; every n-th passes through
    enriched with severity=ESCALATED; TTL drops idle services' counters."""

    def __init__(self, n: int, ttl_ms: int) -> None:
        self._n = n
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        # ttlDurationMs re-arms on every update() — Flink's
        # OnCreateAndWrite semantics, natively
        self._count = handle.getValueState(
            "count", "count long", ttlDurationMs=self._ttl_ms)

    def handleInputRows(self, key: tuple[Any, ...],
                        rows: Iterator[pd.DataFrame],
                        timer_values: Any) -> Iterator[pd.DataFrame]:
        count = self._count.get()[0] if self._count.exists() else 0
        # concat-then-sort: one key's micro-batch may span Arrow chunks
        chunks = [p for p in rows if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values(["ts", "event_id"], kind="mergesort")
            seqs = count + 1 + pd.RangeIndex(len(pdf))
            escalated = (seqs % self._n) == 0
            count += len(pdf)
            yield pd.DataFrame({
                "service": key[0],
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "severity": pd.Series(
                    ["ESCALATED" if e else s
                     for e, s in zip(escalated, pdf["severity"])]),
                "escalation_reason": pd.Series(
                    ["MULTIPLE_INCIDENTS" if e else None for e in escalated]),
                "alert_seq": pd.Series(seqs, dtype="int64"),
            })
        self._count.update((count,))

    def close(self) -> None:
        pass


class _ConsecutiveBreach(StatefulProcessor):
    """BreachDetector (flink/latency_slo_monitor.py:68-109) on native
    typed state: consecutive over-SLO windows per service; emit-and-clear
    at the limit; healthy window resets.  No TTL, like the reference."""

    def __init__(self, limit: int, p95_threshold: float) -> None:
        self._limit = limit
        self._thr = p95_threshold

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._streak = handle.getValueState("streak", "streak long")

    def handleInputRows(self, key: tuple[Any, ...],
                        rows: Iterator[pd.DataFrame],
                        timer_values: Any) -> Iterator[pd.DataFrame]:
        streak = self._streak.get()[0] if self._streak.exists() else 0
        chunks = [p for p in rows if len(p)]
        out: list[dict] = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values("window_start", kind="mergesort")
            for row in pdf.itertuples(index=False):
                if row.p95_latency > self._thr:
                    streak += 1
                    if streak >= self._limit:
                        out.append({
                            "service": key[0],
                            "window_start": int(row.window_start),
                            "window_end": int(row.window_end),
                            "p95_latency": float(row.p95_latency),
                            "breach_count": streak,
                            "type": "LATENCY_SLO_BREACH",
                            "severity": "CRITICAL",
                        })
                        streak = 0  # emit-and-clear (:104-106)
                else:
                    streak = 0
        self._streak.update((streak,))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


class _ThrottleAlerts(StatefulProcessor):
    """Streaming alert throttle (batch twin operators/escalate.py:
    throttle_alerts) on native typed state: pass the FIRST ``limit``
    alerts per (service, time bucket); O(1) state per key — the
    (bucket, emitted) pair for the latest bucket only, TTL-dropped for
    idle services."""

    def __init__(self, limit: int, bucket_seconds: int, ttl_ms: int) -> None:
        self._limit = limit
        self._bucket_s = bucket_seconds
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._st = handle.getValueState(
            "throttle", "bucket long, emitted long",
            ttlDurationMs=self._ttl_ms)

    def handleInputRows(self, key: tuple[Any, ...],
                        rows: Iterator[pd.DataFrame],
                        timer_values: Any) -> Iterator[pd.DataFrame]:
        bucket, emitted = self._st.get() if self._st.exists() else (-1, 0)
        chunks = [p for p in rows if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values(["ts", "event_id"], kind="mergesort")
            keep_rows = []
            for row in pdf.itertuples(index=False):
                b = int(row.ts.timestamp()) // self._bucket_s
                if b > bucket:
                    bucket, emitted = b, 0
                if emitted < self._limit:
                    emitted += 1
                    keep_rows.append({
                        "service": key[0],
                        "bucket_start": bucket * self._bucket_s,
                        "event_id": int(row.event_id),
                        "ts": row.ts,
                        "latency_ms": float(row.latency_ms),
                        "alert_seq": emitted,
                    })
            if keep_rows:
                yield pd.DataFrame(keep_rows)
        self._st.update((bucket, emitted))

    def close(self) -> None:
        pass


#: Output of the streaming event-transition operator (one row per
#: observed (prev -> current) pair in a user's stream).
TRANSITION_OUTPUT_SCHEMA = (
    "user_id long, from_type string, to_type string, ts timestamp")


class _EventTransitions(StatefulProcessor):
    """Streaming twin of queries/advanced.q_event_transitions: per user,
    remember the LAST event type across micro-batches and emit one
    (from_type, to_type) row per arriving event that has a predecessor.
    Downstream, a windowed count over the emitted pairs is the same
    transition matrix the batch query computes — the classic
    last-value-state enrichment, O(1) state per user (one string), TTL
    for users gone idle.
    """

    def __init__(self, ttl_ms: int) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last = handle.getValueState(
            "last", "last_type string", ttlDurationMs=self._ttl_ms)

    def handleInputRows(self, key: tuple[Any, ...],
                        rows: Iterator[pd.DataFrame],
                        timer_values: Any) -> Iterator[pd.DataFrame]:
        prev = self._last.get()[0] if self._last.exists() else None
        chunks = [p for p in rows if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values(["ts", "event_id"], kind="mergesort")
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                if prev is not None:
                    out.append({
                        "user_id": key[0],
                        "from_type": prev,
                        "to_type": row.event_type,
                        "ts": row.ts,
                    })
                prev = row.event_type
            if out:
                yield pd.DataFrame(out)
        if prev is not None:
            self._last.update((prev,))

    def close(self) -> None:
        pass


def event_transitions_tws(events: DataFrame, *,
                          ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    """Native-API streaming transition pairs (W9-family: ValueState +
    TTL).  Batch equivalence: grouping this output by (from_type,
    to_type) with a count reproduces q_event_transitions'
    n_transitions column exactly (proven in tests/test_state_v2.py)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        _EventTransitions(ttl_ms),
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def escalate_every_n_tws(alerts: DataFrame, *, n: int = ESCALATION_EVERY,
                         ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    """Native-API escalation counter (W9: ValueState + 1 h TTL)."""
    return alerts.groupBy("service").transformWithStateInPandas(
        _EscalateEveryN(n, ttl_ms),
        outputStructType=ESCALATED_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",  # TTL requires a clock
    )


def consecutive_breach_tws(windowed: DataFrame, *, limit: int = 3,
                           p95_threshold: float = 100.0) -> DataFrame:
    """Native-API consecutive-breach counter (W10: ValueState, no TTL)."""
    return windowed.groupBy("service").transformWithStateInPandas(
        _ConsecutiveBreach(limit, p95_threshold),
        outputStructType=BREACH_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def throttle_alerts_tws(alerts: DataFrame, *, limit: int = 2,
                        bucket_seconds: int = 86_400,
                        ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    """Native-API per-bucket alert throttle (W9-family: ValueState + TTL)."""
    return alerts.groupBy("service").transformWithStateInPandas(
        _ThrottleAlerts(limit, bucket_seconds, ttl_ms),
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def throttle_alerts_stream(alerts: DataFrame, *, limit: int = 2,
                           bucket_seconds: int = 86_400,
                           ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    if tws_usable():
        return throttle_alerts_tws(alerts, limit=limit,
                                   bucket_seconds=bucket_seconds,
                                   ttl_ms=ttl_ms)
    return throttle_alerts_stateful(alerts, limit=limit,
                                    bucket_seconds=bucket_seconds,
                                    ttl_ms=ttl_ms)


def escalate_every_n_stream(alerts: DataFrame, *, n: int = ESCALATION_EVERY,
                            ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    """Version dispatch: native transformWithState on Spark 4, the
    applyInPandasWithState emulation otherwise."""
    if tws_usable():
        return escalate_every_n_tws(alerts, n=n, ttl_ms=ttl_ms)
    return escalate_every_n_stateful(alerts, n=n, ttl_ms=ttl_ms)


def consecutive_breach_stream(windowed: DataFrame, *, limit: int = 3,
                              p95_threshold: float = 100.0) -> DataFrame:
    if tws_usable():
        return consecutive_breach_tws(windowed, limit=limit,
                                      p95_threshold=p95_threshold)
    return consecutive_breach_stateful(windowed, limit=limit,
                                       p95_threshold=p95_threshold)
