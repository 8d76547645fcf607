"""Keyed-state streaming operators (SURVEY §2.6 W9-W12, §2.4 A9-A11).

The reference implements these as Flink KeyedProcessFunctions with
ValueState; here they are ``applyInPandasWithState`` operators — Arrow
batches per key, explicit state handle, processing-time timeout standing
in for Flink's state TTL.

Semantics notes vs the reference:

- Flink processes records in Kafka per-key order.  A Spark micro-batch
  delivers a key's rows as one (unordered) group, so each operator sorts
  its batch by event-time before applying the counter logic — identical
  outcome when input respects event-time order per key, deterministic
  always.
- Flink's TTL (OnCreateAndWrite, flink/incident_aggregator.py:27-33)
  re-arms on every write; ``state.setTimeoutDuration`` is likewise
  re-armed after each batch that touches the key.
- On timeout the state is dropped exactly like Flink's full-snapshot
  expired-state cleanup.

Batch equivalents (provably same output on replayed history) live in
``operators/escalate.py``; tests assert the equivalence.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Reference constants (flink/incident_aggregator.py:20,33).
ESCALATION_EVERY = 3
STATE_TTL_MS = 3_600_000

ESCALATED_OUTPUT_SCHEMA = (
    "service string, event_id long, ts timestamp, severity string, "
    "escalation_reason string, alert_seq long"
)

BREACH_OUTPUT_SCHEMA = (
    "service string, window_start long, window_end long, "
    "p95_latency double, breach_count int, type string, severity string"
)


def escalate_every_n_stateful(alerts: DataFrame, *, n: int = ESCALATION_EVERY,
                              ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    """IncidentAggregator port (flink/incident_aggregator.py:22-66): per
    service, count alerts in ValueState; every n-th is enriched with
    severity=ESCALATED + escalation_reason; ALL alerts pass through.
    State TTL 1 h, re-armed on write."""

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Flink TTL expiry: drop the counter, emit nothing
            state.remove()
            return
        (count,) = state.get if state.exists else (0,)
        # concat-then-sort: a key's micro-batch can split across Arrow
        # chunks; per-chunk sorting is not a global event-time order
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values(["ts", "event_id"], kind="mergesort")
            seqs = count + 1 + pd.RangeIndex(len(pdf))
            escalated = (seqs % n) == 0
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
        state.update((count,))
        state.setTimeoutDuration(ttl_ms)  # OnCreateAndWrite TTL re-arm

    return alerts.groupBy("service").applyInPandasWithState(
        fn,
        outputStructType=ESCALATED_OUTPUT_SCHEMA,
        stateStructType="count long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def consecutive_breach_stateful(windowed: DataFrame, *, limit: int = 3,
                                p95_threshold: float = 100.0) -> DataFrame:
    """BreachDetector port (flink/latency_slo_monitor.py:68-109): per
    service, count consecutive windows whose p95 exceeds the SLO; emit an
    alert and reset at ``limit``; a healthy window resets to 0.

    Input: per-(service, window) aggregated rows with columns
    (service, window_start, window_end, p95_latency).  No TTL — the
    reference's breach counter job has none (and no checkpointing either;
    we at least keep the state checkpointed by Spark).
    """

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (streak,) = state.get if state.exists else (0,)
        out: list[dict] = []
        # concat-then-sort (see escalate_every_n_stateful)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values("window_start", kind="mergesort")
            for row in pdf.itertuples(index=False):
                if row.p95_latency > p95_threshold:
                    streak += 1
                    if streak >= limit:
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
        state.update((streak,))
        if out:
            yield pd.DataFrame(out)

    return windowed.groupBy("service").applyInPandasWithState(
        fn,
        outputStructType=BREACH_OUTPUT_SCHEMA,
        stateStructType="streak long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


THROTTLE_OUTPUT_SCHEMA = (
    "service string, bucket_start long, event_id long, ts timestamp, "
    "latency_ms double, alert_seq long"
)


def throttle_alerts_stateful(alerts: DataFrame, *, limit: int = 2,
                             bucket_seconds: int = 86_400,
                             ttl_ms: int = STATE_TTL_MS) -> DataFrame:
    """Streaming twin of operators/escalate.py:throttle_alerts — pass
    only the FIRST ``limit`` alerts per (service, time bucket), drop the
    rest.  The per-key state is the (bucket, emitted-count) pair for the
    LATEST bucket only: buckets advance monotonically in event time per
    key (micro-batches sort by event time; a late alert belonging to an
    already-advanced bucket is counted against the current state rather
    than resurrecting old buckets — same drop-late posture as the
    windowed aggregations under a watermark), so state is O(1) per key
    where a naive map-of-buckets would grow forever.  TTL drops idle
    services entirely.
    """

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        bucket, emitted = state.get if state.exists else (-1, 0)
        # Concatenate ALL Arrow chunks before sorting: one key's
        # micro-batch can arrive split across several pandas chunks, and
        # sorting each chunk independently is NOT a global event-time
        # order — the (bucket, emitted) counter could advance past a
        # bucket and then see earlier rows from a later chunk.  Bounded
        # by the key's per-micro-batch row count, same as the sort was.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values(["ts", "event_id"], kind="mergesort")
            keep_rows = []
            for row in pdf.itertuples(index=False):
                b = int(row.ts.timestamp()) // bucket_seconds
                if b > bucket:
                    bucket, emitted = b, 0
                if emitted < limit:
                    emitted += 1
                    keep_rows.append({
                        "service": key[0],
                        "bucket_start": bucket * bucket_seconds,
                        "event_id": int(row.event_id),
                        "ts": row.ts,
                        "latency_ms": float(row.latency_ms),
                        "alert_seq": emitted,
                    })
            if keep_rows:
                yield pd.DataFrame(keep_rows)
        state.update((bucket, emitted))
        state.setTimeoutDuration(ttl_ms)

    return alerts.groupBy("service").applyInPandasWithState(
        fn,
        outputStructType=THROTTLE_OUTPUT_SCHEMA,
        stateStructType="bucket long, emitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
