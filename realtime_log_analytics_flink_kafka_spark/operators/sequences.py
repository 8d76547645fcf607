"""Event-sequence pattern matching (SURVEY §7 extension).

The CEP (complex-event-processing) construct class — Flink's
flagship feature family, re-expressed Spark-first: a k-step type
pattern with a time bound, matched per key under RELAXED contiguity
(events whose type is outside the pattern's alphabet are invisible to
the match; pattern steps must be consecutive among the remaining
relevant events).  That is one predicate over lead() columns on the
alphabet-filtered stream — no NFA state machine, no iterative join:

1. filter to the pattern's type alphabet (the predicate reaches the
   parquet scan, so irrelevant event types never leave the source);
2. one window partitioned by the key, ordered by (event-time micros,
   event id) — a total order, so matches are deterministic under ties;
3. lead(type, i) equality per step + a microsecond window bound on
   lead(ts, k) − ts.

Scale shape: the only shuffle is the per-key window repartition of the
ALPHABET-FILTERED stream; per-key history is user-sized at any corpus
scale, so no partition outgrows a task.  Strict contiguity over the
raw stream (Flink's `next()`) is the same plan without step 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def match_sequence(events: DataFrame, *, pattern: tuple[str, ...],
                   window_s: int, key_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type",
                   id_col: str = "event_id") -> DataFrame:
    """Matches of ``pattern`` (a tuple of event types, len ≥ 2) per
    ``key_col`` within ``window_s`` seconds, relaxed-contiguity
    semantics (see module docstring).  Emits one row per match: the
    key, start/end epoch-microseconds, the duration, and the first and
    last matched event ids — all BIGINT, so the result hashes exactly
    cross-engine."""
    if len(pattern) < 2:
        raise ValueError("pattern needs >= 2 steps")
    k = len(pattern) - 1
    alphabet = sorted(set(pattern))
    relevant = (events
                .filter(F.col(type_col).isin(*alphabet))
                .select(key_col, type_col,
                        F.unix_micros(F.col(ts_col)).alias("tus"),
                        F.col(id_col).alias("eid")))
    w = Window.partitionBy(key_col).orderBy("tus", "eid")
    led = relevant.select(
        key_col, type_col, "tus", "eid",
        *[F.lead(type_col, i).over(w).alias(f"_t{i}")
          for i in range(1, k + 1)],
        F.lead("tus", k).over(w).alias("_tend"),
        F.lead("eid", k).over(w).alias("_eend"))
    cond = F.col(type_col) == pattern[0]
    for i, t in enumerate(pattern[1:], 1):
        cond = cond & (F.col(f"_t{i}") == t)
    cond = cond & (F.col("_tend") - F.col("tus")
                   <= F.lit(window_s * 1_000_000).cast("long"))
    return led.filter(cond).select(
        key_col,
        F.col("tus").alias("start_us"),
        F.col("_tend").alias("end_us"),
        (F.col("_tend") - F.col("tus")).alias("duration_us"),
        F.col("eid").alias("start_event_id"),
        F.col("_eend").alias("end_event_id"))


#: Output schema of the streaming matcher — identical to the batch
#: matcher's projection so the twin test compares row sets directly.
SEQ_MATCH_OUTPUT = ("user_id long, start_us long, end_us long, "
                    "duration_us long, start_event_id long, "
                    "end_event_id long")


def match_sequence_stateful(events: DataFrame, *, pattern: tuple[str, ...],
                            window_s: int, key_col: str = "user_id",
                            ts_col: str = "ts", type_col: str = "event_type",
                            id_col: str = "event_id") -> DataFrame:
    """Streaming twin of :func:`match_sequence` — the CEP matcher as a
    keyed ``applyInPandasWithState`` operator: per key, the state is the
    last ``len(pattern)`` RELEVANT events (a fixed-size ring, never the
    history), and each arriving relevant event closes a match exactly
    when the buffer tail spells the pattern inside the time bound.

    Equivalence contract (tests/test_streaming.py): processing each
    key's events in event-time order, maintained ring + tail check ==
    the batch matcher's lead() predicate, because relaxed contiguity
    only ever inspects the last k relevant events.  Within a micro-batch
    rows are concat-then-sorted by (event-time micros, id) — the same
    total order the batch window uses.  Across micro-batches the ring's
    newest element IS the per-key watermark: an arriving event at or
    behind it in (tus, eid) order is DROPPED, never appended, so the
    ring stays time-ordered and can never spell the pattern across a
    non-monotonic timestamp sequence (no spurious or negative-duration
    matches) — the same drop-late posture as the watermarked
    aggregations, and it also suppresses at-least-once replays of the
    ring's newest event.  The cost is the watermark cost: a key whose
    events arrive out of order across batches may miss a match the
    batch matcher finds (late twin test: tests/test_streaming.py,
    test_sequence_match_stream_drops_late).

    Scale shape: state is O(len(pattern)) per key — three tuples for
    the default pattern — and only alphabet-filtered events reach the
    shuffle."""
    from collections.abc import Iterator
    from typing import Any

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if len(pattern) < 2:
        raise ValueError("pattern needs >= 2 steps")
    p = len(pattern)
    bound_us = window_s * 1_000_000
    alphabet = sorted(set(pattern))

    relevant = (events
                .filter(F.col(type_col).isin(*alphabet))
                .select(F.col(key_col).alias("user_id"), F.col(type_col)
                        .alias("etype"),
                        F.unix_micros(F.col(ts_col)).alias("tus"),
                        F.col(id_col).alias("eid")))

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        types, tuss, eids = (state.get if state.exists
                             else ([], [], []))
        types, tuss, eids = list(types), list(tuss), list(eids)
        out: list[dict] = []
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) \
                .sort_values(["tus", "eid"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                tus, eid = int(row.tus), int(row.eid)
                # Per-key watermark = the ring's newest (tus, eid): a
                # late arrival (behind it) or a replay (equal) is
                # dropped so the ring stays strictly time-ordered.
                if tuss and (tus, eid) <= (tuss[-1], eids[-1]):
                    continue
                types.append(row.etype)
                tuss.append(tus)
                eids.append(eid)
                if len(types) > p:
                    del types[0], tuss[0], eids[0]
                if (len(types) == p and types == list(pattern)
                        and tuss[-1] - tuss[0] <= bound_us):
                    out.append({
                        "user_id": key[0],
                        "start_us": tuss[0], "end_us": tuss[-1],
                        "duration_us": tuss[-1] - tuss[0],
                        "start_event_id": eids[0],
                        "end_event_id": eids[-1],
                    })
        state.update((types, tuss, eids))
        if out:
            yield pd.DataFrame(out)

    return relevant.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SEQ_MATCH_OUTPUT,
        stateStructType=("types array<string>, tuss array<long>, "
                         "eids array<long>"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
