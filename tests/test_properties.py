"""Property-based tests (SURVEY §5): the stateful operators against plain
Python simulators of the reference's KeyedProcessFunction logic, and the
detector's alert invariants under the seeded workload generator.

Each Spark example costs a job, so example counts are small but the
generators cover the structural edge cases (empty keys, single-element
runs, all-breach / no-breach patterns).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.detect import (
    error_rate_alerts,
)
from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
    consecutive_breaches, escalate_every_nth,
)
from tests.fixtures import LOG_SCHEMA, gen_logs


def simulate_escalation(n_events: int, n: int = 3) -> list[str]:
    """flink/incident_aggregator.py:41-66 in ten lines of Python."""
    out, count = [], 0
    for _ in range(n_events):
        count += 1
        if count >= n:
            out.append("ESCALATED")
            count = 0
        else:
            out.append("HIGH")
    return out


def simulate_breaches(pattern: list[bool], limit: int = 3) -> list[int]:
    """flink/latency_slo_monitor.py:68-109: emit positions."""
    out, streak = [], 0
    for i, b in enumerate(pattern):
        if b:
            streak += 1
            if streak >= limit:
                out.append(i)
                streak = 0
        else:
            streak = 0
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=4))
def test_escalation_matches_simulator(spark, key_sizes):
    rows = []
    eid = 0
    for k, size in enumerate(key_sizes):
        for _ in range(size):
            rows.append((eid, f"svc-{k}", float(eid), "HIGH"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, service string, ts double, severity string")
    got = escalate_every_nth(df, order_by=["ts"])
    for k, size in enumerate(key_sizes):
        seq = [r.severity for r in got.filter(F.col("service") == f"svc-{k}")
               .orderBy("alert_seq").collect()]
        assert seq == simulate_escalation(size)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=20))
def test_breach_islands_match_simulator(spark, pattern):
    rows = [("svc", i, 200.0 if b else 50.0) for i, b in enumerate(pattern)]
    df = spark.createDataFrame(rows, "service string, window_start long, p95 double")
    got = sorted(r.window_start for r in consecutive_breaches(
        df, breach=F.col("p95") > 100.0, order_col="window_start").collect())
    assert got == simulate_breaches(pattern)


@settings(max_examples=3, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_detector_alert_invariants(spark, seed):
    """Every emitted alert satisfies the gates (P9/P10); the spike regime
    (x10 error rate, log_producer.py:52-55) makes auth-service fire."""
    rows = [
        dict(event_id=r["event_id"], ts=r["ts"], service=r["service"],
             is_error=r["is_error"], latency_ms=r["latency_ms"])
        for r in gen_logs(n_seconds=60, seed=seed)
    ]
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    alerts = error_rate_alerts(logs, size="20 seconds", slide="10 seconds",
                               min_support=50, threshold=0.05).collect()
    assert all(a.total_logs >= 50 and a.error_rate >= 0.05 for a in alerts)
    # auth-service runs a 30% base error rate — it must alert
    assert any(a.service == "auth-service" for a in alerts)


# --- round-4 operator invariants ---------------------------------------------

@st.composite
def corpus(draw):
    """Small word-soup corpora: repeated vocab so segments/chunks collide."""
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    n_docs = draw(st.integers(1, 5))
    texts = []
    for _ in range(n_docs):
        n = draw(st.integers(0, 30))
        texts.append(" ".join(
            vocab[draw(st.integers(0, len(vocab) - 1))] for _ in range(n)))
    return texts


@given(corpus())
@settings(max_examples=8, deadline=None)
def test_segment_dedup_partitions_every_token(spark, texts):
    """kept + dropped token counts == total tokens, per doc, always."""
    from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
        corpus_segments, segment_dedup,
    )
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    seg_total = {r["doc_id"]: r["tot"] for r in corpus_segments(docs)
                 .groupBy("doc_id").agg(F.sum("n_tok").alias("tot")).collect()}
    for r in segment_dedup(docs).collect():
        n_toks = len(texts[r["doc_id"]].split())
        assert seg_total[r["doc_id"]] == n_toks
        assert r["n_dropped"] <= r["n_segments"]
        assert r["tokens_kept"] <= n_toks


@given(corpus())
@settings(max_examples=8, deadline=None)
def test_doc_chunks_cover_every_token_in_order(spark, texts):
    """Chunk windows tile the doc: first starts at 0, strides never skip
    a token, and the last window reaches the final token."""
    from realtime_log_analytics_flink_kafka_spark.operators.text import doc_chunks
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    by_doc = {}
    for r in doc_chunks(docs, chunk=8, stride=4).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n_toks = len(texts[doc_id].split())
        rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        # last chunk must reach the final token; none may start past it
        last = rows[-1]
        assert last["chunk_idx"] * 4 + last["n_tok"] == n_toks
        assert all(r["chunk_idx"] * 4 < n_toks for r in rows)


@given(st.lists(st.integers(1, 50000), min_size=2, max_size=40))
@settings(max_examples=8, deadline=None)
def test_latency_anomalies_matches_python_zscore(spark, cents):
    """The cross-multiplied integer z-test == the textbook float z-test
    computed in exact Fractions."""
    import datetime
    from fractions import Fraction
    from realtime_log_analytics_flink_kafka_spark.operators.detect import (
        latency_anomalies,
    )
    n = len(cents)
    s, q = sum(cents), sum(c * c for c in cents)
    expected = sum(
        1 for x in cents
        if Fraction(n * x - s) ** 2 > 9 * Fraction(n * q - s * s))
    rows = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0), i, "svc-0", 0, c / 100.0)
         for i, c in enumerate(cents)],
        "ts timestamp, event_id long, service string, is_error int, "
        "latency_ms double")
    got = latency_anomalies(rows).collect()[0]["n_outliers"]
    assert got == expected


@given(st.data())
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_pandas_semantics(spark, data):
    """asof_join (interleave-window, no join node) == the obvious
    per-row argmax: greatest right_ts <= left_ts within the key."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import asof_join
    keys = ["k0", "k1"]
    lefts = data.draw(st.lists(
        st.tuples(st.sampled_from(keys), st.integers(0, 50)),
        min_size=1, max_size=12))
    rights = data.draw(st.lists(
        st.tuples(st.sampled_from(keys), st.integers(0, 50)),
        min_size=0, max_size=12))
    l = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        "key string, lts long, lid long")
    r = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(rights)],
        "key string, rts long, rid long") if rights else \
        spark.createDataFrame([], "key string, rts long, rid long")
    out = {row["lid"]: row["asof_rts"]
           for row in asof_join(l, r, ["key"], "lts", "rts",
                                right_cols=["rid"]).collect()}
    for i, (k, t) in enumerate(lefts):
        cand = [rt for (rk, rt) in rights if rk == k and rt <= t]
        assert out[i] == (max(cand) if cand else None)


@given(st.lists(st.integers(1, 300), min_size=1, max_size=30))
@settings(max_examples=8, deadline=None)
def test_packed_shards_match_serial_packing(spark, tokens):
    """The two-phase distributed prefix sum assigns every doc to exactly
    the shard a serial greedy packer would (start-offset convention)."""
    from realtime_log_analytics_flink_kafka_spark.operators.packing import (
        packed_shards,
    )
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(tokens)], "doc_id long, n_tokens long")
    got = {r["doc_id"]: r["shard_id"]
           for r in packed_shards(docs, budget=256, bucket_span=4).collect()}
    start, expected = 0, {}
    for i, n in enumerate(tokens):
        expected[i] = start // 256
        start += n
    assert got == expected


@given(st.lists(st.integers(0, 30), min_size=2, max_size=6),
       st.integers(0, 5))
@settings(max_examples=8, deadline=None)
def test_winnowing_guarantee_holds_for_any_planted_run(spark, prefix_lens,
                                                       run_extra):
    """Schleimer guarantee, property form: whatever distinct prefixes
    surround it, a shared run of >= k + w - 1 tokens always yields a
    shared selected fingerprint between every pair of docs carrying it."""
    from realtime_log_analytics_flink_kafka_spark.operators import dedup

    run_len = dedup.WINNOW_K + dedup.WINNOW_W - 1 + run_extra
    run = " ".join(f"shared{i}" for i in range(run_len))
    rows = []
    for d, plen in enumerate(prefix_lens):
        prefix = " ".join(f"d{d}tok{i}" for i in range(plen))
        rows.append((d, (prefix + " " + run).strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.winnowing_pairs(docs, min_shared=1, max_df=100).count()
    n = len(rows)
    assert pairs == n * (n - 1) // 2


@given(st.lists(st.integers(1, 9), min_size=3, max_size=6))
@settings(max_examples=8, deadline=None)
def test_bm25_is_monotone_in_tf_for_fixed_length(spark, tfs):
    """Equal-length docs, one query term with positive idf: BM25 must
    rank strictly by term frequency."""
    from realtime_log_analytics_flink_kafka_spark.operators import text as t

    width = max(tfs) + 1
    rows = [(i, " ".join(["hit"] * tf + [f"pad{i}x{j}"
                                         for j in range(width - tf)]))
            for i, tf in enumerate(tfs)]
    # enough non-matching docs that idf comes out positive
    rows += [(100 + i, f"a{i} b{i}") for i in range(4 * len(tfs))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = t.bm25_scores(docs, ("hit",), k=len(tfs)).collect()
    got = [r["doc_id"] for r in out]
    want = [i for i, _ in sorted(
        enumerate(tfs), key=lambda p: (-p[1], p[0]))]
    assert got == want


# --- survival: randomized KM + log-rank consistency -------------------------

def _km_reference(cohort, horizon_min):
    """Brute-force Kaplan-Meier over (t0_min, tc_min_or_None) user
    tuples: per-duration risk-set walk in pure Python floats."""
    durs = {}
    for t0, tc in cohort:
        if tc is not None:
            d = tc - t0
            durs.setdefault(d, [0, 0])[0] += 1
        else:
            d = horizon_min - t0
            durs.setdefault(d, [0, 0])[1] += 1
    s, at_risk = 1.0, len(cohort)
    med = None
    s_end = 1.0
    for d in sorted(durs):
        ev, cn = durs[d]
        if ev:
            s = s * ((at_risk - ev) / at_risk)
            if med is None and s <= 0.5:
                med = d
        at_risk -= ev + cn
        s_end = s
    return med, s_end


@given(st.data())
@settings(max_examples=8, deadline=None)
def test_km_survival_matches_bruteforce(spark, data):
    """conversion_survival vs a pure-Python risk-set walk on random
    censored cohorts (random click minutes, ~half the users purchasing
    at a random later minute, horizon fixed by a final marker event):
    n/median/plateau must agree exactly — the fold's at-risk
    bookkeeping and the reference's walk share no code."""
    import datetime as dt
    import os
    import tempfile
    from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
        q_conversion_survival)

    n_users = data.draw(st.integers(min_value=1, max_value=12))
    horizon = 500
    cohort = []
    rows = []
    eid = 0
    t0d = dt.datetime(2026, 1, 1)

    def ts(m):
        return t0d + dt.timedelta(minutes=m)

    for u in range(n_users):
        uid = u * 4  # all on svc-0
        t0 = data.draw(st.integers(min_value=0, max_value=100))
        conv = data.draw(st.booleans())
        eid += 1
        rows.append((eid, ts(t0), uid, "click", 1.0, "{}"))
        if conv:
            tc = t0 + data.draw(st.integers(min_value=0, max_value=300))
            eid += 1
            rows.append((eid, ts(tc), uid, "purchase", 1.0, "{}"))
            cohort.append((t0, tc))
        else:
            cohort.append((t0, None))
    eid += 1
    rows.append((eid, ts(horizon), 1, "view", 1.0, "{}"))  # horizon marker
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string")
    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    [r] = [x for x in q_conversion_survival(spark, d).collect()
           if x.service == "svc-0"]
    med, s_end = _km_reference(cohort, horizon)
    assert r.n_users == len(cohort)
    assert r.n_converted == sum(1 for _, tc in cohort if tc is not None)
    assert r.km_median_min == med
    # the engine reports det_round(s, 4); the reference's float walk
    # multiplies the same exact-integer ratios in the same order, so
    # agreement is exact up to that rounding
    assert abs(r.s_end - s_end) < 5.1e-5, (r.s_end, s_end)


@given(st.lists(st.integers(0, 60), min_size=1, max_size=25),
       st.lists(st.integers(0, 60), min_size=1, max_size=25))
@settings(max_examples=8, deadline=None)
def test_wasserstein_matches_bruteforce(spark, a_vals, b_vals):
    """wasserstein_from_counts vs the sorted-quantile brute force
    (W1 of two empirical distributions = mean |q_a(i) - q_b(i)| over
    the lcm-expanded sorted samples) on random integer samples — the
    histogram transport sum and the quantile coupling share nothing."""
    import math
    from realtime_log_analytics_flink_kafka_spark.operators.drift import (
        wasserstein_from_counts)
    rows = ([("g", int(v), 1) for v in a_vals]
            + [("g", int(v), 0) for v in b_vals])
    df = spark.createDataFrame(rows, "g string, v long, in_a int")
    hist = (df.groupBy("g", "v")
            .agg(F.sum("in_a").cast("long").alias("ca"),
                 F.sum(1 - F.col("in_a")).cast("long").alias("cb")))
    r = wasserstein_from_counts(hist, group_cols=["g"]).collect()[0]
    na, nb = len(a_vals), len(b_vals)
    m = na * nb // math.gcd(na, nb)
    ea = sorted(v for v in a_vals for _ in range(m // na))
    eb = sorted(v for v in b_vals for _ in range(m // nb))
    ref = sum(abs(x - y) for x, y in zip(ea, eb)) / m
    assert abs(r.w1 - ref) < 5.1e-5, (r.w1, ref)
