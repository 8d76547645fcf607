"""Unit tests for operator semantics that the oracle can't see directly:
exact nearest-rank percentile vs a Python reference, escalation counter
behavior on crafted sequences, multimodal Arrow plumbing, IVF recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.functions.percentile import (
    exact_percentile_disc,
)
from realtime_log_analytics_flink_kafka_spark.operators import multimodal
from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
    consecutive_breaches, escalate_every_nth,
)
from realtime_log_analytics_flink_kafka_spark.operators.similarity import cosine_topk
from tests.conftest import SF_SMOKE


def test_exact_percentile_nearest_rank_low(spark):
    """Reference algorithm (flink/latency_slo_monitor.py:45-64):
    sort asc, idx = int(0.95*(n-1))."""
    for vals in ([5.0], [3.0, 1.0], [float(v) for v in range(1, 101)],
                 [10.0, 20.0, 30.0, 40.0]):
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got = df.agg(exact_percentile_disc(F.col("x"), 0.95).alias("p")).first().p
        want = sorted(vals)[int(0.95 * (len(vals) - 1))]
        assert got == want, (vals, got, want)


def test_iso_timestamp_malformed_fallback(spark):
    """P5: malformed timestamps silently become epoch 0, matching the
    reference's extract_ts fallback (flink/error_rate_detector.py:34-36)."""
    from realtime_log_analytics_flink_kafka_spark.functions.scalar import (
        iso_to_timestamp,
    )

    df = spark.createDataFrame(
        [("2024-01-01T12:30:45",), ("not-a-timestamp",), ("",), (None,)],
        "raw string",
    ).select(iso_to_timestamp(F.col("raw")).cast("long").alias("epoch"))
    got = [r.epoch for r in df.collect()]
    assert got[0] == 1704112245
    assert got[1:] == [0, 0, 0]


def test_incident_id_shape(spark):
    """F1: inc- + 8 hex chars (flink/error_rate_detector.py:95),
    nondeterministic by design — shape-only assertion."""
    import re

    from realtime_log_analytics_flink_kafka_spark.functions.scalar import incident_id

    ids = [r.i for r in spark.range(50).select(incident_id().alias("i")).collect()]
    assert all(re.fullmatch(r"inc-[0-9a-f]{8}", i) for i in ids)
    assert len(set(ids)) == len(ids)  # uuid-backed: no collisions in 50


def test_escalate_every_nth_sequence(spark):
    rows = [(i, "svc", float(i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "event_id long, service string, ts double") \
        .withColumn("severity", F.lit("HIGH"))
    out = escalate_every_nth(df, order_by=["ts"]).orderBy("alert_seq").collect()
    assert [r.severity for r in out] == \
        ["HIGH", "HIGH", "ESCALATED", "HIGH", "HIGH", "ESCALATED", "HIGH"]
    assert [r.escalation_reason for r in out] == \
        [None, None, "MULTIPLE_INCIDENTS", None, None, "MULTIPLE_INCIDENTS", None]


def test_consecutive_breaches_islands(spark):
    # breach pattern: 1 1 1 0 1 1 1 1 1 1 -> emits at positions 2 (streak 3)
    # and 6, 9 (streaks 3 and 6 within the second island)
    pattern = [1, 1, 1, 0, 1, 1, 1, 1, 1, 1]
    rows = [("svc", i, 200.0 if b else 50.0) for i, b in enumerate(pattern)]
    df = spark.createDataFrame(rows, "service string, window_start long, p95 double")
    out = consecutive_breaches(df, breach=F.col("p95") > 100.0,
                               order_col="window_start", limit=3)
    assert sorted(r.window_start for r in out.collect()) == [2, 6, 9]


def test_multimodal_decode_plumbing(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    media = multimodal.as_media(docs)
    decoded = multimodal.decode_features(media)
    rows = decoded.collect()
    assert len(rows) == 50
    assert set(decoded.columns) == {"doc_id", "fmt", "byte_len", "width",
                                    "height", "feat_mean"}
    for r in rows:
        assert r.fmt in multimodal.FORMATS
        assert 16 <= r.width < 656 and 16 <= r.height < 496
        assert 0.0 <= r.feat_mean <= 1.0
    # deterministic fake decode: same input -> same features
    again = {(r.doc_id, r.width, r.height) for r in decoded.collect()}
    assert again == {(r.doc_id, r.width, r.height) for r in rows}


def test_range_join_boundaries(spark):
    """Bucketed range join is exact at interval endpoints and across
    bucket boundaries, and never duplicates a matching pair."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [("k", 1, 1000)], "key string, lid int, lp long")
    # lower=-100, upper=-1 -> match window [900, 999]
    right = spark.createDataFrame(
        [("k", 1, 899),   # just below
         ("k", 2, 900),   # lower endpoint (inclusive)
         ("k", 3, 950),   # interior, different bucket than 999
         ("k", 4, 999),   # upper endpoint (inclusive)
         ("k", 5, 1000),  # just above
         ("x", 6, 950)],  # wrong key
        "key string, rid int, rp long")
    out = range_join(left, right, ["key"], "lp", "rp", lower=-100, upper=-1)
    rows = sorted((r.rid, r.rp) for r in out.collect())
    assert rows == [(2, 900), (3, 950), (4, 999)]
    assert out.columns.count("_rj_bucket") == 0


def test_range_join_negative_points(spark):
    """Bucket ids floor-divide, so negative points (pre-1970 epochs,
    signed deltas) land in the right bucket — truncate-toward-zero DIV
    would misassign them and drop matching pairs.  Exhaustive check
    against a Python reference over a sign-crossing point range."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import range_join

    pts = list(range(-120, 121, 7))
    left = spark.createDataFrame(
        [("k", i, p) for i, p in enumerate(pts)], "key string, lid int, lp long")
    right = spark.createDataFrame(
        [("k", i, p) for i, p in enumerate(pts)], "key string, rid int, rp long")
    lower, upper = -50, 10
    got = sorted((r.lid, r.rid) for r in
                 range_join(left, right, ["key"], "lp", "rp",
                            lower=lower, upper=upper).collect())
    want = sorted((li, ri) for li, lp in enumerate(pts)
                  for ri, rp in enumerate(pts)
                  if lp + lower <= rp <= lp + upper)
    assert got == want


def test_multimodal_resize_fit_within_box(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    resized = multimodal.resize_images(multimodal.as_media(docs),
                                       target_w=256, target_h=256)
    rows = resized.collect()
    assert len(rows) == 50
    for r in rows:
        assert 1 <= r.out_width <= 256 and 1 <= r.out_height <= 256
        # never upscale: output dims bounded by source dims
        assert r.out_width <= r.src_width and r.out_height <= r.src_height
        # aspect preserved within integer-floor tolerance
        if r.out_width < r.src_width:  # actually scaled
            ratio = min(256 / r.src_width, 256 / r.src_height)
            assert r.out_width == int(r.src_width * ratio)
            assert r.out_height == int(r.src_height * ratio)


def test_multimodal_frame_sampling_fanout(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    frames = multimodal.sample_frames(multimodal.as_media(docs), every=10)
    rows = frames.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 20
    for doc_rows in by_doc.values():
        n_frames = doc_rows[0].n_frames
        assert 30 <= n_frames < 120
        idxs = sorted(r.frame_idx for r in doc_rows)
        # every-10th frame, starting at 0, strictly below n_frames
        assert idxs == list(range(0, n_frames, 10))
        for r in doc_rows:
            assert r.ts_ms == r.frame_idx * multimodal.FRAME_MS


def test_approx_distinct_accuracy(spark):
    """approx_count_distinct (rsd=0.02) within 5% of exact — the
    bounded-state scale path for distinct aggregation."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    exact = {r.o_orderstatus: r.n for r in
             orders.groupBy("o_orderstatus")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    approx = {r.o_orderstatus: r.n for r in
              orders.groupBy("o_orderstatus")
              .agg(F.approx_count_distinct("o_custkey", rsd=0.02).alias("n"))
              .collect()}
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, n, approx[k])


def test_approx_p95_within_order_statistics(spark):
    """percentile_approx's estimate must land in the p90..max band of
    each window — the actual guarantee of a rank-error sketch (a fixed
    relative-value tolerance is NOT guaranteed on small windows)."""
    from realtime_log_analytics_flink_kafka_spark.functions.percentile import (
        exact_percentile_disc,
    )
    from realtime_log_analytics_flink_kafka_spark.operators.detect import latency_p95
    from realtime_log_analytics_flink_kafka_spark.operators.logs import as_logs
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table
    from tests.conftest import SF_ORACLE

    logs = as_logs(load_table(spark, SF_ORACLE, "events"))
    bounds = {
        (r.service, r.window_start): (r.p90, r.mx)
        for r in logs.groupBy("service", F.window("ts", "1 day").alias("w"))
        .agg(exact_percentile_disc(F.col("latency_ms"), 0.90).alias("p90"),
             F.max("latency_ms").alias("mx"))
        .select("service", F.col("w.start").cast("long").alias("window_start"),
                "p90", "mx").collect()
    }
    approx = {(r.service, r.window_start): r.p95_latency
              for r in latency_p95(logs, size="1 day", approx=True).collect()}
    assert approx.keys() == bounds.keys() and len(approx) > 0
    for k, v in approx.items():
        p90, mx = bounds[k]
        assert p90 <= v <= mx, (k, p90, v, mx)


def test_cosine_topk_self_similarity(spark):
    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 3)
    out = cosine_topk(embs, queries, k=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == 4
        assert all(not math.isnan(r.cosine) for r in rs)
        # ranked descending
        cs = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cs == sorted(cs, reverse=True)
        assert all(r.corpus_id != q for r in rs)


def test_clustered_near_dups_recall_vs_bruteforce(spark):
    """clustered_near_dup_pairs is the registry's scale path; the O(n^2)
    brute-force operator stays test-only as its recall baseline.  Every
    emitted pair must exist in the brute-force set with an identical
    cosine (bucketing may drop pairs, never alter or invent them)."""
    from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
        clustered_near_dup_pairs, embedding_near_dup_pairs,
    )

    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    brute = {(r.id_a, r.id_b): r.cosine
             for r in embedding_near_dup_pairs(embs, threshold=0.25).collect()}
    clustered = {(r.id_a, r.id_b): r.cosine
                 for r in clustered_near_dup_pairs(embs, threshold=0.25).collect()}
    assert set(clustered) <= set(brute)
    for pair, cos in clustered.items():
        assert cos == brute[pair]
    recall = len(clustered) / len(brute)
    assert recall >= 0.2, f"cluster-bucketed recall collapsed: {recall:.3f}"


def test_escalate_every_nth_scalable_equals_serial(spark):
    """The two-phase prefix-count escalator must reproduce the serial
    per-key window exactly — across bucket spans that split the data
    unevenly, including one bucket per event-second and one giant
    bucket (degenerate = the serial case)."""
    from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
        escalate_every_nth, escalate_every_nth_scalable,
    )
    from tests.fixtures import gen_logs

    rows = [r for r in gen_logs(n_seconds=90) if r["is_error"]]
    for r in rows:
        r["severity"] = "HIGH"
    alerts = spark.createDataFrame(
        rows, "event_id long, ts timestamp, service string, is_error int, "
              "latency_ms double, severity string")
    cols = ["event_id", "service", "severity", "escalation_reason"]
    want = sorted(
        tuple(r) for r in
        escalate_every_nth(alerts)
        .select(*cols, F.col("alert_seq").cast("long").alias("alert_seq"))
        .collect())
    for span in (1, 7, 30, 86400):
        got = sorted(
            tuple(r) for r in
            escalate_every_nth_scalable(alerts, bucket_span_s=span)
            .select(*cols, "alert_seq").collect())
        assert got == want, f"span={span}"


def test_escalate_scalable_plan_has_no_serial_key_window(spark):
    """Every window in the scalable escalator's plan involves the bucket
    column — no window partitions a key's entire raw-event history into
    one task (the 100 TB ceiling of the serial formulation)."""
    from realtime_log_analytics_flink_kafka_spark.operators.escalate import (
        escalate_every_nth_scalable,
    )
    from realtime_log_analytics_flink_kafka_spark.plans import formatted_plan
    from tests.fixtures import gen_logs

    rows = [r for r in gen_logs(n_seconds=30) if r["is_error"]]
    for r in rows:
        r["severity"] = "HIGH"
    alerts = spark.createDataFrame(
        rows, "event_id long, ts timestamp, service string, is_error int, "
              "latency_ms double, severity string")
    plan = formatted_plan(escalate_every_nth_scalable(alerts))
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs, plan
    for ln in specs:
        assert "_esc_bucket" in ln, ln


def test_packed_shards_equals_naive_prefix_sum(spark):
    """Two-phase packing must equal the naive single-window prefix sum,
    across bucket spans; shard start offsets stay inside their shard's
    token range (greedy start-offset packing invariant)."""
    from pyspark.sql import Window

    from realtime_log_analytics_flink_kafka_spark.operators.packing import (
        packed_shards,
    )

    rows = [(i, 10 + (i * 37) % 90) for i in range(300)]
    t = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    budget = 256
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = sorted(
        (r.doc_id, r.n_tokens, r.strt // budget) for r in
        t.withColumn("strt", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .collect())
    for span in (1, 7, 64, 10_000):
        got = sorted(
            (r.doc_id, r.n_tokens, r.shard_id) for r in
            packed_shards(t, budget=budget, bucket_span=span).collect())
        assert got == want, f"span={span}"
    # every shard except the last is filled to >= budget - max_doc_tokens
    totals = {}
    for doc_id, n, shard in want:
        totals[shard] = totals.get(shard, 0) + n
    for shard in sorted(totals)[:-1]:
        assert totals[shard] + 100 > budget  # max doc is < 100 tokens


def test_stratified_sample_deterministic_and_partition_invariant(spark):
    """Sample membership depends only on (id, salt): identical across
    runs and across arbitrary repartitioning, and strata rates land
    near their targets."""
    from realtime_log_analytics_flink_kafka_spark.operators.sampling import (
        stratified_sample,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rates = {"en": 2000, "de": 5000, "es": 5000, "fr": 5000, "zh": 5000}
    a = {r.doc_id for r in stratified_sample(docs, rates).collect()}
    b = {r.doc_id for r in
         stratified_sample(docs.repartition(13, "lang"), rates).collect()}
    assert a == b and len(a) > 0
    by_lang_all = {r.lang: r.n for r in
                   docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    by_lang_kept = {r.lang: r.n for r in
                    stratified_sample(docs, rates).groupBy("lang")
                    .agg(F.count("*").alias("n")).collect()}
    for lang, kept in by_lang_kept.items():
        frac = kept / by_lang_all[lang]
        target = rates[lang] / 10_000
        assert abs(frac - target) < 0.15, (lang, frac, target)


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """Probing 2 clusters is a candidate superset of probing 1, so
    recall@k vs the brute-force baseline must not decrease (and the
    returned cosines must exist in the brute-force ranking)."""
    from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
        cosine_topk, ivf_topk, ivf_topk_multiprobe,
    )

    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    k = 3
    truth = {}
    for r in cosine_topk(embs, embs.filter(F.col("vec_id") < 5), k=k).collect():
        truth.setdefault(r.query_id, set()).add(r.corpus_id)

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.corpus_id)
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        return hits / sum(len(t) for t in truth.values())

    r1 = recall(ivf_topk(embs, k=k, n_queries=5))
    r2 = recall(ivf_topk_multiprobe(embs, k=k, n_queries=5, n_probe=2))
    assert r2 >= r1, (r1, r2)
    assert r2 > 0


def test_repetition_metrics_crafted_fractions(spark):
    """Hand-computed fractions: 'a a a b' has max-unigram 3/4, top-bigram
    2/3 ('a a' twice of three), and zero duplicated trigrams — but at 4
    tokens it is under REPEAT_MIN_GRAMS, so it passes (length gating);
    a long fully-repeated doc trips the filters; a 2-token doc whose
    single bigram is trivially '100% top bigram' also passes."""
    from realtime_log_analytics_flink_kafka_spark.operators.text import (
        repetition_metrics,
    )

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y " * 50), (3, "one two")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 4
    assert r1.max_unigram_frac == 0.75
    assert r1.top_bigram_frac == 0.6667
    assert r1.dup_trigram_frac == 0.0
    assert r1.keep  # over-threshold fractions, but under-length metrics
    r2 = rows[2]
    assert r2.max_unigram_frac == 0.5 and not r2.keep
    assert r2.dup_trigram_frac > 0.9  # two distinct trigrams, 98 instances
    r3 = rows[3]  # too short for trigrams; bigram metric singular
    assert r3.n_tokens == 2 and r3.dup_trigram_frac is None and r3.keep


def test_ngram_contamination_crafted_overlap(spark):
    """A corpus doc sharing exactly one trigram with the benchmark is
    flagged with hit count 1; a disjoint doc has zero hits."""
    from realtime_log_analytics_flink_kafka_spark.operators.decontam import (
        ngram_contamination,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),   # shares 'alpha beta gamma'
         (2, "uno dos tres cuatro")],     # disjoint
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma epsilon")], "doc_id long, text string")
    rows = {r.doc_id: r for r in ngram_contamination(corpus, bench).collect()}
    assert rows[1].n_shingles == 2 and rows[1].n_hits == 1
    assert rows[1].contamination_ratio == 0.5 and rows[1].contaminated
    assert rows[2].n_hits == 0 and not rows[2].contaminated


def test_quantization_error_bounds(spark):
    """int8 quantization: |q| <= 127 everywhere, and the per-vector MSE is
    bounded by (s/2)^2 for the largest per-dim scale (worst rounding
    error half a quantization step per dimension)."""
    from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
        quantization_error,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i + j) / 7.0 for j in range(8)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    rows = quantization_error(vecs).collect()
    assert len(rows) == 10
    max_abs = max((10 - 1 + 8 - 1) / 7.0, 0.0)
    worst_step = max_abs / 127.0
    for r in rows:
        assert r.q_max <= 127
        assert r.quant_mse <= (worst_step / 2) ** 2 + 1e-9


def test_near_dup_survivors_partition(spark):
    """Survivors and dropped docs partition the corpus: every doc appears
    exactly once across the two sides, and no surviving pair's doc_b
    remains."""
    from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
        MINHASH_THRESHOLD, q_near_dup_survivors,
    )
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=MINHASH_THRESHOLD)
    dropped = {r.doc_b for r in pairs.select("doc_b").distinct().collect()}
    survivors = {r.doc_id
                 for r in q_near_dup_survivors(spark, SF_SMOKE).collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert survivors | dropped == all_ids
    assert not survivors & dropped


def test_asof_join_semantics(spark):
    """Backward as-of join on a crafted fixture: inclusive ties, greatest
    right row at-or-before each left row, left-outer nulls, and the
    max-payload tiebreak for equal right timestamps."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u1", 5, "l0"),   # before any right row -> null
         ("u1", 10, "l1"),  # exact tie with right ts=10 -> inclusive
         ("u1", 25, "l2"),  # between 20 and 30 -> matches 20
         ("u2", 50, "l3"),  # different key
         ("u3", 7, "l4")],  # key with no right rows at all
        "k string, t long, lid string")
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 20, 200), ("u1", 20, 201), ("u1", 30, 300),
         ("u2", 49, 400), ("u2", 51, 401)],
        "k string, t long, rid int")
    out = {r.lid: (r.asof_t, r.asof_rid)
           for r in asof_join(left, right, ["k"], "t", "t",
                              right_cols=["rid"]).collect()}
    assert out["l0"] == (None, None)
    assert out["l1"] == (10, 100)
    assert out["l2"] == (20, 201)   # equal-ts tie -> greatest payload
    assert out["l3"] == (49, 400)
    assert out["l4"] == (None, None)


def test_asof_join_tolerance(spark):
    """Numeric-ts tolerance: matches older than `tolerance` are nulled
    (pandas merge_asof semantics), boundary inclusive."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("k", 100, "a"), ("k", 110, "b"), ("k", 200, "c")],
        "k string, t long, lid string")
    right = spark.createDataFrame([("k", 95, 1)], "k string, t long, rid int")
    out = {r.lid: r.asof_rid
           for r in asof_join(left, right, ["k"], "t", "t",
                              right_cols=["rid"], tolerance=15).collect()}
    assert out == {"a": 1, "b": 1, "c": None}  # gap 5, 15 (inclusive), 105


def test_asof_join_plan_has_no_join_node(spark):
    """The interleave formulation must plan ONE shuffle + window, never a
    join: that is the whole scale argument vs a theta-join as-of."""
    from realtime_log_analytics_flink_kafka_spark.operators.joins import asof_join

    left = spark.createDataFrame([("k", 1, "x")], "k string, t long, lid string")
    right = spark.createDataFrame([("k", 1, 2)], "k string, t long, rid int")
    plan = asof_join(left, right, ["k"], "t", "t",
                     right_cols=["rid"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_duplicate_components_transitive_closure(spark):
    """A 5-node path (needs multiple propagation rounds), a 2-clique, and
    an isolated pair all resolve to min-id components — the chain case
    greedy pair-wise removal gets wrong."""
    from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14),   # path: one component
         (20, 21), (20, 22), (21, 22),             # triangle
         (30, 31)],                                # isolated pair
        "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id
           for r in duplicate_components(pairs).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_duplicate_components_empty(spark):
    from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert duplicate_components(pairs).count() == 0


def test_pii_metrics_expected_counts(spark):
    """Hand-computed expectations per corpus row — guards against the
    oracle-parity test passing because BOTH engines mis-match the same
    way."""
    from realtime_log_analytics_flink_kafka_spark.operators.pii import pii_metrics
    from realtime_log_analytics_flink_kafka_spark.queries.pipeline import PII_CORPUS

    corpus = spark.createDataFrame(PII_CORPUS, "pid long, text string")
    rows = {r.pid: r for r in pii_metrics(corpus).collect()}
    want = {  # pid: (email, ssn, ipv4, phone)
        1: (2, 0, 0, 0), 2: (0, 0, 2, 0), 3: (0, 1, 0, 1),
        4: (0, 0, 0, 0), 5: (1, 0, 1, 1), 6: (0, 0, 0, 0),
        7: (0, 0, 1, 0), 8: (2, 0, 0, 0),
    }
    for pid, (e, s, i, p) in want.items():
        r = rows[pid]
        assert (r.n_email, r.n_ssn, r.n_ipv4, r.n_phone) == (e, s, i, p), (
            pid, r)
        assert r.has_pii == (e + s + i + p > 0)
    assert rows[3].redacted == "ssn <ID> on file; call <PHONE>"
    assert rows[1].redacted == "contact me at <EMAIL> or <EMAIL>"
    assert rows[5].redacted == "mixed: <EMAIL> from <IP> dials <PHONE>"


def test_pii_metrics_clean_corpus(spark):
    """The synthetic documents table is PII-free: the operator over it
    must flag nothing and leave every text unchanged."""
    from realtime_log_analytics_flink_kafka_spark.operators.pii import pii_metrics
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    out = pii_metrics(docs)
    assert out.filter(F.col("has_pii")).count() == 0
    assert out.filter(F.col("redacted") != F.col("text")).count() == 0


def test_source_mixture_copy_semantics(spark):
    """floor(e) guaranteed copies + at most one fractional copy, epoch
    indices contiguous from 0, and the draw is partition-invariant."""
    from realtime_log_analytics_flink_kafka_spark.operators.sampling import (
        source_mixture,
    )
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source")
    bp = {"src0": 25_000, "src1": 4_000}
    out = source_mixture(docs, bp).collect()
    per_doc: dict[int, list] = {}
    src_of = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
        src_of[r.doc_id] = r.source
    for doc_id, epochs in per_doc.items():
        n = len(epochs)
        assert sorted(epochs) == list(range(n))  # contiguous 0-based
        e = bp.get(src_of[doc_id], 10_000)
        assert e // 10_000 <= n <= e // 10_000 + 1
    # src1 (0.4 epochs): docs appear 0 or 1 times; some of each at sf0.001
    src1_total = docs.filter(F.col("source") == "src1").count()
    src1_kept = sum(1 for d, s in src_of.items() if s == "src1")
    assert 0 < src1_kept < src1_total

    shuffled = source_mixture(docs.repartition(7), bp)
    assert sorted((r.doc_id, r.epoch) for r in shuffled.collect()) == \
        sorted((r.doc_id, r.epoch) for r in out)


def test_unigram_surprisal_hand_computed(spark):
    """Crafted 2-doc corpus with exact closed-form surprisals."""
    import math

    from realtime_log_analytics_flink_kafka_spark.operators.text import (
        unigram_surprisal,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    # T=5; ctf: a=2 b=2 c=1
    got = {r.doc_id: (r.n_tokens, r.mean_surprisal)
           for r in unigram_surprisal(docs).collect()}
    want1 = round((2 * math.log(5 / 2) + math.log(5 / 2)) / 3, 6)
    want2 = round((math.log(5 / 2) + math.log(5 / 1)) / 2, 6)
    assert got[1] == (3, want1)
    assert got[2] == (2, want2)
    # rare-vocab doc is more surprising than the common-vocab doc
    assert got[2][1] > got[1][1]


def test_ivf_pq_adc_approximates_exact_neighbors(spark):
    """IVF-PQ sanity: the ADC top-k overlaps the exact euclidean top-k
    restricted to the same probed clusters (quantization error may
    reorder, but the code-based distances must track real distances),
    and every ADC distance is nonnegative."""
    from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
        cosine_topk, ivf_pq_topk,
    )

    embs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = ivf_pq_topk(embs, k=3, n_queries=5, n_probe=2)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.adc_dist2 >= 0 for r in rows)
    assert all(1 <= r.rank <= 3 for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    # ranks are dense per query and sorted by adc distance
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(rs[i].adc_dist2 <= rs[i + 1].adc_dist2
                   for i in range(len(rs) - 1))
    # quantized search still finds real structure: nonzero overlap with
    # the exact cosine top-10 across the query set
    truth = {}
    for r in cosine_topk(embs, embs.filter(F.col("vec_id") < 5), k=10).collect():
        truth.setdefault(r.query_id, set()).add(r.corpus_id)
    hits = sum(1 for r in rows if r.corpus_id in truth.get(r.query_id, set()))
    assert hits > 0, "ADC top-k completely disjoint from exact top-10"


def test_bucketed_interval_join_empty_intervals(spark):
    """Empty half-open intervals (end <= start) must produce NO pairs:
    pre-guard, sequence(lo, hi) with hi < lo defaulted to step -1 and
    fabricated a descending bucket grid (phantom rows), and an empty
    interval even satisfies the raw overlap predicate vacuously
    (a=[5,5) vs b=[0,10): 5<10 and 0<5) — the operator filters them
    before the explode (ADVICE r5)."""
    from realtime_log_analytics_flink_kafka_spark.operators.intervals import (
        bucketed_interval_join,
    )

    a = spark.createDataFrame(
        [("k", 5, 5, "empty"),      # empty: end == start
         ("k", 9, 2, "inverted"),   # inverted: end < start
         ("k", 3, 7, "real")],
        "key string, a_start long, a_end long, a_tag string")
    b = spark.createDataFrame(
        [("k", 0, 10, "wide")],
        "key string, b_start long, b_end long, b_tag string")
    out = bucketed_interval_join(
        a, b, ["key"], a_start="a_start", a_end="a_end",
        b_start="b_start", b_end="b_end", bucket_s=4)
    rows = [(r.a_tag, r.b_tag) for r in out.collect()]
    assert rows == [("real", "wide")]


def test_cms_upper_bound_and_grid_size(spark):
    """Count-Min invariants on a forced-collision vocabulary (200 terms
    over a 4x16 grid): the estimate is an upper bound for EVERY probed
    term, exact-equal where no collision occurred, and the materialized
    grid never exceeds d*w cells regardless of vocabulary size."""
    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        cms_cells, cms_estimate_audit,
    )

    rows = [(f"t{i:03d}",) for i in range(200) for _ in range(i % 7 + 1)]
    terms = spark.createDataFrame(rows, "term string")
    d, w = 4, 16
    audit = cms_estimate_audit(terms, "term", d=d, w=w, top=50).collect()
    assert len(audit) == 50
    assert all(r.cms_est >= r.n_exact for r in audit)
    assert all(r.overest == r.cms_est - r.n_exact for r in audit)
    # 200 terms over 16 buckets/row must collide somewhere in the top-50
    assert any(r.overest > 0 for r in audit)
    assert cms_cells(terms, "term", d=d, w=w).count() <= d * w


def test_hll_both_branches(spark):
    """HLL audit on one tiny key (3 distinct -> Flajolet linear-counting
    branch, near-exact) and one large key (5000 distinct -> raw harmonic
    branch, within ~4 sigma of the p=8 standard error)."""
    from pyspark.sql import functions as F
    from realtime_log_analytics_flink_kafka_spark.functions.hashing import md5_long
    from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
        HLL_M, hll_cardinality_audit,
    )

    rows = [("small", f"s{i % 3}") for i in range(50)]
    rows += [("big", f"b{i}") for i in range(5000)]
    items = (spark.createDataFrame(rows, "key string, s string")
             .select("key", md5_long(F.col("s")).alias("h")))
    out = {r.key: r for r in hll_cardinality_audit(items, "key", "h").collect()}
    small, big = out["small"], out["big"]
    assert small.n_exact == 3
    # linear counting with V = m - 3 is near-exact at this cardinality
    assert abs(small.hll_est - 3) < 1.0, small.hll_est
    assert small.n_zero_registers >= HLL_M - 3
    assert big.n_exact == 5000
    # raw-branch estimate: 1.04/sqrt(256) ~ 6.5% sigma; allow 4 sigma
    assert abs(big.rel_err) < 0.26, big.rel_err
    assert big.n_zero_registers == 0 or big.hll_est > 2.5 * HLL_M


def test_intra_doc_dedup_drops_repeats(spark):
    """First-occurrence rule on constructed repeats: a doc whose 8-token
    paragraph repeats 3x keeps exactly one copy; a doc of distinct
    segments keeps everything; order of kept text is original order."""
    import hashlib
    from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
        SEGMENT_TOKENS, intra_doc_dedup,
    )

    para = " ".join(f"w{i}" for i in range(SEGMENT_TOKENS))      # 8 tokens
    tail = " ".join(f"t{i}" for i in range(SEGMENT_TOKENS))
    docs = spark.createDataFrame(
        [(1, f"{para} {para} {para} {tail}"),   # repeat x3 then distinct
         (2, f"{tail} {para}")],                # all distinct
        "doc_id long, text string")
    out = {r.doc_id: r for r in intra_doc_dedup(docs).collect()}
    r1, r2 = out[1], out[2]
    assert (r1.n_segments, r1.n_dropped, r1.tokens_kept) == (4, 2, 16)
    assert (r2.n_segments, r2.n_dropped, r2.tokens_kept) == (2, 0, 16)
    # kept text = first para + tail, in original order
    assert r1.kept_text_hash == hashlib.md5(
        f"{para} {tail}".encode()).hexdigest()
    assert r2.kept_text_hash == hashlib.md5(
        f"{tail} {para}".encode()).hexdigest()


def test_rrf_fuse_semantics(spark):
    """RRF fusion pins: both-branch docs sum two reciprocal terms,
    single-branch docs get one, scores are the half-rounded exact
    rationals, and final_rank orders by the UNROUNDED rational with key
    tie-break."""
    from realtime_log_analytics_flink_kafka_spark.operators.retrieval import (
        RRF_K0, rrf_fuse,
    )

    a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank_lex long")
    b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank_dense long")
    out = {r.doc_id: r for r in rrf_fuse(a, b).collect()}
    assert set(out) == {10, 20, 30}
    # doc 20: 1/(60+2) + 1/(60+1); docs 10/30: single terms
    exp20 = round(1 / (RRF_K0 + 2) + 1 / (RRF_K0 + 1), 6)
    assert out[20].rrf == exp20
    assert out[10].rrf == round(1 / (RRF_K0 + 1), 6)
    assert out[30].rrf == round(1 / (RRF_K0 + 2), 6)
    assert out[20].final_rank == 1          # two terms beat any single
    assert out[10].final_rank == 2          # 1/61 > 1/62
    assert out[30].final_rank == 3
    assert out[10].rank_dense is None and out[30].rank_lex is None
