"""Semantic tests for the round-3 operators — properties the oracle
parity check can't express (parity proves Spark == DuckDB, these prove
the shared semantics are the INTENDED ones).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators import (
    packing, similarity, text)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBigramSurprisal:
    def test_scores_word_order_not_just_vocabulary(self, spark):
        """The defining property vs unigram: a doc whose text is a
        shuffled permutation of a common phrase keeps its unigram
        surprisal but gains bigram surprisal (its transitions are rare
        in the corpus)."""
        phrase = "the cat sat on the mat"
        shuffled = "mat the on sat cat the"
        docs = _docs(spark, [(i, phrase) for i in range(9)] + [(9, shuffled)])
        uni = {r.doc_id: r.mean_surprisal
               for r in text.unigram_surprisal(docs).collect()}
        bi = {r.doc_id: r.mean_surprisal
              for r in text.bigram_surprisal(docs).collect()}
        # same bag of words -> identical unigram surprisal
        assert uni[9] == pytest.approx(uni[0], abs=1e-6)
        # novel transitions -> strictly higher bigram surprisal
        assert bi[9] > bi[0]

    def test_repeated_phrase_has_zero_bigram_surprisal(self, spark):
        """A corpus of one repeated deterministic chain: every transition
        has p=1, surprisal exactly 0."""
        docs = _docs(spark, [(i, "a b c d") for i in range(3)])
        for r in text.bigram_surprisal(docs).collect():
            assert r.mean_surprisal == 0.0
            assert r.n_bigrams == 3

    def test_single_token_docs_drop_out(self, spark):
        docs = _docs(spark, [(0, "hello"), (1, "a b")])
        got = {r.doc_id for r in text.bigram_surprisal(docs).collect()}
        assert got == {1}


class TestRecallAtK:
    def _ranked(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, corpus_id long, rank long")

    def test_perfect_and_partial_and_zero(self, spark):
        exact = self._ranked(spark, [(0, 10, 1), (0, 11, 2),
                                     (1, 20, 1), (1, 21, 2),
                                     (2, 30, 1), (2, 31, 2)])
        approx = self._ranked(spark, [(0, 10, 1), (0, 11, 2),   # perfect
                                      (1, 20, 1), (1, 99, 2)])  # half; q2 empty
        got = {r.query_id: r for r in
               similarity.recall_at_k(approx, exact).collect()}
        assert got[0].recall == 1.0
        assert got[1].recall == 0.5
        # a query with NO approx candidates still reports 0.0
        assert got[2].recall == 0.0 and got[2].n_hits == 0

    def test_registry_recall_measured_and_multiprobe_recovers(self, spark):
        """IVF@3 recall vs brute force@3 on the real embeddings: the
        single-probe number at sf0.001 is genuinely modest (~0.47 — only
        ~6 coarse cells, so boundary queries miss often), and that is
        exactly why the query exists: the approximation is monitored.
        The structural property asserted is that multiprobe recall >=
        single-probe recall per query (superset of candidates)."""
        from realtime_log_analytics_flink_kafka_spark.operators import (
            similarity as sim)
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            IVF_CENTROID_EVERY, IVF_K, IVF_N_PROBE, KNN_N_QUERIES,
            _embs, q_knn_recall)
        rows = q_knn_recall(spark, "/root/testdata/sf0.001").collect()
        assert rows, "no queries scored"
        single = {r.query_id: r.recall for r in rows}
        assert sum(single.values()) > 0, f"IVF recall collapsed: {rows}"

        embs = _embs(spark, "/root/testdata/sf0.001")
        exact = sim.cosine_topk(
            embs, embs.filter(F.col("vec_id") < KNN_N_QUERIES), k=IVF_K)
        multi = sim.ivf_topk_multiprobe(
            embs, k=IVF_K, centroid_every=IVF_CENTROID_EVERY,
            n_queries=KNN_N_QUERIES, n_probe=IVF_N_PROBE)
        multi_recall = {r.query_id: r.recall for r in
                        sim.recall_at_k(multi, exact).collect()}
        for qid, r in single.items():
            assert multi_recall[qid] >= r, (qid, multi_recall[qid], r)


class TestShardEfficiency:
    def test_fill_rates_sum_to_corpus(self, spark):
        t = spark.createDataFrame(
            [(i, 10) for i in range(100)], "doc_id long, n_tokens long")
        shards = packing.packed_shards(t, budget=64, bucket_span=16)
        eff = packing.shard_efficiency(shards, budget=64).collect()
        assert sum(r.tokens_started for r in eff) == 1000
        assert sum(r.n_docs for r in eff) == 100
        # with uniform 10-token docs and budget 64, every shard starts
        # 6 or 7 docs; fill_rate hovers around 1.0 except possibly last
        for r in sorted(eff, key=lambda r: r.shard_id)[:-1]:
            assert 0.9 <= r.fill_rate <= 1.2, r

    def test_straddling_doc_counts_in_start_shard(self, spark):
        t = spark.createDataFrame([(0, 50), (1, 50)],
                                  "doc_id long, n_tokens long")
        shards = packing.packed_shards(t, budget=64, bucket_span=16)
        eff = {r.shard_id: r for r in
               packing.shard_efficiency(shards, budget=64).collect()}
        # doc 1 starts at offset 50 (shard 0) and straddles into shard 1
        assert eff[0].tokens_started == 100
        assert eff[0].fill_rate > 1.0
        assert 1 not in eff  # no doc STARTS in shard 1


class TestQualityFunnel:
    def test_survivors_monotonically_decrease(self, spark):
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_quality_filter_funnel)
        rows = sorted(q_quality_filter_funnel(
            spark, "/root/testdata/sf0.001").collect(),
            key=lambda r: r.stage_idx)
        assert [r.stage for r in rows] == [
            "all", "length", "language", "repetition", "quality"]
        counts = [r.survivors for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert counts[0] > 0
        # the funnel must actually filter something and keep something
        assert counts[-1] < counts[0]
        assert counts[-1] > 0


class TestLatenessAudit:
    def test_buckets_partition_the_stream(self, spark):
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_event_lateness_audit)
        from realtime_log_analytics_flink_kafka_spark.sources.batch import (
            load_table)
        rows = q_event_lateness_audit(spark, "/root/testdata/sf0.001").collect()
        total = sum(r.n_events for r in rows)
        assert total == load_table(
            spark, "/root/testdata/sf0.001", "events").count()
        for r in rows:
            assert r.lateness_bucket in {
                "on_time", "le_1m", "le_10m", "le_1h", "gt_1h"}


class TestNgramSpans:
    def test_span_count_and_short_doc_guard(self, spark):
        """A doc with L tokens yields L-n+1 spans; docs shorter than n
        yield none (the F.sequence descending-sequence trap: sequence(1,
        k<1) counts DOWN, so the guard must produce an empty array, not
        a reversed one)."""
        docs = _docs(spark, [(0, "a b c d e"), (1, "a b"), (2, "x y z")])
        got = text.ngram_spans(docs, 3).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r.doc_id, []).append(r.gram)
        assert sorted(by_doc[0]) == ["a b c", "b c d", "c d e"]
        assert 1 not in by_doc          # 2 tokens < n=3 -> no spans
        assert by_doc[2] == ["x y z"]   # exactly n tokens -> one span

    def test_cross_doc_spans_detected(self, spark):
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            SPAN_MIN_DOCS, q_duplicate_ngram_spans)
        rows = q_duplicate_ngram_spans(
            spark, "/root/testdata/sf0.001").collect()
        assert rows, "fixture injects near-dups; span report must fire"
        for r in rows:
            assert r.n_docs >= SPAN_MIN_DOCS
            assert r.n_occurrences >= r.n_docs


class TestCentroidSimilarity:
    def test_pairs_cover_all_label_pairs_once(self, spark):
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_centroid_similarity)
        rows = q_centroid_similarity(spark, "/root/testdata/sf0.001").collect()
        labels = set()
        for r in rows:
            assert r.label_a < r.label_b
            assert -1.0 <= r.cosine <= 1.0
            labels.update((r.label_a, r.label_b))
        n = len(labels)
        assert len(rows) == n * (n - 1) // 2


def test_perplexity_buckets_balanced_within_lang(spark):
    """ntile(3) contract: within each language the terciles differ by at
    most one doc, bucket ids are 1..3, and bucket order tracks the
    surprisal order (max(b1) <= min(b2) <= ... modulo ties broken by id)."""
    from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
        q_perplexity_buckets)
    from tests.conftest import SF_SMOKE

    rows = q_perplexity_buckets(spark, SF_SMOKE).collect()
    assert rows and all(1 <= r.ppl_bucket <= 3 for r in rows)
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {}).setdefault(r.ppl_bucket, []).append(r)
    for lang, buckets in by_lang.items():
        sizes = [len(v) for v in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        for b in range(1, len(buckets)):
            lo = max(x.mean_surprisal for x in buckets[b])
            hi = min(x.mean_surprisal for x in buckets[b + 1])
            assert lo <= hi, (lang, b, lo, hi)
