"""Round-4 operators: C4-style segment dedup, incremental batch-vs-corpus
dedup, and exact-arithmetic latency anomaly detection — semantics pinned
on hand-built micro-fixtures (the oracle-parity suites cover the fixture
tables; these cover the edge cases those tables may not contain).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators import dedup
from realtime_log_analytics_flink_kafka_spark.operators.detect import (
    latency_anomalies,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSegmentDedup:
    def test_shared_segment_dropped_everywhere(self, spark):
        boiler = "a b c d e f g h"
        docs = _docs(spark, [
            (1, boiler + " x y"),
            (2, boiler + " z"),
            (3, "totally different words with no overlap at all ok"),
        ])
        out = {r["doc_id"]: r for r in dedup.segment_dedup(docs).collect()}
        assert out[1]["n_segments"] == 2 and out[1]["n_dropped"] == 1
        assert out[1]["tokens_kept"] == 2          # "x y"
        assert out[2]["n_dropped"] == 1 and out[2]["tokens_kept"] == 1
        # doc 3 has 9 tokens -> 2 segments, nothing shared
        assert out[3]["n_dropped"] == 0 and out[3]["tokens_kept"] == 9

    def test_kept_text_hash_is_md5_of_rejoined_segments(self, spark):
        import hashlib
        docs = _docs(spark, [(1, "one two three")])
        row = dedup.segment_dedup(docs).collect()[0]
        assert row["kept_text_hash"] == \
            hashlib.md5(b"one two three").hexdigest()

    def test_fully_boilerplate_doc_hashes_empty_string(self, spark):
        import hashlib
        docs = _docs(spark, [(1, "same text"), (2, "same text")])
        rows = dedup.segment_dedup(docs).collect()
        assert all(r["kept_text_hash"] == hashlib.md5(b"").hexdigest()
                   and r["tokens_kept"] == 0 for r in rows)

    def test_empty_docs_yield_no_rows(self, spark):
        docs = _docs(spark, [(1, ""), (2, "   "), (3, "real words")])
        assert [r["doc_id"] for r in dedup.segment_dedup(docs).collect()] == [3]

    def test_segment_boundaries_are_non_overlapping(self, spark):
        # 17 tokens with seg=8 -> segments of 8, 8, 1
        text = " ".join(f"t{i}" for i in range(17))
        segs = dedup.corpus_segments(_docs(spark, [(1, text)])) \
            .orderBy("seg_idx").collect()
        assert [s["n_tok"] for s in segs] == [8, 8, 1]
        assert segs[2]["seg_text"] == "t16"


class TestIncrementalDedup:
    def test_exact_dup_in_batch_flagged_against_corpus(self, spark):
        t = "the quick brown fox jumps over the lazy dog again"
        corpus = _docs(spark, [(1, t), (2, "completely unrelated corpus doc here")])
        batch = _docs(spark, [(10, t), (20, "novel fresh content nothing shared")])
        rows = {r["doc_id"]: r
                for r in dedup.incremental_dedup_flags(corpus, batch).collect()}
        assert set(rows) == {10}
        assert rows[10]["matched_corpus_doc"] == 1
        assert rows[10]["best_jaccard"] == 1.0

    def test_no_batch_batch_or_corpus_corpus_pairs(self, spark):
        t = "shared duplicate text appearing in two batch docs only"
        corpus = _docs(spark, [(1, "corpus doc standing entirely alone")])
        batch = _docs(spark, [(10, t), (11, t)])
        # both batch docs duplicate EACH OTHER but nothing in the corpus
        assert dedup.incremental_dedup_flags(corpus, batch).count() == 0


class TestLatencyAnomalies:
    def _logs(self, spark, latencies, day=1):
        rows = [(datetime.datetime(2024, 1, day, 12, 0, i % 60), i, "svc-0", 0,
                 float(v)) for i, v in enumerate(latencies)]
        return spark.createDataFrame(
            rows, "ts timestamp, event_id long, service string, "
                  "is_error int, latency_ms double")

    def test_single_extreme_outlier_flagged(self, spark):
        logs = self._logs(spark, [100.0] * 30 + [10000.0])
        row = latency_anomalies(logs).collect()[0]
        assert row["n_events"] == 31
        assert row["n_outliers"] == 1
        assert row["max_latency_cs"] == 1000000

    def test_uniform_latencies_have_no_outliers(self, spark):
        logs = self._logs(spark, [250.0] * 20)
        row = latency_anomalies(logs).collect()[0]
        assert row["n_outliers"] == 0

    def test_days_are_independent(self, spark):
        a = self._logs(spark, [100.0] * 30 + [10000.0], day=1)
        b = self._logs(spark, [10000.0] * 10, day=2)
        out = {r["day"]: r for r in latency_anomalies(a.union(b)).collect()}
        assert out["2024-01-01"]["n_outliers"] == 1
        # day 2 is uniformly slow: slow is its own baseline, no outliers
        assert out["2024-01-02"]["n_outliers"] == 0

    def test_centi_ms_scaling_is_exact(self, spark):
        # 2-decimal latencies must survive the *100 integerization
        logs = self._logs(spark, [490.02, 0.01, 123.45])
        row = latency_anomalies(logs).collect()[0]
        assert row["max_latency_cs"] == 49002


class TestDocChunks:
    def test_chunk_geometry(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import doc_chunks
        # 40 tokens, chunk=32, stride=16 -> ceil(8/16)+1 = 2 chunks
        text = " ".join(f"w{i}" for i in range(40))
        rows = doc_chunks(_docs(spark, [(1, text)])).orderBy("chunk_idx").collect()
        assert [r["chunk_idx"] for r in rows] == [0, 1]
        assert [r["n_tok"] for r in rows] == [32, 24]

    def test_short_doc_single_chunk(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import doc_chunks
        rows = doc_chunks(_docs(spark, [(1, "just three words")])).collect()
        assert len(rows) == 1 and rows[0]["n_tok"] == 3

    def test_last_window_reaches_last_token(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import doc_chunks
        # 33 tokens -> chunks at 0 and 16; window 1 covers tokens 17..33
        text = " ".join(f"w{i}" for i in range(33))
        rows = doc_chunks(_docs(spark, [(1, text)])).orderBy("chunk_idx").collect()
        assert [r["n_tok"] for r in rows] == [32, 17]

    def test_stride_larger_than_chunk_rejected(self, spark):
        import pytest
        from realtime_log_analytics_flink_kafka_spark.operators.text import doc_chunks
        with pytest.raises(ValueError, match="stride"):
            doc_chunks(_docs(spark, [(1, "a b c")]), chunk=8, stride=32)


class TestBpePairCounts:
    def test_pairs_weighted_by_token_frequency(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import bpe_pair_counts
        docs = _docs(spark, [(1, "abc abc ab xyz")])
        out = {r["pair"]: r["pair_count"]
               for r in bpe_pair_counts(docs).collect()}
        # "ab" occurs in abc (tf 2) and ab (tf 1); "bc" only in abc
        assert out["ab"] == 3
        assert out["bc"] == 2
        assert out["xy"] == 1 and out["yz"] == 1

    def test_rank_is_deterministic_on_ties(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import bpe_pair_counts
        docs = _docs(spark, [(1, "ab cd")])
        rows = bpe_pair_counts(docs).orderBy("rank").collect()
        assert [r["pair"] for r in rows] == ["ab", "cd"]  # count tie -> lexical


class TestSemanticDupClusters:
    def test_chain_collapses_to_one_component(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators import dedup
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
        comp = dedup.duplicate_components(pairs, left_col="id_a",
                                          right_col="id_b")
        got = {r["doc_id"]: r["cluster_id"] for r in comp.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_long_chain_converges_with_pointer_jumping(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators import dedup
        # a 33-node path: naive neighbor propagation needs ~32 rounds,
        # pointer jumping must land well inside max_iters
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(32)], "id_a long, id_b long")
        comp = dedup.duplicate_components(pairs, left_col="id_a",
                                          right_col="id_b", max_iters=10)
        rows = comp.collect()
        assert len(rows) == 33
        assert {r["cluster_id"] for r in rows} == {0}


class TestHardNegatives:
    def test_negatives_never_share_query_label(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import hard_negatives
        vecs = spark.createDataFrame(
            [(i, [float(i % 3), 1.0], i % 2) for i in range(20)],
            "vec_id long, embedding array<float>, label int")
        rows = hard_negatives(
            vecs, vecs.filter(F.col("vec_id") < 2), k=3).collect()
        assert rows, "expected mined negatives"
        assert all(r["neg_label"] != r["query_label"] for r in rows)
        # full k per query: same-label crowding must not shrink the set
        from collections import Counter
        assert set(Counter(r["query_id"] for r in rows).values()) == {3}

    def test_ranks_are_contiguous_from_one(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import hard_negatives
        vecs = spark.createDataFrame(
            [(i, [1.0, float(i)], i % 4) for i in range(12)],
            "vec_id long, embedding array<float>, label int")
        rows = hard_negatives(
            vecs, vecs.filter(F.col("vec_id") < 1), k=4).collect()
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4]


class TestDsirWeights:
    def test_target_lookalikes_outscore_off_domain(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import (
            dsir_log_weights,
        )
        target_text = "alpha beta gamma delta alpha beta gamma delta"
        docs = spark.createDataFrame(
            [(1, target_text, True),
             (2, "alpha beta gamma delta epsilon zeta", False),
             (3, "nothing in common with anything here at all", False)],
            "doc_id long, text string, tgt boolean")
        out = {r["doc_id"]: r["log_weight"]
               for r in dsir_log_weights(docs, F.col("tgt")).collect()}
        # doc 2 shares most vocabulary with the target; doc 3 none
        assert out[2] > out[3]

    def test_every_nonempty_doc_scored(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import (
            dsir_log_weights,
        )
        docs = spark.createDataFrame(
            [(1, "a b c", True), (2, "", False), (3, "d e", False)],
            "doc_id long, text string, tgt boolean")
        rows = dsir_log_weights(docs, F.col("tgt")).collect()
        assert sorted(r["doc_id"] for r in rows) == [1, 3]


class TestBlocklist:
    def test_hard_gate_drops_any_hit(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import (
            blocklist_stats,
        )
        docs = _docs(spark, [
            (1, "clean words only here"),
            (2, "one badword inside this document"),
            (3, ""),
        ])
        out = {r["doc_id"]: r for r in blocklist_stats(
            docs, ("badword",), max_hit_ratio_e4=0).collect()}
        assert out[1]["keep"] and out[1]["n_hits"] == 0
        assert not out[2]["keep"] and out[2]["n_hits"] == 1
        # zero-token docs keep, with NULL (undefined) ratio
        assert out[3]["keep"] and out[3]["hit_ratio"] is None

    def test_soft_threshold_tolerates_low_ratios(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.text import (
            blocklist_stats,
        )
        # 1 hit / 50 tokens = 2% exactly: keep at <=2%, drop at <=1.99%
        text = "bad " + " ".join(f"w{i}" for i in range(49))
        docs = _docs(spark, [(1, text)])
        keep_at = lambda e4: blocklist_stats(  # noqa: E731
            docs, ("bad",), max_hit_ratio_e4=e4).collect()[0]["keep"]
        assert keep_at(200)
        assert not keep_at(199)
