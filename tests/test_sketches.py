"""Misra-Gries heavy-hitter candidates + exact recount
(operators/sketches).

The load-bearing property is the SUPERSET guarantee: however the data is
partitioned and batched, every term with global frequency >= num/den
must appear among the candidates — the exact recount then makes the
final output identical to the naive full-vocabulary GROUP BY.  The
randomized test drives skewed corpora through both paths and compares
exactly.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.sketches import (
    frequent_terms, misra_gries_candidates)


def _terms_df(spark, words, partitions):
    return spark.createDataFrame(
        [(w,) for w in words], "term string").repartition(partitions)


def _naive(spark, words, num, den):
    df = _terms_df(spark, words, 4)
    total = len(words)
    return {
        (r["term"], r["n"]) for r in
        df.groupBy("term").agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") * den >= total * num).collect()
    }


class TestMisraGries:
    def _zipf_corpus(self, rng, vocab, n):
        # skewed: word i with weight 1/(i+1) — a few true heavy hitters
        # over a long tail
        weights = [1.0 / (i + 1) for i in range(vocab)]
        return rng.choices([f"w{i}" for i in range(vocab)],
                           weights=weights, k=n)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("partitions", [1, 3, 8])
    def test_exact_equality_with_naive(self, spark, seed, partitions):
        rng = random.Random(seed)
        words = self._zipf_corpus(rng, vocab=300, n=5_000)
        df = _terms_df(spark, words, partitions)
        got = {(r["term"], r["n"]) for r in
               frequent_terms(df, "term", num=1, den=50).collect()}
        assert got == _naive(spark, words, 1, 50) and got

    def test_candidates_are_superset_at_minimal_k(self, spark):
        """k = ceil(1/phi) alone (no slack) must already catch every
        true heavy hitter — the theoretical bound, not the slack."""
        rng = random.Random(7)
        words = self._zipf_corpus(rng, vocab=500, n=8_000)
        df = _terms_df(spark, words, 8)
        total = len(words)
        cands = {r["term"] for r in
                 misra_gries_candidates(df, "term", k=50).collect()}
        from collections import Counter
        true_hh = {w for w, c in Counter(words).items()
                   if c * 50 >= total}
        assert true_hh <= cands
        # and the summary is actually small per partition: the union is
        # far below the vocabulary
        assert len(cands) <= 8 * 51

    def test_all_unique_terms_yields_empty(self, spark):
        words = [f"u{i}" for i in range(2_000)]
        df = _terms_df(spark, words, 4)
        assert frequent_terms(df, "term", num=1, den=100).count() == 0

    def test_single_dominant_term(self, spark):
        words = ["dom"] * 900 + [f"t{i}" for i in range(100)]
        random.Random(3).shuffle(words)
        df = _terms_df(spark, words, 5)
        rows = frequent_terms(df, "term", num=1, den=2).collect()
        assert [(r["term"], r["n"], r["total_terms"]) for r in rows] \
            == [("dom", 900, 1000)]

    def test_plan_shape(self, spark):
        """The candidate pass is MapInPandas (bounded per-partition
        state), the recount joins the broadcast candidate set, and no
        row-at-a-time Python appears anywhere."""
        df = _terms_df(spark, ["a", "a", "b"], 2)
        plan = frequent_terms(df, "term", num=1, den=2) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan

    def test_broadcast_guard_fallback(self, spark):
        """VERDICT r6 #3 / ADVICE r7: the MG candidate union is
        O(k·P), so the forced broadcast hint must disengage once the
        byte estimate k·P·est_term_bytes exceeds
        ``broadcast_candidate_bytes`` and leave the join strategy to
        Catalyst.  With auto-broadcast disabled, the guarded path must
        show NO BroadcastHashJoin on the recount (the hint is gone)
        while the under-limit path still forces one — and both paths
        return identical exact results."""
        rng = random.Random(11)
        words = self._zipf_corpus(rng, vocab=300, n=5_000)
        df = _terms_df(spark, words, 8)
        want = _naive(spark, words, 1, 50)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            forced = frequent_terms(df, "term", num=1, den=50)
            guarded = frequent_terms(df, "term", num=1, den=50,
                                     broadcast_candidate_bytes=1)
            p_forced = forced._jdf.queryExecution() \
                .executedPlan().toString()
            p_guarded = guarded._jdf.queryExecution() \
                .executedPlan().toString()
            assert "BroadcastHashJoin" in p_forced
            assert "BroadcastHashJoin" not in p_guarded, p_guarded
            got_f = {(r["term"], r["n"]) for r in forced.collect()}
            got_g = {(r["term"], r["n"]) for r in guarded.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert got_f == want and got_g == want and want
