"""Cross-query invariants for the round-4 diagnostic/curation queries,
at smoke scale — properties the per-query oracle hash cannot see:
consistency BETWEEN sibling queries (the per-doc boilerplate counts must
re-aggregate to the span report; the degree histogram must account for
every pair endpoint), probability-mass checks, and budget feasibility.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_SMOKE

Q = all_queries()


def _run(spark, name):
    return Q[name].fn(spark, SF_SMOKE)


class TestBoilerplateFraction:
    def test_bounds(self, spark):
        rows = _run(spark, "boilerplate_fraction").collect()
        assert rows
        for r in rows:
            assert 0 <= r.n_dup_spans <= r.n_spans
            assert r.dup_frac is not None and 0.0 <= r.dup_frac <= 1.0

    def test_reaggregates_to_span_report(self, spark):
        """Σ per-doc dup positions == Σ span-report occurrences: the two
        views of the same duplicated-span set must account for the
        identical position count."""
        spans = _run(spark, "duplicate_ngram_spans") \
            .agg(F.sum("n_occurrences")).collect()[0][0] or 0
        per_doc = _run(spark, "boilerplate_fraction") \
            .agg(F.sum("n_dup_spans")).collect()[0][0] or 0
        assert per_doc == spans > 0


class TestDupGraphDegrees:
    def test_handshake_lemma(self, spark):
        """Σ degree·n_docs == 2·|pairs| — every pair contributes exactly
        two endpoints."""
        n_pairs = _run(spark, "dedup_minhash_lsh").count()
        mass = _run(spark, "dup_graph_degrees") \
            .agg(F.sum(F.col("degree") * F.col("n_docs"))).collect()[0][0] or 0
        assert mass == 2 * n_pairs > 0


class TestTemperatureMixture:
    def test_probability_mass(self, spark):
        rows = _run(spark, "temperature_mixture").collect()
        assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-12
        assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-12

    def test_small_sources_upweighted(self, spark):
        """α<1 damps the head: boost is monotone DECREASING in raw
        share."""
        rows = sorted(_run(spark, "temperature_mixture").collect(),
                      key=lambda r: r.p_raw)
        boosts = [r.boost for r in rows]
        assert boosts == sorted(boosts, reverse=True)

    def test_sweep_alpha_half_matches_sqrt_form(self, spark):
        """det_exp(0.5·det_ln n) and sqrt(n) are different DAGs for the
        same power — shares must agree to ~1e-12 relative."""
        sqrt_form = {r.source: r.p_temp
                     for r in _run(spark, "temperature_mixture").collect()}
        sweep = {r.source: r.p_temp
                 for r in _run(spark, "mixture_temperature_sweep").collect()
                 if r.alpha_pct == 50}
        assert sweep.keys() == sqrt_form.keys()
        for s in sweep:
            assert sweep[s] == pytest.approx(sqrt_form[s], rel=1e-12)

    def test_sweep_mass_and_head_monotonicity(self, spark):
        rows = _run(spark, "mixture_temperature_sweep").collect()
        by_alpha: dict[int, dict[str, float]] = {}
        for r in rows:
            by_alpha.setdefault(r.alpha_pct, {})[r.source] = r.p_temp
        assert set(by_alpha) == {30, 50, 70}
        for shares in by_alpha.values():
            assert abs(sum(shares.values()) - 1.0) < 1e-12
        # the LARGEST source's share grows back toward raw as α rises
        tokens = {r.source: r.n_tokens for r in rows}
        head = max(tokens, key=tokens.get)
        assert by_alpha[30][head] < by_alpha[50][head] < by_alpha[70][head]


class TestTokenBudgetCut:
    def test_budget_respected(self, spark):
        rows = _run(spark, "token_budget_cut").collect()
        total = sum(r.total_tokens for r in rows)
        kept = sum(r.tokens_selected for r in rows)
        assert 0 < kept <= total * 50 // 100
        for r in rows:
            assert 0 <= r.n_selected <= r.n_docs
            assert 0 <= r.tokens_selected <= r.total_tokens


class TestSkewAudit:
    def test_topk_shape_and_shares(self, spark):
        rows = _run(spark, "skew_audit").collect()
        assert 0 < len(rows) <= 20
        counts = [r.n_events for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert all(0.0 < r.share <= 1.0 for r in rows)
        # the heaviest key is at least the mean key (skew factor ≥ 1 up
        # to the 4-dp rounding of exact_round_div)
        assert rows[0].skew_vs_mean >= 1.0 - 5e-5


class TestLatencyMedianMad:
    def test_per_service_shapes(self, spark):
        rows = _run(spark, "latency_median_mad").collect()
        assert rows
        for r in rows:
            assert r.n_events > 0
            assert r.median_latency is not None
            assert r.mad_latency is not None and r.mad_latency >= 0.0
