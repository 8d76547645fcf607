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


class TestMetricsReconciliation:
    def test_full_outer_keeps_every_log_day(self, spark):
        recon = _run(spark, "metrics_reconciliation")
        p95_days = _run(spark, "latency_p95_daily") \
            .select("service", "window_start")
        assert recon.count() >= p95_days.count() > 0
        missing = p95_days.join(
            recon.select("service", "window_start"),
            ["service", "window_start"], "left_anti")
        assert missing.count() == 0

    def test_alerts_never_orphaned(self, spark):
        """Alerts are derived from logs, so a day with alerts but no
        traffic would be a pipeline bug — the reconciliation must show
        zero 'alerts_only' rows on consistent data."""
        rows = _run(spark, "metrics_reconciliation").collect()
        assert all(r.coverage != "alerts_only" for r in rows)
        assert any(r.coverage == "both" for r in rows)


class TestServiceDailyGapfill:
    def test_dense_rectangular_spine(self, spark):
        rows = _run(spark, "service_daily_gapfill").collect()
        services = {r.service for r in rows}
        days = {r.day_start for r in rows}
        assert len(rows) == len(services) * len(days)
        step = 86400
        lo, hi = min(days), max(days)
        assert days == set(range(lo, hi + step, step))

    def test_counts_preserved_and_gap_distance(self, spark):
        rows = _run(spark, "service_daily_gapfill").collect()
        assert sum(r.n_events for r in rows) == \
            _run(spark, "latency_p95_daily").agg(
                F.sum("total_logs")).collect()[0][0]
        for r in rows:
            if r.n_events > 0:
                assert r.days_since_activity == 0
            assert r.is_gap == (r.n_events == 0)


class TestAlertMetricsUnpivot:
    def test_melt_shape_and_roundtrip(self, spark):
        wide = _run(spark, "alert_metrics_daily")
        long = _run(spark, "alert_metrics_unpivot")
        assert long.count() == 4 * wide.count()
        # re-pivoting one metric recovers the wide column exactly
        back = {(r.service, r.window_start): r.value
                for r in long.filter(F.col("metric") == "total_alerts")
                .collect()}
        for r in wide.select("service", "window_start",
                             "total_alerts").collect():
            assert back[(r.service, r.window_start)] == r.total_alerts


class TestLatencyBandsDaily:
    def test_band_ordering(self, spark):
        rows = _run(spark, "latency_bands_daily").collect()
        assert rows
        for r in rows:
            assert r.p50 <= r.p90 <= r.p99 <= r.max_latency

    def test_p50_agrees_with_median_query_overall(self, spark):
        """Daily p50s must bracket the per-service global median."""
        med = {r.service: r.median_latency
               for r in _run(spark, "latency_median_mad").collect()}
        by_svc: dict[str, list[float]] = {}
        for r in _run(spark, "latency_bands_daily").collect():
            by_svc.setdefault(r.service, []).append(r.p50)
        for svc, p50s in by_svc.items():
            assert min(p50s) <= med[svc] <= max(p50s)


class TestErrorBudgetBurn:
    def test_burn_is_cumulative_rate_over_slo(self, spark):
        rows = sorted(_run(spark, "error_budget_burn").collect(),
                      key=lambda r: (r.service, r.day_start))
        cum: dict[str, list[int]] = {}
        for r in rows:
            n, e = cum.setdefault(r.service, [0, 0])
            cum[r.service] = [n + r.n_events, e + r.n_errors]
            n2, e2 = cum[r.service]
            want = round(e2 * 10_000 / (n2 * 2000), 4)
            assert r.burn_ratio == pytest.approx(want, abs=1e-9)
            assert 0.0 <= r.error_rate <= 1.0


class TestClusterBalancedSample:
    def test_quota_and_determinism(self, spark):
        df1 = _run(spark, "cluster_balanced_sample")
        rows = df1.collect()
        per = {}
        for r in rows:
            per.setdefault(r.centroid_id, []).append(r.rnk)
        for ranks in per.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 5
        again = {(r.centroid_id, r.vec_id, r.rnk)
                 for r in _run(spark, "cluster_balanced_sample").collect()}
        assert again == {(r.centroid_id, r.vec_id, r.rnk) for r in rows}


class TestClusterBestRepresentative:
    def test_exactly_one_keeper_per_cluster(self, spark):
        rows = _run(spark, "cluster_best_representative").collect()
        assert rows
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for members in by_cluster.values():
            keepers = [r for r in members if r.keep]
            assert len(keepers) == 1
            # the keeper dominates on (quality desc, doc_id asc)
            k = keepers[0]
            for r in members:
                assert (k.q_e4, -k.doc_id) >= (r.q_e4, -r.doc_id)

    def test_same_membership_as_dup_clusters(self, spark):
        a = {(r.doc_id, r.cluster_id)
             for r in _run(spark, "dup_clusters").collect()}
        b = {(r.doc_id, r.cluster_id)
             for r in _run(spark, "cluster_best_representative").collect()}
        assert a == b


class TestQualityVsPerplexity:
    def test_contingency_mass(self, spark):
        rows = _run(spark, "quality_vs_perplexity").collect()
        assert rows
        assert all(1 <= r.quality_bucket <= 3 and 1 <= r.ppl_bucket <= 3
                   for r in rows)
        # total docs == surprisal-scored docs (the join keeps exactly them)
        total = sum(r.n_docs for r in rows)
        assert total == _run(spark, "unigram_surprisal").count()


class TestDedupThresholdSweep:
    def test_monotone_and_anchored(self, spark):
        rows = sorted(_run(spark, "dedup_threshold_sweep").collect(),
                      key=lambda r: r.threshold)
        assert [r.threshold for r in rows] == [0.2, 0.4, 0.6, 0.8]
        counts = [r.n_pairs for r in rows]
        assert counts == sorted(counts, reverse=True)
        # the 0.4 sweep point must agree with the registry's verified
        # pair count at MINHASH_THRESHOLD = 0.4... up to rounding: the
        # sweep rounds jaccard to 4 dp half-up before comparing, exactly
        # like the verified-pairs query, so the counts are EQUAL
        assert rows[1].n_pairs == _run(spark, "dedup_minhash_lsh").count()


class TestEmbeddingAudit:
    def test_norm_bounds_and_counts(self, spark):
        rows = _run(spark, "embedding_audit").collect()
        assert rows
        from realtime_log_analytics_flink_kafka_spark.sources.batch import \
            load_table
        total = sum(r.n_vecs for r in rows)
        assert total == load_table(spark, SF_SMOKE, "embeddings").count()
        for r in rows:
            assert 0 <= r.n_zero_norm <= r.n_vecs
            assert 0.0 <= r.min_norm <= r.max_norm


class TestHourlyProfile:
    def test_shares_sum_to_one_per_type(self, spark):
        rows = _run(spark, "hourly_profile").collect()
        assert rows
        by_type: dict[str, float] = {}
        for r in rows:
            assert 0 <= r.hour <= 23
            by_type[r.event_type] = by_type.get(r.event_type, 0.0) \
                + r.hour_share
        # shares are 6-dp rationals of the exact distribution: per type
        # they sum to 1 within 24 half-roundings
        for s in by_type.values():
            assert abs(s - 1.0) <= 24 * 5e-7


class TestLatencyMedianMad:
    def test_per_service_shapes(self, spark):
        rows = _run(spark, "latency_median_mad").collect()
        assert rows
        for r in rows:
            assert r.n_events > 0
            assert r.median_latency is not None
            assert r.mad_latency is not None and r.mad_latency >= 0.0
