"""Round-9 operator tests: the robust_trend trailing-window bound, the
kcore rounds guard, textrank's cache self-cleanup, and the new
model-eval / privacy-audit query families (AUC, calibration,
k-anonymity)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


class TestRobustTrendBound:
    def test_multi_year_series_is_capped(self, spark):
        """A 3000-day daily series must be truncated to the trailing
        ROBUST_TREND_MAX_DAYS observed days BEFORE pairing: n_days and
        n_pairs reflect the cap, bounding the per-service percentile
        buffer at max_days*(max_days-1)/2 slopes."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            ROBUST_TREND_MAX_DAYS, robust_trend_from_daily)
        n, m = 3000, ROBUST_TREND_MAX_DAYS
        daily = spark.createDataFrame(
            [("svc", d, 10 + (d % 3)) for d in range(n)],
            "service string, x long, y long")
        [r] = robust_trend_from_daily(daily).collect()
        assert r.n_days == m
        assert r.n_pairs == m * (m - 1) // 2

    def test_cap_equals_explicit_truncation(self, spark):
        """Capped statistic == the statistic over only the most recent
        max_days rows (the cap is a pure trailing-window restriction,
        not an approximation)."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            robust_trend_from_daily)
        rows = [("a", d, 5 + (7 * d) % 11) for d in range(40)] + \
               [("b", d, 3 + (5 * d) % 7) for d in range(9)]
        daily = spark.createDataFrame(rows, "service string, x long, y long")
        capped = {tuple(r) for r in
                  robust_trend_from_daily(daily, max_days=25).collect()}
        trunc = daily.filter((F.col("service") == "b") | (F.col("x") >= 15))
        full = {tuple(r) for r in
                robust_trend_from_daily(trunc, max_days=10**6).collect()}
        assert capped == full

    def test_fixture_scale_untouched_by_default_cap(self, spark):
        """The fixture window (~12 observed days/service) sits far under
        the 365-day default, so the cap must be a no-op there — the
        driver-hash contract of robust_trend is unchanged."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            robust_trend)
        t0 = datetime(2024, 1, 1)
        rows = [(t0 + timedelta(days=d, seconds=i), "svc", 1)
                for d in range(12) for i in range(4 + d)]
        df = spark.createDataFrame(
            rows, "ts timestamp, service string, is_error int")
        a = {tuple(r) for r in robust_trend(df).collect()}
        b = {tuple(r) for r in robust_trend(df, max_days=10**6).collect()}
        assert a == b
        [r] = a
        assert r[1] == 12 and r[2] == 66  # n_days, n_pairs


class TestKcoreRoundsGuard:
    @pytest.mark.parametrize("rounds", [0, 1])
    def test_rounds_below_two_raise(self, spark, rounds):
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            kcore_membership)
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        with pytest.raises(ValueError, match="rounds >= 2"):
            kcore_membership(pairs, rounds=rounds)

    def test_rounds_two_still_works(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            kcore_membership)
        # triangle + pendant: the triangle is the exact 2-core
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long")
        rows = {r.doc_id: r for r in
                kcore_membership(pairs, ks=(2,), rounds=2).collect()}
        assert rows[1].in_2core and rows[2].in_2core and rows[3].in_2core
        assert not rows[4].in_2core


class TestTextrankCacheRelease:
    def test_no_resident_iteration_caches_after_materialization(self, spark):
        """textrank_keywords must not leave its g/wdeg MEMORY_AND_DISK
        blocks resident (ADVICE r8): after the operator returns, the
        only storage it may hold is the eager localCheckpoint of the
        <= topn-row result itself."""
        from realtime_log_analytics_flink_kafka_spark.operators.text import (
            textrank_keywords)
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        before = jsc.getPersistentRDDs().size()
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta " * 3)
             for i in range(20)], "doc_id long, text string")
        out = textrank_keywords(docs, topn=5)
        assert out.count() == 5
        after = jsc.getPersistentRDDs().size()
        # one tiny checkpointed result RDD may remain; g/wdeg must not
        assert after - before <= 1, (before, after)


class TestModelEvalQueries:
    def test_auc_single_class_day_is_null(self, spark, tmp_path):
        """A service-day with only errors (or only successes) has no
        defined AUC — the row survives with auc NULL, not a crash or a
        dropped group."""
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_error_latency_auc)
        events = spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 0, 0, 0), 4, "error", 100.0, "{}"),
             (2, datetime(2024, 1, 1, 0, 0, 1), 4, "error", 50.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string")
        events.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        [r] = q_error_latency_auc(spark, str(tmp_path)).collect()
        assert r.n_pos == 2 and r.n_neg == 0 and r.auc is None

    def test_calibration_hand_check(self, spark, tmp_path):
        """Two bands, perfect train/test agreement in band 0, a known
        gap in band 1 (train 1/2 vs test 1/1)."""
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_error_rate_calibration)
        rows, eid = [], 0
        # day 0 (even epoch day ~ 19723? use explicit dates): train
        # parity depends on epoch day % 2: 2024-01-01 is day 19723 (odd).
        d_odd = datetime(2024, 1, 1)    # epoch day 19723 -> parity 1
        d_even = datetime(2024, 1, 2)   # epoch day 19724 -> parity 0
        def ev(ts, typ, lat):
            nonlocal eid
            eid += 1
            return (eid, ts, 4, typ, lat, "{}")
        data = [
            # band 0 (<50ms): train 1 err / 2, test 1 err / 2
            ev(d_even, "error", 10.0), ev(d_even, "click", 20.0),
            ev(d_odd, "error", 10.0), ev(d_odd, "click", 20.0),
            # band 1 (50-100ms): train 1 err / 2, test 1 err / 1
            ev(d_even, "error", 60.0), ev(d_even, "click", 70.0),
            ev(d_odd, "error", 60.0),
        ]
        df = spark.createDataFrame(
            data, "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string")
        df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
        rows = {r.band: r for r in
                q_error_rate_calibration(spark, str(tmp_path)).collect()}
        assert rows[0].p_hat == 0.5 and rows[0].acc == 0.5
        assert rows[0].abs_gap == 0.0
        assert rows[1].p_hat == 0.5 and rows[1].acc == 1.0
        assert rows[1].abs_gap == 0.5

    def test_k_anonymity_hand_check(self, spark, tmp_path):
        """One segment: a 3-row group, a 5-row group, and a singleton —
        rows_lt_5 counts the 3-group and the singleton (4 rows),
        rows_lt_10 counts all 9."""
        from realtime_log_analytics_flink_kafka_spark.queries.relational import (
            q_k_anonymity_audit)
        rows = []
        ck = 0
        for nation, bal, n in [(1, 500.0, 3), (2, 1500.0, 5), (3, 2500.0, 1)]:
            for _ in range(n):
                ck += 1
                rows.append((ck, f"c{ck}", nation, bal, "SEG"))
        df = spark.createDataFrame(
            rows, "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string")
        df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
        [r] = q_k_anonymity_audit(spark, str(tmp_path)).collect()
        assert (r.n_rows, r.n_groups, r.n_singletons) == (9, 3, 1)
        assert (r.rows_lt_5, r.rows_lt_10) == (4, 9)
        assert (r.min_group_size, r.max_group_size) == (1, 5)
        assert r.risk_ratio_5 == 0.4444


class TestHoltForecast:
    def test_recurrence_matches_python(self, spark):
        """Fold output equals the straight-line Python recurrence on a
        known series (l0 = y0, b0 = 0)."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            HOLT_ALPHA, HOLT_BETA, HOLT_ONE_MINUS_ALPHA,
            HOLT_ONE_MINUS_BETA, holt_from_daily)
        ys = [10.0, 12.0, 11.0, 15.0, 14.0, 20.0]
        daily = spark.createDataFrame(
            [("svc", i, int(y)) for i, y in enumerate(ys)],
            "service string, x long, y long")
        [r] = holt_from_daily(daily).collect()
        l, b, sse = ys[0], 0.0, 0.0
        for y in ys[1:]:
            resid = y - (l + b)
            l_new = HOLT_ALPHA * y + HOLT_ONE_MINUS_ALPHA * (l + b)
            b = HOLT_BETA * (l_new - l) + HOLT_ONE_MINUS_BETA * b
            l = l_new
            sse += resid * resid
        assert (r.level, r.trend, r.sse) == (l, b, sse)
        assert r.forecast_next == l + b and r.n_days == 6

    def test_single_day_service(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            holt_from_daily)
        daily = spark.createDataFrame([("only", 3, 7)],
                                      "service string, x long, y long")
        [r] = holt_from_daily(daily).collect()
        assert (r.level, r.trend, r.forecast_next, r.sse) \
            == (7.0, 0.0, 7.0, 0.0)

    def test_out_of_order_input_is_sorted(self, spark):
        """The fold must order by day regardless of input row order."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            holt_from_daily)
        fwd = spark.createDataFrame(
            [("s", i, 10 + i) for i in range(5)],
            "service string, x long, y long")
        rev = spark.createDataFrame(
            [("s", i, 10 + i) for i in reversed(range(5))],
            "service string, x long, y long")
        assert holt_from_daily(fwd).collect() == \
            holt_from_daily(rev).collect()


class TestChangepointSplit:
    def test_obvious_level_shift_found(self, spark):
        """10,10,10,10,50,50,50: the split belongs after day 3."""
        from datetime import datetime, timedelta
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            DAY_REBASE, changepoint_split)
        t0 = datetime(2024, 1, 1)
        rows = []
        for d, n in enumerate([10, 10, 10, 10, 50, 50, 50]):
            for i in range(n):
                rows.append((t0 + timedelta(days=d, seconds=i), "svc", 1))
        df = spark.createDataFrame(
            rows, "ts timestamp, service string, is_error int")
        [r] = changepoint_split(df).collect()
        day0 = int(t0.timestamp()) // 86400 - DAY_REBASE
        assert r.split_last_left_day == day0 + 3
        assert r.left_days == 4 and r.left_sum == 40
        assert r.n_days == 7 and r.total_errors == 190
        # gain by hand: 40²/4 + 150²/3 − 190²/7
        assert r.gain == 40.0**2 / 4 + 150.0**2 / 3 - 190.0**2 / 7

    def test_single_day_keeps_null_row(self, spark):
        from datetime import datetime
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            changepoint_split)
        df = spark.createDataFrame(
            [(datetime(2024, 1, 1), "only", 1)],
            "ts timestamp, service string, is_error int")
        [r] = changepoint_split(df).collect()
        assert r.n_days == 1 and r.total_errors == 1
        assert r.split_last_left_day is None and r.gain is None


class TestAcfDaily:
    def test_alternating_series_hand_values(self, spark):
        """y = 1,2,1,2,1,2 has mu=1.5, ssq=1.5 — lag-1 pairs all
        anti-correlate (acf = -1.25/1.5), lag-2 all correlate
        (1.0/1.5), lag-3 anti (-0.75/1.5); every value is the exact
        double the integer-sum DAG produces."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            acf_from_daily)
        daily = spark.createDataFrame(
            [("svc", d, 1 + d % 2) for d in range(6)],
            "service string, x long, y long")
        rows = {r.lag: r for r in acf_from_daily(daily).collect()}
        assert set(rows) == {1, 2, 3}
        assert all(r.n_days == 6 for r in rows.values())
        assert (rows[1].n_pairs, rows[2].n_pairs, rows[3].n_pairs) == (5, 4, 3)
        assert rows[1].acf == -1.25 / 1.5
        assert rows[2].acf == 1.0 / 1.5
        assert rows[3].acf == -0.75 / 1.5

    def test_gap_days_match_on_calendar_not_rank(self, spark):
        """Observed days {0,1,3}: lag-1 must pair only (0,1) — day 3's
        rank-neighbor 1 is calendar distance 2 and must land in the
        lag-2 bucket instead (the rank-spaced estimator would report 2
        lag-1 pairs)."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            acf_from_daily)
        daily = spark.createDataFrame(
            [("svc", 0, 4), ("svc", 1, 7), ("svc", 3, 5)],
            "service string, x long, y long")
        rows = {r.lag: r.n_pairs for r in acf_from_daily(daily).collect()}
        assert rows == {1: 1, 2: 1, 3: 1}

    def test_constant_series_null_acf(self, spark):
        """A constant series has zero variance: pairs exist but acf is
        NULL (0/0 guarded), never NaN or a division error."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            acf_from_daily)
        daily = spark.createDataFrame(
            [("svc", d, 9) for d in range(5)],
            "service string, x long, y long")
        for r in acf_from_daily(daily).collect():
            assert r.n_pairs > 0 and r.acf is None

    def test_single_day_service_keeps_rows(self, spark):
        """A one-day service still reports one row per lag (n_pairs=0,
        NULL acf) via the service x lags spine left join."""
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            acf_from_daily)
        daily = spark.createDataFrame(
            [("one", 0, 3), ("two", 0, 1), ("two", 1, 2), ("two", 2, 4)],
            "service string, x long, y long")
        out = acf_from_daily(daily).collect()
        one = [r for r in out if r.service == "one"]
        assert len(one) == 3
        assert all(r.n_pairs == 0 and r.acf is None for r in one)


class TestLocalClustering:
    def test_triangle_plus_pendant_hand_values(self, spark):
        """Graph {1-2, 2-3, 1-3, 3-4}: nodes 1/2 close their only wedge
        (cc=1), node 3 closes one of three (cc=1/3 at scale 6), the
        pendant 4 has no wedge (NULL cc)."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            local_clustering)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], "doc_a long, doc_b long")
        rows = {r.doc_id: r for r in local_clustering(pairs).collect()}
        assert {n: r.n_triangles for n, r in rows.items()} == \
            {1: 1, 2: 1, 3: 1, 4: 0}
        assert rows[1].local_cc == 1.0 and rows[2].local_cc == 1.0
        assert rows[3].local_cc == 0.333333
        assert rows[4].local_cc is None

    def test_corner_attribution_sums_to_three_per_triangle(self, spark):
        """Every triangle contributes exactly 3 corner credits:
        Σ n_triangles over nodes == 3 · the global census count, on a
        graph with hubs, cliques, and isolated edges mixed."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            local_clustering, triangle_stats)
        edges = ([(0, i) for i in range(1, 7)]          # star hub
                 + [(10, 11), (10, 12), (11, 12),       # clique K3
                    (10, 13), (11, 13), (12, 13)]       # ... grown to K4
                 + [(20, 21)])                          # isolated edge
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        per_node = local_clustering(pairs).collect()
        [census] = triangle_stats(pairs).collect()
        assert sum(r.n_triangles for r in per_node) == 3 * census.n_triangles
        assert census.n_triangles == 4  # K4 has 4 triangles, star has 0
        k4 = {r.doc_id: r.local_cc for r in per_node
              if r.doc_id in (10, 11, 12, 13)}
        assert set(k4.values()) == {1.0}
        hub = next(r for r in per_node if r.doc_id == 0)
        assert hub.local_cc == 0.0


class TestDiagMahalanobisOutliers:
    def test_planted_outlier_is_flagged_and_argmaxed(self, spark):
        """20 tight vectors around the origin plus one planted far
        point: the far point must be the label's argmax AND the only
        score above the cut; a constant dimension (sigma=0) contributes
        0 instead of dividing by zero."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            diag_mahalanobis_outliers)
        rows = []
        for i in range(20):
            # dim0 alternates +-1 (sd=1), dim1 is CONSTANT (sd=0),
            # dim2 alternates +-2
            rows.append((i, 0, [1.0 if i % 2 else -1.0, 5.0,
                                2.0 if i % 2 else -2.0]))
        rows.append((99, 0, [50.0, 5.0, 0.0]))
        vecs = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>")
        [r] = diag_mahalanobis_outliers(vecs, score_threshold=10.0).collect()
        assert r.n_vecs == 21
        assert r.top_vec_id == 99
        assert r.n_outliers == 1
        assert r.top_score > 10.0

    def test_null_label_and_empty_vector_excluded(self, spark):
        """The _cov_cells contract: NULL-label rows and empty vectors
        never reach the statistics on either engine."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            diag_mahalanobis_outliers)
        rows = [(0, 1, [1.0, 2.0]), (1, 1, [3.0, 4.0]),
                (2, None, [9.0, 9.0]), (3, 1, [])]
        vecs = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>")
        [r] = diag_mahalanobis_outliers(vecs, score_threshold=1e9).collect()
        assert r.label == 1 and r.n_vecs == 2 and r.n_outliers == 0


class TestDowAnomalies:
    def test_doubled_monday_flags_only_with_min_obs(self, spark):
        """Three normal Mondays (10 errors) and one doubled Monday (20):
        the doubled one exceeds 1.5x the Monday mean (20 vs 12.5) and
        has 4 observations, so it flags; the normal Mondays (ratio 0.8)
        and a lone Sunday (min-obs guard) do not."""
        from datetime import datetime, timedelta

        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            dow_anomalies)
        t0 = datetime(2024, 1, 1)           # a Monday
        rows = []
        for wk, n in enumerate([10, 10, 10, 20]):
            for i in range(n):
                rows.append((t0 + timedelta(weeks=wk, seconds=i), "svc", 1))
        for i in range(50):                  # one lone Sunday, huge count
            rows.append((t0 + timedelta(days=6, seconds=i), "svc", 1))
        df = spark.createDataFrame(
            rows, "ts timestamp, service string, is_error int")
        out = dow_anomalies(df).collect()
        flagged = [r for r in out if r.is_anomalous]
        assert len(flagged) == 1
        assert flagged[0].y == 20 and flagged[0].dow == 0
        assert flagged[0].dow_days == 4 and flagged[0].dow_mean == 12.5
        assert flagged[0].ratio == 1.6
        sunday = next(r for r in out if r.dow == 6)
        assert not sunday.is_anomalous  # n=1 < min obs, despite ratio 1.0

    def test_exact_boundary_not_flagged(self, spark):
        """The 1.5x cut is a strict integer inequality: a day at exactly
        1.5x its weekday mean must NOT flag (2*y*n == 3*sy)."""
        from datetime import datetime, timedelta

        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            dow_anomalies)
        t0 = datetime(2024, 1, 2)            # a Tuesday
        rows = []
        # Tuesdays with 6, 6, 6, 12: mean = 7.5, 12/7.5 = 1.6 -> flags;
        # change last to 9: mean 6.75, 9/6.75 = 4/3 -> no flag;
        # exact boundary: counts 5, 5, 5, 9 -> mean 6, 9/6 = 1.5 exactly
        for wk, n in enumerate([5, 5, 5, 9]):
            for i in range(n):
                rows.append((t0 + timedelta(weeks=wk, seconds=i), "svc", 1))
        df = spark.createDataFrame(
            rows, "ts timestamp, service string, is_error int")
        out = dow_anomalies(df).collect()
        assert all(not r.is_anomalous for r in out)
        assert max(r.ratio for r in out) == 1.5


class TestSequenceMatches:
    def _ev(self, spark, rows):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        data = [(eid, t0 + timedelta(seconds=s), uid, typ)
                for eid, (uid, s, typ) in enumerate(rows)]
        return spark.createDataFrame(
            data, "event_id long, ts timestamp, user_id long,"
                  " event_type string")

    def test_relaxed_contiguity_skips_non_alphabet_types(self, spark):
        """A 'view' between the two errors is OUTSIDE the pattern
        alphabet and must be invisible; a 'purchase' there IS in the
        alphabet and must break the match."""
        from realtime_log_analytics_flink_kafka_spark.operators.sequences import (
            match_sequence)
        pat = ("error", "error", "purchase")
        ok = self._ev(spark, [(1, 0, "error"), (1, 5, "view"),
                              (1, 10, "error"), (1, 20, "purchase")])
        broken = self._ev(spark, [(2, 0, "error"), (2, 5, "purchase"),
                                  (2, 10, "error"), (2, 20, "purchase")])
        got = match_sequence(ok, pattern=pat, window_s=60).collect()
        assert len(got) == 1
        assert (got[0].start_event_id, got[0].end_event_id) == (0, 3)
        assert got[0].duration_us == 20_000_000
        assert match_sequence(broken, pattern=pat,
                              window_s=60).count() == 0

    def test_time_bound_is_exact_microseconds(self, spark):
        """A match whose span exceeds the window by any margin is out;
        one exactly AT the bound is in (<=, microsecond-exact)."""
        from realtime_log_analytics_flink_kafka_spark.operators.sequences import (
            match_sequence)
        pat = ("error", "purchase")
        at = self._ev(spark, [(1, 0, "error"), (1, 60, "purchase")])
        over = self._ev(spark, [(2, 0, "error"), (2, 61, "purchase")])
        assert match_sequence(at, pattern=pat, window_s=60).count() == 1
        assert match_sequence(over, pattern=pat, window_s=60).count() == 0

    def test_repeating_stream_yields_every_occurrence(self, spark):
        """e,e,p,e,e,p per user: two matches, and matches never cross
        users."""
        from realtime_log_analytics_flink_kafka_spark.operators.sequences import (
            match_sequence)
        pat = ("error", "error", "purchase")
        rows = []
        for uid in (1, 2):
            for rep in range(2):
                base = rep * 100
                rows += [(uid, base, "error"), (uid, base + 10, "error"),
                         (uid, base + 20, "purchase")]
        df = self._ev(spark, rows)
        got = match_sequence(df, pattern=pat, window_s=3600).collect()
        assert len(got) == 4
        assert {r.user_id for r in got} == {1, 2}

    def test_short_pattern_rejected(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.sequences import (
            match_sequence)
        df = self._ev(spark, [(1, 0, "error")])
        import pytest as _pytest
        with _pytest.raises(ValueError, match=">= 2 steps"):
            match_sequence(df, pattern=("error",), window_s=60)


class TestKmeansRefine:
    def _blobs(self, spark):
        # two tight blobs around (0,0) and (10,10); ids chosen so the
        # every-3rd seeds are vec 0 (blob A) and vec 3 (blob B)
        rows = [(0, [0.1, 0.0]), (1, [0.0, 0.1]), (2, [-0.1, 0.0]),
                (3, [10.1, 10.0]), (4, [10.0, 10.1]), (5, [9.9, 10.0])]
        return spark.createDataFrame(
            [(i, 0, v) for i, v in rows],
            "vec_id long, label int, embedding array<float>")

    def test_planted_blobs_converge_to_blob_means(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            kmeans_refine)
        out = {r.centroid_id: r for r in
               kmeans_refine(self._blobs(spark), centroid_every=3,
                             iters=2).collect()}
        assert set(out) == {0, 3}
        assert out[0].n_vecs == 3 and out[3].n_vecs == 3
        # after refinement each centroid is its blob's mean; the blob
        # inertia is tiny compared to the blob separation (~200)
        assert out[0].inertia < 0.1 and out[3].inertia < 0.1

    def test_lloyd_never_increases_inertia(self, spark):
        """Total inertia after 2 sweeps <= after 0 sweeps (assignment
        against the raw seeds) — the Lloyd monotonicity invariant."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            kmeans_refine)
        df = self._blobs(spark)
        i0 = sum(r.inertia or 0.0 for r in
                 kmeans_refine(df, centroid_every=3, iters=0).collect())
        i2 = sum(r.inertia or 0.0 for r in
                 kmeans_refine(df, centroid_every=3, iters=2).collect())
        assert i2 <= i0

    def test_empty_cluster_keeps_seed_and_reports_zero(self, spark):
        """A seed that captures no vectors must survive every round
        (coalesce to the previous centroid) and report n_vecs=0 with
        NULL inertia.  Seeds 0 and 2 share EXACT coordinates, so every
        vector ties and the min-centroid-id break sends all of them to
        cluster 0 — cluster 2 is genuinely empty from round one."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            kmeans_refine)
        rows = [(0, [5.0, 5.0]), (1, [4.0, 5.0]),
                (2, [5.0, 5.0]), (3, [6.0, 5.0])]
        df = spark.createDataFrame(
            [(i, 0, v) for i, v in rows],
            "vec_id long, label int, embedding array<float>")
        out = {r.centroid_id: r for r in
               kmeans_refine(df, centroid_every=2, iters=2).collect()}
        assert set(out) == {0, 2}
        assert out[0].n_vecs == 4
        assert out[2].n_vecs == 0 and out[2].inertia is None


class TestAdjustedRandIndex:
    def _cl(self, spark, assign):
        return spark.createDataFrame(
            list(assign.items()), "doc_id long, cluster_id long")

    def test_identical_clusterings_score_one(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            adjusted_rand_index)
        a = self._cl(spark, {1: 1, 2: 1, 3: 3, 4: 3, 5: 5})
        [r] = adjusted_rand_index(a, a).collect()
        assert r.n_docs == 5 and r.ari == 1.0

    def test_textbook_contingency_value(self, spark):
        """sklearn's doc example: labels [0,0,1,1] vs [0,0,1,2] has
        ARI = 0.5714285714... — exact sufficient statistics sij=1,
        sa=2, sb=1, n=4."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            adjusted_rand_index)
        a = self._cl(spark, {0: 10, 1: 10, 2: 20, 3: 20})
        b = self._cl(spark, {0: 7, 1: 7, 2: 8, 3: 9})
        [r] = adjusted_rand_index(a, b).collect()
        assert (r.sij, r.sa, r.sb, r.n_docs) == (1, 2, 1, 4)
        exp = 2.0 * 1.0 / 6.0
        assert r.ari == (1.0 - exp) / ((2.0 + 1.0) / 2.0 - exp)

    def test_union_universe_singleton_fill(self, spark):
        """A doc clustered by only one side joins the universe as the
        other side's singleton: agreement drops below 1 even though the
        shared docs agree perfectly."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            adjusted_rand_index)
        a = self._cl(spark, {1: 1, 2: 1, 3: 3, 4: 3})
        b = self._cl(spark, {1: 1, 2: 1, 3: 3, 4: 3, 9: 3})  # 9 joins 3's
        [r] = adjusted_rand_index(a, b).collect()
        assert r.n_docs == 5
        assert r.ari < 1.0

    def test_degenerate_all_singletons_is_one(self, spark):
        """den = 0 (both sides all-singletons) must report ARI = 1, not
        NaN or a division error."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            adjusted_rand_index)
        a = self._cl(spark, {1: 1, 2: 2, 3: 3})
        b = self._cl(spark, {1: 9, 2: 8, 3: 7})
        [r] = adjusted_rand_index(a, b).collect()
        assert r.ari == 1.0 and r.sij == 0
