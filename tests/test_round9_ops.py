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
