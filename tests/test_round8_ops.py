"""Round-8 operators: k-core decomposition, TextRank keywords, and the
two TPC-H shapes (share-of-global filter, per-period argmax)."""

from __future__ import annotations

import pyspark.sql.functions as F

from realtime_log_analytics_flink_kafka_spark.operators import dedup, text
from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


class TestKcoreMembership:
    def _run(self, spark, edges):
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        return {r.doc_id: r for r in dedup.kcore_membership(df).collect()}

    def test_triangle_with_tail(self, spark):
        """Triangle 0-1-2 plus tail 2-3-4: the triangle is the 2-core,
        the tail peels (3's degree drops to 1 once 4 goes, then 3
        goes); nothing reaches a 3-core."""
        rows = self._run(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
        assert {d for d, r in rows.items() if r.in_2core} == {0, 1, 2}
        assert not any(r.in_3core for r in rows.values())
        assert all(r.core2_settled and r.core3_settled
                   for r in rows.values())

    def test_k4_is_3core(self, spark):
        """K4: every node has degree 3 — the whole clique is the
        3-core (and the 2-core)."""
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        rows = self._run(spark, k4)
        assert all(r.in_2core and r.in_3core for r in rows.values())
        assert all(r.deg == 3 for r in rows.values())

    def test_long_chain_needs_rounds(self, spark):
        """A 5-edge path peels one endpoint pair per round — after the
        4 default rounds the interior may not be fully settled, and
        the per-node settled flags must SAY so rather than silently
        reporting the truncated peel as exact."""
        path = [(i, i + 1) for i in range(9)]  # 10-node path
        df = spark.createDataFrame(path, "doc_a long, doc_b long")
        rows = {r.doc_id: r
                for r in dedup.kcore_membership(df, rounds=3).collect()}
        # true 2-core of a path is empty; 3 rounds leave the middle,
        # and the nodes removed IN round 3 (2 and 7) read unsettled —
        # the convergence witness: any unsettled node means the peel
        # had not reached its fixpoint
        still_in = {d for d, r in rows.items() if r.in_2core}
        unsettled = {d for d, r in rows.items() if not r.core2_settled}
        assert still_in == {3, 4, 5, 6} and unsettled == {2, 7}
        # enough rounds settles and empties it
        rows2 = {r.doc_id: r
                 for r in dedup.kcore_membership(df, rounds=6).collect()}
        assert not any(r.in_2core for r in rows2.values())
        assert all(r.core2_settled for r in rows2.values())


class TestTextrankKeywords:
    def test_hub_term_ranks_first(self, spark):
        """A term adjacent to many distinct central terms outranks a
        merely frequent term that repeats against one partner."""
        docs = spark.createDataFrame(
            [(1, "hub alpha hub beta hub gamma hub delta"),
             (2, "alpha beta gamma delta hub"),
             (3, "loner loner loner loner loner twin")],
            "doc_id long, text string")
        rows = text.textrank_keywords(docs, topn=10).collect()
        assert rows[0].term == "hub"
        scores = {r.term: r.score for r in rows}
        # every score carries the 0.15 teleport floor
        assert all(s > 0.15 for s in scores.values())
        # 'loner' self-loops are dropped: its only graph edge is to
        # 'twin', so its weighted degree is small
        wdeg = {r.term: r.wdeg for r in rows}
        assert wdeg["loner"] == 1

    def test_topn_cut_is_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i} w{(i + 1) % 7} w{(i + 2) % 7}") for i in range(7)],
            "doc_id long, text string")
        a = [r.term for r in text.textrank_keywords(docs, topn=5).collect()]
        b = [r.term for r in text.textrank_keywords(docs, topn=5).collect()]
        assert a == b and len(a) == 5


class TestRelationalShapes:
    def test_supplier_share_invariants(self, spark):
        rows = QUERIES["supplier_revenue_share"].fn(spark, SF_SMOKE).collect()
        assert rows, "1.05x-average cut empty on the smoke fixture"
        n_supp_with_rev = (
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .select("l_suppkey").distinct().count())
        for r in rows:
            assert r.share > 1.05 / n_supp_with_rev
        assert sum(r.share for r in rows) <= 1.0

    def test_quarter_top_supplier_is_argmax(self, spark):
        df = QUERIES["quarter_top_supplier"].fn(spark, SF_SMOKE)
        got = [(r.yq, r.s_suppkey, round(r.revenue, 6))
               for r in df.collect()]
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        rev = (li.groupBy(
            (F.year("l_shipdate") * 10 + F.quarter("l_shipdate"))
            .cast("int").alias("yq"), "l_suppkey")
            .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .cast("decimal(20,6)")).alias("rv")))
        want = []
        by_q: dict[int, list] = {}
        for r in rev.collect():
            by_q.setdefault(r.yq, []).append(r)
        for yq, rs in by_q.items():
            mx = max(r.rv for r in rs)
            want += [(yq, r.l_suppkey, round(float(r.rv), 6))
                     for r in rs if r.rv == mx]
        assert sorted(got) == sorted(want)
        # every quarter present exactly once unless tied
        assert {q for q, _, _ in got} == set(by_q)


class TestLabelTopEigen:
    def test_planted_rank1_is_exact(self, spark):
        """A cloud dominated by one direction: the 10-step Rayleigh
        estimate must recover the top eigenvalue essentially exactly
        (geometric convergence in the large spectral gap)."""
        import numpy as np
        rng = np.random.RandomState(7)
        d, n = 16, 200
        u = np.zeros(d); u[3] = 1.0
        x = (rng.randn(n, 1) * 5.0) @ u[None, :] + 0.01 * rng.randn(n, d)
        df = spark.createDataFrame(
            [(i, [float(v) for v in x[i]], 0) for i in range(n)],
            "vec_id long, embedding array<float>, label int")
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            label_top_eigen)
        [r] = label_top_eigen(df).collect()
        xf = np.stack([np.array(row, dtype=np.float32).astype(np.float64)
                       for row in x])
        ev = np.linalg.eigvalsh(np.cov(xf.T, bias=True))
        assert abs(r.top_eig_est - ev[-1]) / ev[-1] < 1e-6
        assert r.top_share_est > 0.99

    def test_rayleigh_is_lower_bound_and_close(self, spark):
        """On the near-isotropic fixture (the hardest convergence case)
        the estimate is a certified lower bound on the eigh value and
        still within ~5% at the default 10 steps."""
        import numpy as np
        vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            label_top_eigen)
        est = {r.label: r.top_eig_est for r in label_top_eigen(vecs).collect()}
        pdf = vecs.toPandas()
        for lab in list(est)[:3]:
            x = np.stack(pdf[pdf.label == lab].embedding.to_numpy()) \
                .astype(np.float64)
            ev = np.linalg.eigvalsh(np.cov(x.T, bias=True))
            assert est[lab] <= ev[-1] * (1 + 1e-9)
            assert est[lab] >= ev[-1] * 0.90

    def test_zero_variance_label_is_null(self, spark):
        df = spark.createDataFrame(
            [(i, [1.0] * 8, 0) for i in range(5)],
            "vec_id long, embedding array<float>, label int")
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            label_top_eigen)
        [r] = label_top_eigen(df).collect()
        assert r.top_eig_est is None and r.top_share_est is None


class TestRobustTrend:
    def test_outlier_resistance_vs_ols(self, spark):
        """One 100x incident day: OLS slope blows up, Theil-Sen stays
        on the underlying flat trend and MK S stays near zero."""
        from datetime import datetime, timedelta
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            error_trend_slope, robust_trend)
        t0 = datetime(2024, 1, 1)
        rows = []
        counts = [10, 10, 10, 10, 10, 10, 10, 1000, 10]
        for d, n in enumerate(counts):
            for i in range(n):
                rows.append((t0 + timedelta(days=d, seconds=i), "svc", 1))
        df = spark.createDataFrame(rows, "ts timestamp, service string, is_error int")
        [rt] = robust_trend(df).collect()
        [ols] = error_trend_slope(df).collect()
        assert rt.theil_sen_slope == 0.0
        assert abs(rt.mk_s) <= 8        # near-zero order statistic
        assert abs(ols.slope_per_day) > 1.0  # OLS dragged by the spike
        assert rt.n_days == 9 and rt.n_pairs == 36

    def test_single_day_service_keeps_row(self, spark):
        from datetime import datetime
        from realtime_log_analytics_flink_kafka_spark.operators.detect import (
            robust_trend)
        df = spark.createDataFrame(
            [(datetime(2024, 1, 1), "only", 1)],
            "ts timestamp, service string, is_error int")
        [r] = robust_trend(df).collect()
        assert (r.n_days, r.n_pairs, r.mk_s, r.theil_sen_slope) \
            == (1, 0, 0, None)
