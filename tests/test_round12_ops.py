"""Round-12 additions: cross-modality stub-hash separation (VERDICT r11
next-round #5) and the audio leg of the agreement matrix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators import multimodal
from tests.conftest import SF_SMOKE


class TestCrossModalityHashSeparation:
    def test_stub_hashes_never_collide_within_banding_radius(self, spark):
        """The incremental report drops `fmt` after the join, so a WAV
        and a BMP that hashed within the banding radius would be
        indistinguishable in the report.  This pins the invariant that
        makes that acceptable (VERDICT r11 #5): over the ENTIRE fixture
        corpus, the image (bigram-histogram) and audio (trigram-
        histogram) stub hashes of the SAME payload never land within
        hamming <= DHASH_MAX_HAMMING of each other — distinct n-gram
        order makes the two fingerprint families disjoint in practice,
        so cross-modality rows cannot silently merge."""
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        media = multimodal.as_media(docs)
        img = multimodal.image_dhash(media).filter(
            F.col("dhash").isNotNull()).select("doc_id", "dhash")
        aud = multimodal.audio_ehash(media).filter(
            F.col("ehash").isNotNull()).select("doc_id", "ehash")
        j = img.join(aud, "doc_id")
        assert j.count() > 0  # both modalities hash the fixture docs
        min_ham = j.select(
            F.min(F.bit_count(F.expr("dhash ^ ehash"))).alias("m")
        ).collect()[0].m
        assert min_ham > multimodal.DHASH_MAX_HAMMING, min_ham


class TestSourceLangMI:
    def test_dependent_vs_independent(self, spark):
        """A source-determined language split yields MI = ln 2 and
        NMI = 1; a perfectly proportional table yields MI = 0 — the
        planted pair proving the statistic actually moves (parity alone
        can't: both engines would agree on a vacuous constant too)."""
        import math
        import os
        import tempfile
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_source_lang_mi)

        def run(assign):
            docs = spark.createDataFrame(
                [(i, "t", lang, src, 1) for i, (src, lang) in
                 enumerate(assign)],
                "doc_id long, text string, lang string, source string,"
                " n_chars long")
            d = tempfile.mkdtemp()
            docs.write.mode("overwrite").parquet(
                os.path.join(d, "documents.parquet"))
            [r] = q_source_lang_mi(spark, d).collect()
            return r

        dep = run([("sA", "en")] * 10 + [("sB", "de")] * 10)
        assert abs(dep.mi - math.log(2)) < 1e-5
        assert dep.nmi == 1.0
        assert abs(dep.h_source - math.log(2)) < 1e-5
        ind = run([("sA", "en")] * 6 + [("sA", "de")] * 2
                  + [("sB", "en")] * 3 + [("sB", "de")] * 1)
        assert ind.mi == 0.0 and ind.nmi == 0.0

    def test_constant_attribute_null_nmi(self, spark):
        """One language everywhere: H_lang = 0, nothing to explain —
        nmi must be NULL, not a 0/0 artifact."""
        import os
        import tempfile
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_source_lang_mi)
        docs = spark.createDataFrame(
            [(i, "t", "en", f"s{i % 3}", 1) for i in range(12)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long")
        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        [r] = q_source_lang_mi(spark, d).collect()
        assert r.h_lang == 0.0 and r.mi == 0.0 and r.nmi is None


class TestConversionSurvival:
    def test_planted_censoring_textbook_km(self, spark):
        """Hand-checkable KM: 5 clickers on one service — conversions
        at 10/30/50 min, one user censored at the window end, one whose
        only purchase PREDATES their first click (must count as
        censored, not converted).  S steps 0.8 → 0.6 → 0.4, so the
        median is the 0.5-crossing at 50 min and the plateau is 0.4 —
        a naive conversion rate (3/5) treats the censored pair as
        failures and cannot produce that curve, which is the
        distinction this query exists for."""
        import datetime as dt
        import os
        import tempfile
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_conversion_survival)

        t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

        def ts(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        rows = [
            (1, ts(0), 0, "click", 1.0, "{}"),
            (2, ts(10), 0, "purchase", 1.0, "{}"),
            (3, ts(0), 4, "click", 1.0, "{}"),
            (4, ts(30), 4, "purchase", 1.0, "{}"),
            (5, ts(0), 8, "click", 1.0, "{}"),          # never converts
            (6, ts(0), 12, "click", 1.0, "{}"),
            (7, ts(50), 12, "purchase", 1.0, "{}"),
            # a purchase BEFORE the user's first click must not count
            (8, ts(5), 16, "purchase", 1.0, "{}"),
            (9, ts(20), 16, "click", 1.0, "{}"),
            # window-end marker fixing the censor horizon at 100 min
            (10, ts(100), 1, "view", 1.0, "{}"),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")
        d = tempfile.mkdtemp()
        ev.write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet"))
        out = {r.service: r
               for r in q_conversion_survival(spark, d).collect()}
        r = out["svc-0"]
        assert r.n_users == 5 and r.n_converted == 3 and r.n_censored == 2
        # risk set 5: S(10) = 4/5 = 0.8, S(30) = 0.8·(3/4) = 0.6,
        # S(50) = 0.6·(2/3) = 0.4 — first <= 0.5 crossing at 50; the
        # censored exposures (80, 100 min) shrink the risk set but
        # never the survival curve
        assert r.km_median_min == 50
        assert r.s_7d == 0.4 and r.s_end == 0.4
        assert "svc-1" not in out  # a never-clicking service has no cohort


class TestIncrementalSelfMatchGuard:
    def test_overlapping_inputs_never_self_match(self, spark):
        """ADVICE r11 #1: _fingerprint_incremental carries an explicit
        x.doc_id != y.doc_id join term, so feeding the SAME relation as
        both new and index must report only true cross-doc matches —
        never a doc matching itself at hamming 0."""
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta " * 5),
             (2, "alpha beta gamma delta epsilon zeta " * 5),
             (3, "utterly different words entirely here now " * 5)],
            "doc_id long, text string")
        media = multimodal.as_media(docs)
        rep = {r.doc_id: r
               for r in multimodal.dhash_incremental(media, media).collect()}
        assert set(rep) == {1, 2}  # the clone pair, both directions
        assert rep[1].matched_index_doc == 2
        assert rep[2].matched_index_doc == 1
        assert 3 not in rep  # no self-match inflation anywhere


class TestConversionLogrank:
    @staticmethod
    def _events(spark, rows):
        import datetime as dt
        import os
        import tempfile
        t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
        data = [(i + 1, t0 + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
                for i, (uid, m, et) in enumerate(rows)]
        ev = spark.createDataFrame(
            data, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")
        d = tempfile.mkdtemp()
        ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        return d

    def test_textbook_two_service_split(self, spark):
        """Hand-computed Mantel-Cox: svc-0's 3 users all convert at
        minute 10, svc-1's 3 at minute 20.  Pooled event times for
        svc-0 one-vs-rest: t=10 (n=6, n_0=3, d=3 -> E += 1.5,
        V += 81/180 = 0.45), t=20 (svc-0 exhausted, n_0=0 -> E += 0,
        V += 0).  O_0 = 3, E_0 = 1.5 -> chi2 = 2.25/0.45 = 5.0 >
        3.8415: the fast service genuinely diverges.  Symmetrically
        svc-1 (the slow side of the same 2x2 at every t): E_1 = 1.5 +
        3·3/3 = 4.5, same V, same chi2 = (3-4.5)²/0.45 = 5.0."""
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_conversion_logrank)
        rows = []
        for uid in (0, 4, 8):                     # svc-0: convert at 10
            rows += [(uid, 0, "click"), (uid, 10, "purchase")]
        for uid in (1, 5, 9):                     # svc-1: convert at 20
            rows += [(uid, 0, "click"), (uid, 20, "purchase")]
        d = self._events(spark, rows)
        out = {r.service: r for r in q_conversion_logrank(spark, d).collect()}
        for svc, exp in (("svc-0", 1.5), ("svc-1", 4.5)):
            r = out[svc]
            assert r.n_cohort == 3 and r.n_converted == 3
            assert r.expected_conv == exp
            assert r.logrank_chi2 == 5.0
            assert r.diverges is True

    def test_identical_curves_do_not_diverge(self, spark):
        """Both services convert one user each at 10/20/30: identical
        curves, O = E exactly at every event time (d·n_g/n = d/2 with
        the groups always symmetric), chi2 = 0, no flag.  The schedule
        is STAGGERED so intermediate event times keep n > d and V > 0
        (everyone converting at one shared minute would make every
        (n−d) factor zero and V degenerate-NULL)."""
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_conversion_logrank)
        rows = []
        for uid0, uid1, t in ((0, 1, 10), (4, 5, 20), (8, 9, 30)):
            rows += [(uid0, 0, "click"), (uid0, t, "purchase"),
                     (uid1, 0, "click"), (uid1, t, "purchase")]
        d = self._events(spark, rows)
        out = {r.service: r for r in q_conversion_logrank(spark, d).collect()}
        for svc in ("svc-0", "svc-1"):
            assert out[svc].logrank_chi2 == 0.0
            assert out[svc].diverges is False

    def test_all_censored_degenerate_is_null(self, spark):
        """No conversions anywhere: no event times, V = 0 — chi2 and
        the flag must be NULL, never a division error or a false
        positive; cohort counts still report."""
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_conversion_logrank)
        rows = [(0, 0, "click"), (1, 0, "click"), (4, 5, "click"),
                (0, 60, "view")]  # view fixes the censor horizon
        d = self._events(spark, rows)
        out = {r.service: r for r in q_conversion_logrank(spark, d).collect()}
        assert out["svc-0"].n_cohort == 2 and out["svc-0"].n_converted == 0
        assert out["svc-0"].logrank_chi2 is None
        assert out["svc-0"].diverges is None

    def test_censoring_shrinks_risk_not_events(self, spark):
        """A user censored before a later event time must leave that
        time's at-risk denominator (KM/logrank's whole point).  svc-0:
        users 0/4 click at 0 and convert at 10; user 8 clicks at 10
        and never purchases, so its censor duration is tmax−10 =
        40−10 = 30 — BEFORE svc-1's conversions (users 1/5, click 0,
        purchase 40, duration 40).  One-vs-rest svc-1: t=10 (n=5,
        n_1=2, d=2 -> E += 0.8, V += 2·2·3·3/(25·4) = 0.36); t=40
        (user 8 already censored out, n=2=n_1, d=2 -> E += 2, V += 0).
        O_1=2, E_1=2.8, chi2 = 0.64/0.36 = 1.7778, no flag — without
        the censor the t=40 pool would be 3 and E_1 only 2.1333."""
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_conversion_logrank)
        rows = [(0, 0, "click"), (0, 10, "purchase"),
                (4, 0, "click"), (4, 10, "purchase"),
                (8, 10, "click"),           # censored at dur 40-10=30
                (1, 0, "click"), (1, 40, "purchase"),
                (5, 0, "click"), (5, 40, "purchase")]
        d = self._events(spark, rows)
        out = {r.service: r for r in q_conversion_logrank(spark, d).collect()}
        r = out["svc-1"]
        assert r.n_cohort == 2 and r.n_converted == 2
        assert r.expected_conv == 2.8
        assert r.logrank_chi2 == 1.7778
        assert r.diverges is False


class TestSpearmanSignalCorrelations:
    def test_matches_independent_midrank_pearson(self, spark):
        """Recompute every per-source rho in pure Python — midranks via
        sorted scan, Pearson on ranks via float sums — from the SAME
        (x, y, z) signal projection the query uses, and require
        agreement to 1e-9.  This independently exercises the entire
        rank/moment path (marginal cumulative windows, the doubled-
        midrank integerization, the decimal moment algebra) against a
        formulation that shares none of it."""
        from realtime_log_analytics_flink_kafka_spark.operators import text
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            _docs, q_spearman_signal_correlations)

        docs = _docs(spark, SF_SMOKE)
        ent = text.token_entropy(docs)
        e = text.quality_exprs()
        q = docs.select("doc_id", "source",
                        e["quality_score_e4"].alias("q_e4"))
        j = (ent.join(q, "doc_id")
             .filter(F.col("q_e4").isNotNull())
             .select("source", F.col("q_e4").alias("x"),
                     F.floor(F.col("entropy") * F.lit(1000.0)
                             + F.lit(0.5)).cast("long").alias("y"),
                     F.col("n_tokens").alias("z")))
        rows = j.collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append((r.x, r.y, r.z))

        def midranks(vals):
            order = sorted(range(len(vals)), key=lambda i: vals[i])
            ranks = [0.0] * len(vals)
            i = 0
            while i < len(order):
                k = i
                while (k < len(order)
                       and vals[order[k]] == vals[order[i]]):
                    k += 1
                mr = (i + 1 + k) / 2.0
                for t in range(i, k):
                    ranks[order[t]] = mr
                i = k
            return ranks

        def pearson(a, b):
            n = len(a)
            sa, sb = sum(a), sum(b)
            num = n * sum(x * y for x, y in zip(a, b)) - sa * sb
            da = n * sum(x * x for x in a) - sa * sa
            db = n * sum(y * y for y in b) - sb * sb
            if da <= 0 or db <= 0:
                return None
            return num / (da * db) ** 0.5

        out = {r.source: r for r in
               q_spearman_signal_correlations(spark, SF_SMOKE).collect()}
        assert set(out) == set(by_src)
        checked = 0
        for src, triples in by_src.items():
            xs, ys, zs = (midranks([t[i] for t in triples])
                          for i in range(3))
            exp = {"rho_quality_entropy": pearson(xs, ys),
                   "rho_quality_length": pearson(xs, zs),
                   "rho_entropy_length": pearson(ys, zs)}
            r = out[src]
            assert r.n_docs == len(triples)
            for k, v in exp.items():
                got = getattr(r, k)
                if v is None:
                    assert got is None, (src, k, got)
                else:
                    assert abs(got - v) < 1e-9, (src, k, got, v)
                    checked += 1
        assert checked >= 9  # several sources, all three pairs live

    def test_constant_signal_is_null_not_nan(self, spark):
        """A source whose quality signal has zero rank variance must
        report NULL for its quality correlations (the den>0 guard),
        never NaN — and the surviving pair still reports."""
        import os
        import tempfile
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_spearman_signal_correlations)
        # identical text -> identical quality/entropy; n_tokens also
        # identical, so EVERY signal is constant and all three are NULL
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta", "en", "sA", 23)
             for i in range(6)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long")
        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet"))
        [r] = q_spearman_signal_correlations(spark, d).collect()
        assert r.n_docs == 6
        assert r.rho_quality_entropy is None
        assert r.rho_quality_length is None
        assert r.rho_entropy_length is None
