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
