"""Round-11 operator tests: audio energy-gradient near-dup fingerprints,
the incremental image-dedup twin, the shared Hamming-banding helper's
guard, and the k=1 silhouette degenerate-input pin (ADVICE r10).
"""

import numpy as np
import pytest

from realtime_log_analytics_flink_kafka_spark.operators import multimodal
from realtime_log_analytics_flink_kafka_spark.operators.multimodal import (
    DHASH_BANDS, DHASH_MAX_HAMMING, audio_ehash, audio_near_dups,
    dhash_incremental, synth_bmp, synth_wav, wav_energy_hash_py)


def _wave(seed: int, n: int = 640, amp: int = 9000) -> list[int]:
    """Deterministic recording whose STRUCTURE (pitch + loudness
    envelope) depends on the seed — the energy hash tracks the frame
    energy profile, so same-structure/different-noise waves are
    correctly NEAR (that's the perceptual contract); different seeds
    must differ in envelope to be far."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    period = 18 + 11 * seed
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * t / (97.0 + 31 * seed)))
    base = amp * env * np.sin(2 * np.pi * t / period)
    noise = rng.integers(-amp // 8, amp // 8, n)
    return (base + noise).astype(np.int64).clip(-32768, 32767).tolist()


class TestWavEnergyHash:
    def test_gain_invariant(self):
        """Uniform gain scaling multiplies every frame energy by the
        same factor, so every adjacent-bucket rank comparison — hence
        every hash bit — is preserved: hamming 0."""
        s = _wave(1)
        a = wav_energy_hash_py(synth_wav(s))
        b = wav_energy_hash_py(synth_wav([v // 2 for v in s]))
        assert a is not None
        assert bin(a ^ b).count("1") <= 2  # // rounding can flip a tie

    def test_different_recordings_far(self):
        a = wav_energy_hash_py(synth_wav(_wave(1)))
        b = wav_energy_hash_py(synth_wav(_wave(2)))
        assert bin(a ^ b).count("1") > DHASH_MAX_HAMMING

    def test_short_payload_still_hashes(self):
        """Fewer frames than buckets: the bucket->frame mapping repeats
        frames, any n >= 1 sample works."""
        assert wav_energy_hash_py(synth_wav([100, -200, 300])) is not None

    def test_non_wav_is_none(self):
        assert wav_energy_hash_py(b"not audio") is None
        assert wav_energy_hash_py(synth_bmp(4, 4, (1, 2, 3))) is None

    def test_int64_range(self):
        h = wav_energy_hash_py(synth_wav(_wave(3)))
        assert -(1 << 63) <= h < (1 << 63)


class TestAudioNearDupsReal:
    def test_real_path_pairs_scaled_copy(self, spark):
        """decode_stub=False end-to-end: a half-gain re-encode of the
        same recording pairs with the original; an unrelated recording
        pairs with neither."""
        s = _wave(7)
        rows = [(1, "wav", bytearray(synth_wav(s))),
                (2, "wav", bytearray(synth_wav([v // 2 for v in s]))),
                (3, "wav", bytearray(synth_wav(_wave(8)))),
                (4, "txt", bytearray(b"not audio at all"))]
        media = spark.createDataFrame(
            rows, "doc_id long, fmt string, payload binary")
        got = {(r.doc_a, r.doc_b): r.hamming
               for r in audio_near_dups(media, decode_stub=False).collect()}
        assert (1, 2) in got and got[(1, 2)] <= DHASH_MAX_HAMMING
        assert all({a, b} == {1, 2} for a, b in got)

    def test_real_path_hash_matches_python_twin(self, spark):
        s = _wave(11)
        media = spark.createDataFrame(
            [(1, "wav", bytearray(synth_wav(s)))],
            "doc_id long, fmt string, payload binary")
        [row] = audio_ehash(media, decode_stub=False).collect()
        assert row.ehash == wav_energy_hash_py(synth_wav(s))

    def test_banded_bound_guard(self, spark):
        with pytest.raises(ValueError, match="pigeonhole"):
            audio_near_dups(None, max_hamming=DHASH_BANDS)
        with pytest.raises(ValueError, match="pigeonhole"):
            dhash_incremental(None, None, max_hamming=-1)


class TestDhashIncremental:
    def test_new_vs_index_report(self, spark):
        """Stub path: a new doc whose text token-edits an index doc is
        flagged (bigram-histogram hamming small); an unrelated new doc
        is absent; INDEX-internal dups never pair with each other."""
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep green forest tonight") * 3
        near = base.replace("lazy", "sleepy", 1)
        other = ("completely different content about spark shuffles "
                 "and parquet footers with no overlap whatsoever") * 3
        docs = spark.createDataFrame(
            [(10, base), (20, base + " extra"), (11, near), (13, other)],
            "doc_id long, text string")
        media = multimodal.as_media(docs)
        new = media.filter("doc_id % 2 = 1")
        idx = media.filter("doc_id % 2 = 0")
        got = {r.doc_id: r for r in dhash_incremental(idx, new).collect()}
        assert 11 in got and 13 not in got
        assert got[11].matched_index_doc == 10
        assert got[11].n_matches == 2  # both index copies
        assert got[11].best_hamming <= DHASH_MAX_HAMMING

    def test_audio_twin_real_path(self, spark):
        """ehash_incremental (the audio modality of the shared
        _fingerprint_incremental body) on real WAV payloads: a re-gained
        copy of an indexed recording is flagged; a new recording with a
        different envelope is not."""
        from realtime_log_analytics_flink_kafka_spark.operators.multimodal import (
            ehash_incremental)
        s = _wave(4)
        idx = spark.createDataFrame(
            [(100, "wav", bytearray(synth_wav(s)))],
            "doc_id long, fmt string, payload binary")
        new = spark.createDataFrame(
            [(1, "wav", bytearray(synth_wav([v // 2 for v in s]))),
             (2, "wav", bytearray(synth_wav(_wave(5))))],
            "doc_id long, fmt string, payload binary")
        got = {r.doc_id: r
               for r in ehash_incremental(idx, new,
                                          decode_stub=False).collect()}
        assert 1 in got and 2 not in got
        assert got[1].matched_index_doc == 100

    def test_pair_counted_once_across_bands(self, spark):
        """Identical fingerprints collide in ALL 4 bands; the DISTINCT
        must collapse them to n_matches = 1."""
        txt = "alpha beta gamma delta epsilon zeta eta theta " * 4
        docs = spark.createDataFrame(
            [(1, txt), (2, txt)], "doc_id long, text string")
        media = multimodal.as_media(docs)
        [row] = dhash_incremental(media.filter("doc_id = 1"),
                                  media.filter("doc_id = 2")).collect()
        assert row.n_matches == 1 and row.best_hamming == 0


class TestAudioBandingRecall:
    def test_pigeonhole_recall_guarantee_shared_geometry(self):
        """audio_near_dups bands through the SAME _band_fingerprints /
        4 x 16 geometry the image proof (test_round10_ops) covers; this
        re-proves the property against AHASH constants so a future
        audio-specific geometry change re-triggers the proof burden."""
        from hypothesis import given, strategies as st
        from realtime_log_analytics_flink_kafka_spark.operators.multimodal import (
            DHASH_BAND_BITS)

        mask = (1 << DHASH_BAND_BITS) - 1

        @given(st.integers(0, (1 << 64) - 1),
               st.sets(st.integers(0, 63), max_size=DHASH_MAX_HAMMING))
        def check(a, flipped):
            b = a
            for bit in flipped:
                b ^= 1 << bit
            assert any(((a >> (DHASH_BAND_BITS * i)) & mask)
                       == ((b >> (DHASH_BAND_BITS * i)) & mask)
                       for i in range(DHASH_BANDS))

        check()

    def test_stub_trigram_differs_from_bigram_stub(self, spark):
        """The audio stub must be a DIFFERENT fingerprint from the image
        stub for the same payload (distinct n-gram order), or the two
        'modalities' would trivially agree on every near-dup verdict."""
        docs = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine ten " * 3)],
            "doc_id long, text string")
        media = multimodal.as_media(docs)
        [img] = multimodal.image_dhash(media).collect()
        [aud] = audio_ehash(media).collect()
        assert img.dhash != aud.ehash


class TestWavEnergyHashRobustness:
    def test_arbitrary_bytes_never_raise(self):
        """The real-path hash runs inside mapInPandas: ANY payload —
        junk, truncated RIFF, hostile chunk sizes — must yield None or
        an int64, never an exception (one bad blob would kill the whole
        Arrow batch's task)."""
        from hypothesis import given, strategies as st

        @given(st.binary(max_size=300))
        def check(buf):
            h = wav_energy_hash_py(buf)
            assert h is None or -(1 << 63) <= h < (1 << 63)

        check()

    def test_truncations_of_valid_wav_never_raise(self):
        buf = synth_wav(_wave(1))
        for cut in range(0, len(buf), 7):
            h = wav_energy_hash_py(buf[:cut])
            assert h is None or isinstance(h, int)


class TestPairSetAgreement:
    def test_counts_and_ratios(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            pair_set_agreement)
        a = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long")
        b = spark.createDataFrame(
            [(1, 2), (5, 6), (7, 8), (9, 10)], "doc_a long, doc_b long")
        [r] = pair_set_agreement(a, b).collect()
        assert (r.n_a, r.n_b, r.n_both) == (3, 4, 2)
        assert (r.n_a_only, r.n_b_only) == (1, 2)
        assert float(r.pair_jaccard) == 0.4       # 2 / (3+4-2)
        assert float(r.precision_b) == 0.5
        assert float(r.recall_b) == 0.6667

    def test_empty_side_null_ratios(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            pair_set_agreement)
        a = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        b = a.filter("doc_a < 0")
        [r] = pair_set_agreement(a, b).collect()
        assert r.n_b == 0 and r.precision_b is None
        assert float(r.recall_b) == 0.0

    def test_both_empty_zero_counts(self, spark):
        """Zero-row inputs: counts must be 0 (the SQL twin's count(*)),
        not the NULL a bare sum-over-nothing would give."""
        from realtime_log_analytics_flink_kafka_spark.operators.dedup import (
            pair_set_agreement)
        e = spark.createDataFrame([], "doc_a long, doc_b long")
        [r] = pair_set_agreement(e, e).collect()
        assert (r.n_a, r.n_b, r.n_both) == (0, 0, 0)
        assert r.pair_jaccard is None and r.precision_b is None


class TestServiceBurstiness:
    def test_bursty_vs_steady(self, spark):
        """Planted arrivals: svc with all events crammed into 2 of 20
        minutes is overdispersed (Fano > 1); a 1-event-per-minute svc
        has zero variance (Fano = 0).  Uses the production query via a
        fixture events table."""
        import os
        import tempfile
        from datetime import datetime, timezone
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_service_burstiness)
        rows = []
        eid = 0
        base = datetime(2024, 1, 1, tzinfo=timezone.utc)

        def ts(minute, sec):
            return base.replace(hour=minute // 60, minute=minute % 60,
                                second=sec)
        # user_id 0 -> svc-0: 10 events in each of minutes 0 and 1,
        # then 18 single-event minutes
        for minute in (0, 1):
            for s in range(10):
                rows.append((eid, ts(minute, s), 0, "view", 1.0, "{}"))
                eid += 1
        for minute in range(2, 20):
            rows.append((eid, ts(minute, 0), 0, "view", 1.0, "{}")); eid += 1
        # user_id 1 -> svc-1: exactly one event per minute
        for minute in range(20):
            rows.append((eid, ts(minute, 0), 1, "view", 1.0, "{}")); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        got = {r.service: r for r in q_service_burstiness(spark, d).collect()}
        assert got["svc-0"].overdispersed and float(got["svc-0"].fano) > 1
        assert not got["svc-1"].overdispersed
        assert float(got["svc-1"].fano) == 0.0
        assert got["svc-0"].n_minutes == 20 and got["svc-0"].max_minute == 10


class TestLatencyFdrAudit:
    def test_planted_anomalous_day_flagged(self, spark):
        """30 steady days + one 100x-latency day: the spike day's
        Chebyshev p ~ 1/z^2 is tiny, BH at alpha=0.25 with m=31 rejects
        it, and no steady day is flagged."""
        import os
        import tempfile
        from datetime import datetime, timedelta, timezone
        from realtime_log_analytics_flink_kafka_spark.queries.advanced import (
            q_latency_fdr_audit)
        rows, eid = [], 0
        base = datetime(2024, 1, 1, tzinfo=timezone.utc)
        for day in range(31):
            lat = 5000.0 if day == 30 else 50.0
            for i in range(4):
                # day-varying jitter so the steady days' leave-one-out
                # variance is positive (all-identical means hit the
                # var_loo <= 0 degenerate branch instead of BH)
                rows.append((eid, base + timedelta(days=day, minutes=i),
                             0, "view", lat + (day % 3) + (i % 2), "{}"))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        [r] = q_latency_fdr_audit(spark, d).collect()
        assert r.n_days == 31
        assert r.n_flagged == 1
        assert r.top_day == (base + timedelta(days=30)
                             - datetime(1970, 1, 1, tzinfo=timezone.utc)).days
        assert float(r.min_p) < 0.05


class TestSourceLangChisq:
    def test_dependent_vs_independent(self, spark):
        """A perfectly source-determined language split yields chi2 = N
        and V = 1; a perfectly proportional table yields chi2 = 0."""
        import os
        import tempfile
        from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
            q_source_lang_chisq)

        def run(assign):
            docs = spark.createDataFrame(
                [(i, "t", lang, src, 1) for i, (src, lang) in
                 enumerate(assign)],
                "doc_id long, text string, lang string, source string,"
                " n_chars long")
            d = tempfile.mkdtemp()
            docs.write.mode("overwrite").parquet(
                os.path.join(d, "documents.parquet"))
            [r] = q_source_lang_chisq(spark, d).collect()
            return r

        dep = run([("sA", "en")] * 10 + [("sB", "de")] * 10)
        assert float(dep.chi2) == 20.0 and float(dep.cramers_v) == 1.0
        assert dep.dof == 1 and dep.chi2_gt_dof
        ind = run(([("sA", "en")] * 6 + [("sA", "de")] * 2
                   + [("sB", "en")] * 3 + [("sB", "de")] * 1))
        assert float(ind.chi2) == 0.0 and not ind.chi2_gt_dof


class TestSilhouetteDegenerateK1:
    def test_single_label_mean_zero(self, spark):
        """k=1: no 'other' centroid exists, b is NULL — pinned to 0.0 in
        both engines (ADVICE r10), so the scorecard reports 0.0 instead
        of Spark-drops-NULL/DuckDB-keeps-NULL divergence."""
        from realtime_log_analytics_flink_kafka_spark.operators.similarity import (
            kmeans_silhouette)
        vecs = spark.createDataFrame(
            [(1, 0, [1.0, 2.0]), (2, 0, [2.0, 1.0]), (3, 0, [1.5, 1.5])],
            "vec_id long, label int, embedding array<float>")
        [row] = kmeans_silhouette(vecs).collect()
        assert row.n_vecs == 3
        assert float(row.mean_silhouette) == 0.0
        assert row.n_negative == 0
