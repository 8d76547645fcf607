"""Real (non-stub) multimodal decode: synthesized BMP/PPM/WAV payloads
through the mapInPandas path, asserting exact dims and features computed
from known pixel/sample values — plus format sniffing and the NULL /
strict behavior for codec-needing payloads.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators import multimodal
from realtime_log_analytics_flink_kafka_spark.operators.multimodal import (
    synth_bmp as make_bmp, synth_ppm as make_ppm, synth_wav as make_wav)


def _media_df(spark, payloads: list[tuple[int, bytes]]):
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    return df.select(
        "doc_id",
        multimodal.sniff_format(F.col("payload")).alias("fmt"),
        "payload",
        F.octet_length("payload").cast("long").alias("byte_len"),
    )


def test_sniff_format(spark):
    payloads = [
        (0, make_bmp(2, 2, (10, 20, 30))),
        (1, make_ppm(3, 1, 100)),
        (2, make_wav([0, 1000])),
        (3, b"\x89PNG\r\n\x1a\nrest"),
        (4, b"\xff\xd8\xff\xe0JFIF"),
        (5, b"RIFF\x00\x00\x00\x00WEBPVP8 "),
        (6, b"not a known container"),
    ]
    got = {r.doc_id: r.fmt for r in _media_df(spark, payloads).collect()}
    assert got == {0: "bmp", 1: "ppm", 2: "wav", 3: "png", 4: "jpeg",
                   5: "webp", 6: "unknown"}


def test_real_decode_bmp_ppm_wav_exact(spark):
    # bmp 4x3 solid (100, 150, 200): mean = 150/255
    # ppm 5x2 gray 51: mean = 51/255 = 0.2
    # wav 4 samples [0, 16384, -16384, 32767] mono
    wav_samples = [0, 16384, -16384, 32767]
    payloads = [
        (0, make_bmp(4, 3, (100, 150, 200))),
        (1, make_ppm(5, 2, 51)),
        (2, make_wav(wav_samples, channels=2)),
    ]
    out = {r.doc_id: r for r in multimodal.decode_features(
        _media_df(spark, payloads), decode_stub=False).collect()}
    assert (out[0].width, out[0].height) == (4, 3)
    assert out[0].feat_mean == pytest.approx((100 + 150 + 200) / 3 / 255.0)
    assert (out[1].width, out[1].height) == (5, 2)
    assert out[1].feat_mean == pytest.approx(0.2)
    # wav: width = frames (samples / channels), height = channels
    assert (out[2].width, out[2].height) == (2, 2)
    assert out[2].feat_mean == pytest.approx(
        sum(abs(s) for s in wav_samples) / 4 / 32768.0)


def test_real_decode_unknown_nulls_or_raises(spark):
    payloads = [(0, b"\xff\xd8\xffjpeg-needs-codec"),
                (1, make_ppm(2, 2, 10))]
    rows = {r.doc_id: r for r in multimodal.decode_features(
        _media_df(spark, payloads), decode_stub=False).collect()}
    assert rows[0].width is None and rows[0].feat_mean is None
    assert rows[1].width == 2  # decodable neighbor unaffected
    with pytest.raises(Exception, match="codec"):
        multimodal.decode_features(
            _media_df(spark, [(0, b"\xff\xd8\xffx")]),
            decode_stub=False, strict=True).collect()


def test_real_decode_corrupt_payloads_null(spark):
    """Truncated / malformed blobs NULL out instead of aborting the job."""
    payloads = [
        (0, make_bmp(4, 3, (1, 2, 3))[:40]),       # truncated header
        (1, b"BM" + b"\x00" * 60),                  # zero dims
        (2, b"P6\n4 4\n70000\n" + b"\x00" * 48),    # maxval out of range
        (3, make_wav([1, 2, 3])[:20]),              # truncated chunks
        (4, b""),                                   # empty
    ]
    rows = multimodal.decode_features(
        _media_df(spark, payloads), decode_stub=False).collect()
    assert all(r.width is None and r.feat_mean is None for r in rows)


def test_real_resize_uses_header_dims(spark):
    payloads = [
        (0, make_bmp(640, 120, (0, 0, 0))),   # wide: ratio 256/640
        (1, make_ppm(8, 4, 9)),               # small: never upscale
        (2, make_wav([1, 2])),                # not an image -> NULLs
    ]
    out = {r.doc_id: r for r in multimodal.resize_images(
        _media_df(spark, payloads), 256, 256, decode_stub=False).collect()}
    assert (out[0].src_width, out[0].src_height) == (640, 120)
    assert (out[0].out_width, out[0].out_height) == (256, 48)
    assert (out[1].out_width, out[1].out_height) == (8, 4)
    assert out[2].src_width is None and out[2].out_width is None


class TestWavFrames:
    def test_frames_cover_all_samples_with_partial_tail(self):
        from realtime_log_analytics_flink_kafka_spark.operators import multimodal as mm
        buf = mm.synth_wav(list(range(-10, 11)), channels=1)  # 21 samples
        frames = mm.wav_frame_py(buf)
        assert [f[0] for f in frames] == [0, 1, 2]
        assert [f[1] for f in frames] == [8, 8, 5]
        assert sum(f[1] for f in frames) == 21

    def test_energy_and_peak_are_exact_integers(self):
        from realtime_log_analytics_flink_kafka_spark.operators import multimodal as mm
        buf = mm.synth_wav([3, -4], channels=1)
        ((fi, ns, energy, peak),) = mm.wav_frame_py(buf)
        assert (fi, ns, energy, peak) == (0, 2, 25, 4)

    def test_non_wav_blobs_yield_no_frames(self, spark):
        from realtime_log_analytics_flink_kafka_spark.operators import multimodal as mm
        df = spark.createDataFrame(
            [(1, b"not audio"), (2, mm.synth_bmp(2, 2, (1, 2, 3))),
             (3, mm.synth_wav([100, -100], channels=1))],
            "doc_id long, payload binary")
        rows = mm.wav_frame_features(df).collect()
        assert {r["doc_id"] for r in rows} == {3}

    def test_interleaved_stereo_counts_all_channels(self):
        from realtime_log_analytics_flink_kafka_spark.operators import multimodal as mm
        buf = mm.synth_wav([1, 2, 3, 4], channels=2)  # 4 values, 2ch
        frames = mm.wav_frame_py(buf)
        assert len(frames) == 1 and frames[0][1] == 4


class TestImageDhash:
    """Real-path dHash: gradient bits from actual BMP/PPM pixels, and
    the banded near-dup join over them."""

    @staticmethod
    def _gradient_bmp(w, h, shift=0, spot=None):
        """BMP whose gray level rises left->right (columns c*255//w,
        offset by `shift`), optionally with one perturbed pixel."""
        import struct as st
        row_bytes = (w * 3 + 3) & ~3
        rows = []
        for r in range(h):
            row = bytearray()
            for c in range(w):
                g = min(255, (c * 255) // w + shift)
                if spot == (r, c):
                    g = 255 - g
                row += bytes((g, g, g))
            row += b"\x00" * (row_bytes - w * 3)
            rows.append(bytes(row))
        # top-down storage (negative height) keeps rows in visual order
        pixels = b"".join(rows)
        size = 54 + len(pixels)
        return (b"BM" + st.pack("<IHHI", size, 0, 0, 54)
                + st.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0,
                          len(pixels), 2835, 2835, 0, 0) + pixels)

    def test_monotone_gradient_sets_all_bits(self, spark):
        # strictly rising luminance: every adjacent-block comparison is
        # ">", so all 64 bits set -> dhash == -1 (two's complement)
        img = self._gradient_bmp(36, 16)
        out = multimodal.image_dhash(
            _media_df(spark, [(0, img)]), decode_stub=False).collect()
        assert out[0].dhash == -1

    def test_near_dup_images_land_within_hamming(self, spark):
        base = self._gradient_bmp(36, 16)
        brighter = self._gradient_bmp(36, 16, shift=3)   # tiny global shift
        spotted = self._gradient_bmp(36, 16, spot=(7, 0))  # one pixel flipped
        flat = multimodal.synth_bmp(36, 16, (90, 90, 90))  # all bits 0
        pairs = multimodal.dhash_near_dups(
            _media_df(spark, [(0, base), (1, brighter), (2, spotted),
                              (3, flat), (4, b"\xff\xd8\xffjpeg-ish")]),
            decode_stub=False)
        got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
        # the three gradient variants pair up; the flat image (dhash 0,
        # hamming 64 from -1) and the undecodable payload (NULL) don't
        assert set(got) == {(0, 1), (0, 2), (1, 2)}
        assert got[(0, 1)] == 0 and got[(0, 2)] <= 1

    def test_ppm_and_bottom_up_bmp_grid_orientation(self, spark):
        # a PPM with a bright TOP half and a bottom-up BMP with a bright
        # top half must hash identically (row flip handled)
        import struct as st
        w, h = 18, 8
        top_rows = [bytes((200, 200, 200)) * w] * (h // 2)
        bot_rows = [bytes((20, 20, 20)) * w] * (h // 2)
        ppm = (f"P6\n{w} {h}\n255\n".encode()
               + b"".join(top_rows + bot_rows))
        row_bytes = (w * 3 + 3) & ~3
        pad = b"\x00" * (row_bytes - w * 3)
        # bottom-up BMP stores the LAST visual row first
        bmp_rows = [r + pad for r in (bot_rows + top_rows)]
        pixels = b"".join(bmp_rows)
        size = 54 + len(pixels)
        bmp = (b"BM" + st.pack("<IHHI", size, 0, 0, 54)
               + st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                         len(pixels), 2835, 2835, 0, 0) + pixels)
        out = {r.doc_id: r.dhash for r in multimodal.image_dhash(
            _media_df(spark, [(0, ppm), (1, bmp)]),
            decode_stub=False).collect()}
        assert out[0] == out[1]

    def test_stub_hash_drops_sub_bigram_docs(self, spark):
        df = spark.createDataFrame(
            [(0, "one token only".encode()), (1, "single".encode()),
             (2, b"")],
            "doc_id long, payload binary").withColumn("fmt", F.lit("jpeg"))
        out = multimodal.image_dhash(df, decode_stub=True).collect()
        assert {r.doc_id for r in out} == {0}
