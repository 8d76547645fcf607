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
