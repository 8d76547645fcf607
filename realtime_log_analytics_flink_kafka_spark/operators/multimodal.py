"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a clearly
marked stub (``decode_stub=True`` yields deterministic fake features; the
real decoder raises NotImplementedError) — but the Spark-side plumbing is
real and tested: binary schema, Arrow batch shape through mapInPandas,
per-partition batching, metadata pushdown.

At scale: binary payloads stay columnar in parquet; metadata predicates
(format, byte_len) push down so full blobs are only read for surviving
rows; decode parallelism = input splits, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Synthetic format assignment for fixture rows (documents have no real
#: blobs; text bytes play the payload).
FORMATS = ("jpeg", "png", "webp")

DECODED_SCHEMA = (
    "doc_id long, fmt string, byte_len long, "
    "width long, height long, feat_mean double"
)


def as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents -> (doc_id, fmt, payload binary, byte_len).

    Format is assigned deterministically (doc_id mod 3) — stand-in for
    real magic-byte sniffing, which would be
    ``F.hex(F.substring(payload, 1, 4))`` against known signatures.
    """
    payload = F.col(text_col).cast("binary")
    return docs.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(f) for f in FORMATS]),
                     (F.col("doc_id") % len(FORMATS) + 1).cast("int")).alias("fmt"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )


def decode_features(media: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow-batched).

    Real implementation would decode payload bytes (PIL/ffmpeg) per batch;
    the stub derives deterministic fake dimensions/features from byte
    length so tests can assert the full pipeline shape.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding needs image/audio codecs not present "
                    "in this environment; run with decode_stub=True")
            n = pdf["byte_len"].astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "byte_len": n,
                "width": (n % 640) + 16,          # fake decode
                "height": ((n * 7) % 480) + 16,   # fake decode
                "feat_mean": (n % 255) / 255.0,   # fake feature
            })

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, fmt string, src_width long, src_height long, "
    "out_width long, out_height long"
)

#: Fake "video" timing for the frame-sample stub: fixed 33 ms/frame
#: (~30 fps) keeps ts_ms pure-integer arithmetic — no float parity risk
#: in the DuckDB oracle.
FRAME_MS = 33

FRAMES_SCHEMA = "doc_id long, fmt string, n_frames long, frame_idx long, ts_ms long"


def resize_images(media: DataFrame, target_w: int = 256, target_h: int = 256,
                  *, decode_stub: bool = True) -> DataFrame:
    """Aspect-preserving thumbnail resize via mapInPandas.

    The fit-within-box math (min of the two scale ratios, floor to int,
    clamp >=1) is the real algorithm; only the pixel decode/encode is
    stubbed — source dims derive from byte_len exactly as
    :func:`decode_features` does, so the two stubs agree.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resizing needs codecs not present in this "
                    "environment; run with decode_stub=True")
            n = pdf["byte_len"].astype("int64")
            src_w = (n % 640) + 16
            src_h = ((n * 7) % 480) + 16
            # fit-within-box: scale both dims by min ratio, never upscale
            ratio = pd.concat([target_w / src_w, target_h / src_h], axis=1
                              ).min(axis=1).clip(upper=1.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "src_width": src_w,
                "src_height": src_h,
                "out_width": (src_w * ratio).astype("int64").clip(lower=1),
                "out_height": (src_h * ratio).astype("int64").clip(lower=1),
            })

    return _meta_only(media, decode_stub).mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every: int = 10,
                  *, decode_stub: bool = True) -> DataFrame:
    """Every-k-th frame sampling: one input payload fans out to N frame
    rows *inside* the Arrow batch (index-repeat, no Python row loop) —
    the real shape of a video-frame extractor, where output cardinality
    is data-dependent and decided per payload.

    Stub frame count is ``byte_len % 90 + 30`` (a real decoder would read
    the container header); ``ts_ms = frame_idx * 33`` (~30 fps).
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction needs video codecs not present "
                    "in this environment; run with decode_stub=True")
            n_frames = (pdf["byte_len"].astype("int64") % 90) + 30
            reps = ((n_frames - 1) // every + 1).to_numpy()
            idx = np.repeat(np.arange(len(pdf)), reps)
            offsets = np.concatenate([np.arange(r) * every for r in reps]) \
                if len(reps) else np.array([], dtype="int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[idx],
                "fmt": pdf["fmt"].to_numpy()[idx],
                "n_frames": n_frames.to_numpy()[idx],
                "frame_idx": offsets,
                "ts_ms": offsets * FRAME_MS,
            })

    return _meta_only(media, decode_stub).mapInPandas(_sample, schema=FRAMES_SCHEMA)


def _meta_only(media: DataFrame, decode_stub: bool) -> DataFrame:
    """Stub paths read only metadata — dropping the binary column here
    lets parquet column pruning skip the blob pages entirely and keeps it
    out of the Arrow transfer.  The real-codec path ships the payload."""
    if decode_stub and "payload" in media.columns:
        return media.drop("payload")
    return media


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — runs without touching payload bytes (column
    pruning drops the blob from the scan)."""
    return (
        media.groupBy("fmt")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("byte_len").alias("total_bytes"),
            F.min("byte_len").alias("min_bytes"),
            F.max("byte_len").alias("max_bytes"),
        )
    )
