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
