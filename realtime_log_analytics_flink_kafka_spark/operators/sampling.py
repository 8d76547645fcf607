"""Deterministic sampling operators for training-data pipelines.

``stratified_sample`` keeps a per-stratum fraction of rows by hashing
the row id, never by ``rand()``: the same row always lands in (or out
of) the sample regardless of partitioning, retries, or engine — the
property that keeps a held-out split honest when upstream jobs are
re-run, and the same trick the hash-bucket train/val/test split uses
(queries/pipeline.py:q_doc_split_counts).

At 100 TB this is a stateless per-row filter: no shuffle, no
coordination, pushdown-friendly (the filter sits directly on the scan),
and the sample is reproducible from the salt alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

#: Salt for the sampling draw — distinct from the split salt so the
#: sample and the train/val/test assignment are independent hashes.
SAMPLE_SALT = ":sample"


def sample_draw(id_col: str = "doc_id") -> F.Column:
    """Uniform draw in [0, 10000) from the row id (basis points)."""
    return md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(SAMPLE_SALT))) % 10_000


def stratified_sample(df: DataFrame, rates_bp: dict[str, int], *,
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_bp: int = 0) -> DataFrame:
    """Keep each row with its stratum's probability (in basis points).

    E.g. ``{"en": 2000, "de": 10000}`` keeps ~20 % of English rows and
    all German ones; strata not listed fall back to ``default_bp``.
    Deterministic: row membership depends only on (id, salt).
    """
    rate = F.lit(default_bp)
    for stratum, bp in rates_bp.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.filter(sample_draw(id_col) < rate)
