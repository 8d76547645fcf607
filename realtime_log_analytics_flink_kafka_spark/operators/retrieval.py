"""Hybrid retrieval: reciprocal-rank fusion of ranked candidate lists.

The standard production retrieval stack runs a lexical ranker (BM25,
operators/text.bm25_scores) and a dense ranker (embedding cosine,
operators/similarity.cosine_topk) side by side and fuses them with
Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09):

    RRF(d) = Σ_r 1 / (k0 + rank_r(d))        (k0 = 60 canonically)

RRF needs only ranks, so it is immune to the two rankers' incomparable
score scales — which is exactly why it is the default fusion in hybrid
search engines.

Scale shape: each branch is already a bounded top-k (TakeOrdered /
broadcast top-k — never a corpus sort), so the fusion joins two <= k-row
relations: a full-outer equi-join on the document key plus one global
window over <= 2k rows.  Corpus-sized data never reaches the fusion.

Determinism: 1/(k0+r) terms are summed as EXACT integer rationals
(num/den with den = prod of the per-branch denominators, k0 and ranks
being integers), so the fused ordering and the rounded score are
bit-identical cross-engine — no float summation order to diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.detmath import exact_round_div

#: Canonical RRF dampening constant from the original paper.
RRF_K0 = 60


def rrf_fuse(a: DataFrame, b: DataFrame, *, key: str = "doc_id",
             rank_a: str = "rank_lex", rank_b: str = "rank_dense",
             k0: int = RRF_K0) -> DataFrame:
    """Fuse two ranked lists into (key, rank_a, rank_b, rrf, final_rank).

    ``a`` / ``b`` carry (key, rank column) with 1-based ranks; a document
    absent from one list contributes only the other branch's term (the
    RRF convention).  The fused ordering uses the UNROUNDED exact
    rational num/den (as an IEEE double of two exact integers —
    bit-identical cross-engine), with the key as total tie-break; ``rrf``
    is the half-away-rounded score at 6 decimals for reporting.
    """
    fused = (
        a.select(key, rank_a)
        .join(b.select(key, rank_b), [key], "full_outer")
        .withColumns({
            "_na": F.when(F.col(rank_a).isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long"),
            "_da": F.coalesce(F.lit(k0) + F.col(rank_a), F.lit(1)).cast("long"),
            "_nb": F.when(F.col(rank_b).isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long"),
            "_db": F.coalesce(F.lit(k0) + F.col(rank_b), F.lit(1)).cast("long"),
        })
        .withColumns({
            "_num": F.col("_na") * F.col("_db") + F.col("_nb") * F.col("_da"),
            "_den": F.col("_da") * F.col("_db"),
        })
        .withColumn("_xr", F.col("_num").cast("double") / F.col("_den").cast("double"))
    )
    w = Window.orderBy(F.desc("_xr"), F.asc(key))
    return (
        fused.select(
            key, rank_a, rank_b,
            exact_round_div(F.col("_num"), F.col("_den"), 6).alias("rrf"),
            F.row_number().over(w).cast("long").alias("final_rank"),
            "_xr",
        )
        .drop("_xr")
    )


def ranked(df: DataFrame, order: list[Column], out: str) -> DataFrame:
    """Attach a 1-based dense rank column over an already-bounded top-k
    relation (single global window — callers must pass <= k rows)."""
    return df.withColumn(
        out, F.row_number().over(Window.orderBy(*order)).cast("long"))
