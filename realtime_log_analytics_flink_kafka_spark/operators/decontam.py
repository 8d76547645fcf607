"""Benchmark decontamination: flag training documents that share n-grams
with an evaluation/benchmark set.

The standard pre-training hygiene step (held-out benchmarks must not leak
into the corpus): any corpus document sharing an n-gram with any benchmark
document is contaminated and usually dropped.

Scale design: the benchmark side is tiny by nature (eval sets are
thousands of documents against a 100 TB corpus), so its distinct n-gram
hash set is **broadcast** — the corpus side joins map-side with no
shuffle of corpus data for candidate detection; the only shuffle is the
per-doc count aggregation, keyed by doc_id (perfectly spreadable, no
skew).  Corpus n-grams are never collected or materialized globally.

Everything is built-in expressions; hashing is md5-folded for DuckDB
oracle parity (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.detmath import exact_round_div

from .dedup import shingle_hashes

#: A doc is contaminated if at least this fraction of its n-gram
#: instances also appear in the benchmark set.  Threshold 0 + `> 0`
#: semantics (any hit) is the usual production setting; a ratio output
#: lets callers pick their own cut.
CONTAMINATION_THRESHOLD = 0.05


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", *, n: int = 3) -> DataFrame:
    """Per-corpus-document n-gram overlap with the benchmark set.

    Returns (doc_id, n_shingles, n_hits, contamination_ratio,
    contaminated).  Documents with fewer than ``n`` tokens have no
    n-grams and are absent (nothing to test).

    One wide shuffle total: benchmark hashes are distinct-ed (benchmark
    is small — that aggregation is trivial) and broadcast; the corpus
    explode joins them map-side via a left join with a hit marker, and a
    single doc_id-keyed aggregation produces both the total and the hit
    count.
    """
    bench = (
        shingle_hashes(benchmark, text_col, n)
        .select("h").distinct()
        .withColumn("_hit", F.lit(1))
    )
    corp = shingle_hashes(corpus, text_col, n)
    per_doc = (
        corp.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("_hit").alias("n_hits"),
        )
    )
    ratio = exact_round_div(F.col("n_hits"), F.col("n_shingles"))
    return per_doc.select(
        "doc_id", "n_shingles", "n_hits",
        ratio.alias("contamination_ratio"),
        (ratio >= CONTAMINATION_THRESHOLD).alias("contaminated"),
    )
