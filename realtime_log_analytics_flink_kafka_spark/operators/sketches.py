"""Frequency-sketch operators: Misra–Gries heavy-hitter candidates with
an exact recount.

The exact way to find terms above a support threshold — ``GROUP BY term
HAVING count >= φ·N`` — shuffles EVERY distinct term, i.e. the whole
vocabulary long tail, to count items that are almost all then discarded.
At 100 TB the tail dominates the shuffle.  The classic fix is a
candidate pass with a mergeable summary: per input partition, a
Misra–Gries summary of capacity ``k`` retains every term whose
*partition-local* frequency exceeds 1/(k+1) of the partition — and any
term with GLOBAL frequency ≥ φ·N must have local frequency ≥ φ in at
least one partition (average argument), so with k ≥ 1/φ the union of
partition summaries is a SUPERSET of the true heavy hitters, at O(k)
memory per partition and zero shuffle.  A second pass recounts ONLY the
candidates exactly (broadcast semi-join before the aggregation), making
the final output exact and — although the candidate SET depends on
partitioning and batch boundaries — deterministic: supersets differ,
the exact threshold filter does not.

Guarantee: MG with capacity k, run over a partition of n tokens, keeps
every term with local count > n/(k+1); merging batch value_counts into
the summary and decrementing by the (k+1)-th largest count on overflow
preserves it (each overflow subtracts the same amount from every
surviving counter and at most that from the dropped ones).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(terms: DataFrame, term_col: str = "term",
                           *, k: int) -> DataFrame:
    """Distinct heavy-hitter CANDIDATES (superset semantics, see module
    docstring): one MG summary of capacity ``k`` per input partition,
    streamed batch-by-batch through Arrow — per-partition state is the
    k-entry dict, never the vocabulary."""
    import pandas as pd

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict[str, int] = {}
        for pdf in batches:
            for term, cnt in pdf[term_col].value_counts().items():
                summary[term] = summary.get(term, 0) + int(cnt)
            if len(summary) > k:
                # decrement by the (k+1)-th largest count: at least
                # |summary| - k entries hit zero and drop
                cut = sorted(summary.values(), reverse=True)[k]
                summary = {t: c - cut for t, c in summary.items()
                           if c - cut > 0}
        yield pd.DataFrame({term_col: list(summary)})

    return (terms.select(term_col)
            .mapInPandas(_mg, schema=f"{term_col} string")
            .distinct())


def frequent_terms(terms: DataFrame, term_col: str = "term", *,
                   num: int, den: int, slack: int = 2) -> DataFrame:
    """Terms whose frequency is ≥ num/den of all terms, with EXACT
    counts: MG candidate pass (k = slack·den/num ≥ 1/φ) → broadcast
    semi-join → exact recount of candidates only → integer-exact
    cross-multiplied threshold against the total.  Output columns:
    term, n, total_terms.
    """
    k = max(1, (slack * den) // max(1, num))
    cands = misra_gries_candidates(terms, term_col, k=k)
    total = terms.select(
        F.count("*").cast("long").alias("total_terms"))
    counts = (
        terms.join(F.broadcast(cands), term_col)
        .groupBy(term_col)
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))  # single-row broadcast
        .filter(F.col("n") * den >= F.col("total_terms") * num)
        .select(term_col, "n", "total_terms")
    )
