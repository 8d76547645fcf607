"""Interval analytics: gaps-and-islands coalescing and a bucketed
interval-overlap (range) join.

Spark has no native interval/range join; the naive expression — an
equi-join on the entity key with range predicates — breaks at scale
in two ways: a low-cardinality key (the reference has exactly 4
services, kafka/log_producer.py:18-23) degenerates into 4 giant skewed
partitions, and with NO key it is a BroadcastNestedLoop/cartesian.  The
scalable form used everywhere (and what commercial engines' range-join
hints do under the hood) is a bucket grid: explode each interval to the
fixed-width buckets it covers, equi-join on (key, bucket) — which
shuffles on a key whose cardinality is |keys| x |grid| — then exact
range post-filter and pair dedup.  Work is proportional to overlap
density x explode factor (span/bucket_s), never |A| x |B|.

Pick ``bucket_s`` near the typical interval span: too small multiplies
the explode factor, too big degrades toward the key-only join.  At 100
TB both interval sets here are aggregates (orders of magnitude smaller
than the raw fact table), so the exploded sides stay small relative to
the scan that produced them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def islands(buckets: DataFrame, key_cols: Sequence[str], bucket_col: str,
            bucket_s: int, agg_cols: dict[str, F.Column] | None = None,
            ) -> DataFrame:
    """Coalesce consecutive per-key buckets into maximal intervals
    (gaps-and-islands).

    ``buckets`` has one row per (key, bucket ordinal); consecutive
    ordinals merge.  The classic trick: ordinal minus its per-key rank is
    constant exactly within a consecutive run, so a single window pass +
    one aggregation finds maximal runs — no iterative self-join.  One
    shuffle on the keys; per-key window state is O(1).

    Returns half-open [start_s, end_s) epoch-second intervals with
    ``n_buckets`` plus any ``agg_cols`` (name -> aggregate expression
    over the run's rows).
    """
    w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    run = (F.col(bucket_col) - F.row_number().over(w)).alias("_run")
    aggs = [
        (F.min(bucket_col) * bucket_s).cast("long").alias("start_s"),
        ((F.max(bucket_col) + 1) * bucket_s).cast("long").alias("end_s"),
        F.count("*").cast("long").alias("n_buckets"),
    ] + [expr.alias(name) for name, expr in (agg_cols or {}).items()]
    return (buckets.select("*", run)
            .groupBy(*key_cols, "_run").agg(*aggs).drop("_run"))


def bucketed_interval_join(a: DataFrame, b: DataFrame,
                           key_cols: Sequence[str], *,
                           a_start: str = "start_s", a_end: str = "end_s",
                           b_start: str = "start_s", b_end: str = "end_s",
                           bucket_s: int) -> DataFrame:
    """All (a, b) pairs sharing every key whose half-open intervals
    overlap: ``a.start < b.end AND b.start < a.end``.

    Both sides explode onto the same fixed-width bucket grid
    (``sequence`` of covered bucket ordinals — bounded, JVM-side), the
    join is a pure equi-join on (keys..., bucket), the exact range
    predicate then removes grid-coincidence false positives, and
    a ``distinct`` collapses pairs that co-occupy several buckets
    (inputs must therefore be duplicate-free — true of any
    aggregate-derived interval set).  Column names (beyond the keys)
    must be disjoint between ``a`` and ``b``; the output carries all of
    them.
    """
    def grid(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = F.floor(F.col(start) / bucket_s)
        hi = F.floor((F.col(end) - 1) / bucket_s)
        # empty half-open intervals (end <= start) make hi < lo, where
        # Spark's sequence() defaults to step -1 and would fabricate a
        # DESCENDING bucket list (phantom join rows) instead of none —
        # drop them before the explode (ADVICE r5)
        return (df.filter(F.col(end) > F.col(start))
                .withColumn("_bk", F.explode(F.sequence(lo, hi))))

    keys = list(key_cols)
    return (
        grid(a, a_start, a_end)
        .join(grid(b, b_start, b_end), on=keys + ["_bk"])
        .drop("_bk")
        .filter((F.col(a_start) < F.col(b_end))
                & (F.col(b_start) < F.col(a_end)))
        .distinct()
    )
