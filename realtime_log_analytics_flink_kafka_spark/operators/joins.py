"""Join operators Spark lacks natively, re-expressed as shuffle-friendly
compositions of built-ins.

``range_join`` — pairs (l, r) where ``r.point - l.point`` falls in
``[lower, upper]`` — is the classic interval/range join (Flink's interval
join; the reference repo itself has no joins, SURVEY.md §2.5).  The naive
formulation is a theta-join: Spark would plan BroadcastNestedLoopJoin or
a cartesian product, both O(|L|·|R|) per key — unusable at 100 TB.

Scalable formulation (bucketed equi-join):

- bucket width W = span of the interval; every right point lands in
  exactly one bucket ``p DIV W``;
- a left interval of length W overlaps at most TWO consecutive buckets,
  so the left side explodes into ≤2 bucket ids;
- equi-join on (keys..., bucket) — an ordinary hash-shuffle join AQE can
  re-plan (skew-split, broadcast if one side is small) — then the exact
  range predicate filters survivors.

Cost: ≤2× left duplication and a candidate set bounded by per-bucket
occupancy, instead of per-key quadratic.  Each (l, r) pair can meet in at
most one bucket (the right row has one bucket id), so no dedup pass is
needed.

Arithmetic is integer end-to-end (``DIV``, not float division then
floor): epoch-microsecond points exceed 2^53, where double rounding
would misplace bucket boundaries.  Bucket ids use explicit FLOOR
division — plain ``DIV`` truncates toward zero, which for negative
points (pre-1970 epochs, signed deltas) would shift the bucket boundary
and silently drop matching pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "_rj_bucket"


def _floor_div(expr: str, span: int) -> Column:
    """Integer floor division of a (possibly negative) bigint expression:
    subtract the always-non-negative ``pmod`` remainder first, so the
    exact ``DIV`` equals mathematical floor for every sign."""
    x = f"({expr})"
    return F.expr(f"({x} - pmod({x}, {span})) DIV {span}")


def range_join(left: DataFrame, right: DataFrame, on: list[str],
               left_point: str, right_point: str,
               lower: int, upper: int) -> DataFrame:
    """Inner-join rows where ``right[right_point]`` lies within
    ``[left[left_point] + lower, left[left_point] + upper]`` and all
    ``on`` key columns match.

    Points and bounds are integers in the caller's unit (epoch micros,
    seconds, ...) and may be negative.  Column names must be disjoint
    apart from ``on`` — pre-alias before calling.
    """
    span = upper - lower + 1
    if span <= 0:
        raise ValueError(f"empty range: lower={lower} upper={upper}")

    lo = F.col(left_point) + F.lit(lower)
    hi = F.col(left_point) + F.lit(upper)
    l_bucketed = left.withColumn(
        _BUCKET,
        F.explode(F.array_distinct(F.array(
            _floor_div(f"{left_point} + {lower}", span),
            _floor_div(f"{left_point} + {upper}", span),
        ))),
    )
    r_bucketed = right.withColumn(_BUCKET, _floor_div(right_point, span))
    return (
        l_bucketed.join(r_bucketed, [*on, _BUCKET])
        .filter((F.col(right_point) >= lo) & (F.col(right_point) <= hi))
        .drop(_BUCKET)
    )
