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

from pyspark.sql import Column, DataFrame, Window
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


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, *, right_cols: list[str],
              tolerance: int | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Backward as-of join: every left row picks the single right row with
    matching ``on`` keys and the greatest ``right_ts <= left_ts`` (left
    outer — unmatched left rows keep NULL right columns).

    The classic formulation is a theta-join + per-key argmax — quadratic
    candidates per key.  This is the interleave formulation instead:
    union-tag both sides, ONE window per key ordered by (ts, side),
    carry the latest right payload forward with ignorenulls-``last``,
    keep the left rows.  ONE hash shuffle on the key and a per-partition
    sort — no join node in the plan at all, which is strictly better
    than any join-based as-of at 100 TB (cost is that of a sort-merge
    join's shuffle side without the probe).  Skewed keys are ordinary
    sort skew; the window never buffers more than the running payload.

    Ties: a right row at exactly ``left_ts`` matches (inclusive); equal
    right timestamps within a key resolve to the row greatest by
    ``(right_ts, *right_cols)`` lexicographic order — deterministic for
    unique right rows.

    ``tolerance`` (same unit as the ts columns; seconds for timestamps):
    matches older than ``left_ts - tolerance`` are nulled out, matching
    pandas ``merge_asof(tolerance=...)`` semantics.

    ``right_cols`` are the right payload columns to carry; they land on
    the output as ``{prefix}{col}`` plus ``{prefix}{right_ts}`` for the
    matched timestamp.  Left columns pass through unchanged.
    """
    payload = F.struct(
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(*on, F.col(right_ts).alias("_t"),
                     payload.alias("_asof"), F.lit(0).alias("_side"))
    l = left.select("*", F.col(left_ts).alias("_t"),
                    F.lit(1).alias("_side"))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (Window.partitionBy(*on).orderBy("_t", "_side", "_asof")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn("_m", F.last("_asof", ignorenulls=True).over(w))

    lt, rt = F.col("_t"), F.col("_m._ts")
    if tolerance is not None:
        is_ts = dict(matched.dtypes)["_t"] in ("timestamp", "timestamp_ntz")
        gap = ((F.unix_timestamp(lt) - F.unix_timestamp(rt)) if is_ts
               else (lt - rt))
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m")))

    out = [F.col(c) for c in left.columns]
    out.append(F.col("_m._ts").alias(f"{prefix}{right_ts}"))
    out.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return matched.filter(F.col("_side") == 1).select(*out)
