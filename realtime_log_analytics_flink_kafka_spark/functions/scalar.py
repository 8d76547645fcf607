"""Scalar expression library (SURVEY §2.2-2.3).

Everything here is a Catalyst column expression — JVM-side, codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .detmath import exact_round_div


def guarded_ratio(num: Column, den: Column, ndigits: int = 4) -> Column:
    """``round(num/den, ndigits) if den > 0 else 0.0`` — the reference's
    zero-guarded division (flink/error_rate_detector.py:79) plus its
    4-digit rounding (:101), computed in exact BIGINT arithmetic
    (functions/detmath.exact_round_div) so the double is cross-engine
    bit-identical even on half-boundary quotients."""
    return F.coalesce(exact_round_div(num, den, ndigits), F.lit(0.0))


def epoch_seconds(ts: Column) -> Column:
    """Timestamp -> epoch seconds (long) — the reference carries window
    bounds as epoch seconds (flink/error_rate_detector.py:99-100, millis//1000)."""
    return ts.cast("long")


def incident_id(prefix: str = "inc") -> Column:
    """``inc-`` + 8 hex chars (flink/error_rate_detector.py:95).

    Nondeterministic by design (uuid) — excluded from oracle-hashed
    projections; tests assert shape only.
    """
    return F.concat(
        F.lit(f"{prefix}-"),
        F.substring(F.regexp_replace(F.expr("uuid()"), "-", ""), 1, 8),
    )


def iso_to_timestamp(col: Column) -> Column:
    """ISO-8601 string -> timestamp; malformed -> epoch 0, matching the
    reference's silent fallback (flink/error_rate_detector.py:34-36)."""
    return F.coalesce(
        F.try_to_timestamp(col),
        F.lit("1970-01-01 00:00:00").cast("timestamp"),
    )
