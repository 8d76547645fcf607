"""Exact nearest-rank-low percentile (SURVEY §2.4 A3).

The reference's P95Window buffers every latency in the window, sorts
ascending and takes index ``int(q * (n-1))`` (flink/latency_slo_monitor.py:45-64).
No Spark built-in matches: ``percentile()`` interpolates,
``percentile_approx`` approximates.  We reproduce it exactly with
array_sort(collect_list(..)) — fine at per-(key,window) cardinalities; the
documented scale fallback is ``percentile_approx(col, q, accuracy)`` which
keeps state O(accuracy) instead of O(n) per window.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_percentile_disc(col: Column, q: float) -> Column:
    """Aggregate expression: sorted-ascending element at int(q*(n-1)).

    Null inputs are excluded (collect_list skips nulls), matching the
    reference which never emits null latencies.
    """
    arr = F.array_sort(F.collect_list(col))
    idx = F.floor(F.lit(q) * (F.size(arr) - 1)).cast("int")
    return F.get(arr, idx)


def percentile_disc_sql(expr: str, q: float) -> str:
    """DuckDB oracle rendering: 1-based list indexing."""
    return (
        f"(list_sort(list({expr})))"
        f"[CAST(floor({q} * (count({expr}) - 1)) AS INT) + 1]"
    )
