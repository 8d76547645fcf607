"""Query registry: every implemented operator from SURVEY.md §2 (plus the
§7 scale extensions) as a named (Spark builder, DuckDB oracle SQL) pair.

The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically in both dialects;
- float outputs are made cross-engine-deterministic (integer/decimal
  arithmetic inside aggregates, doubles only at the outermost step);
- timestamps are projected as epoch seconds (long) or formatted strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registry entry: a Spark query builder + its DuckDB oracle.

    ``sql=None`` marks genuinely non-SQL-expressible ops (the driver then
    records a weaker rows-only check).
    """
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


# The external correctness driver compares only the FIRST 50 registry
# entries against their oracles, so ordering is evidence policy: queries
# that have never been driver-checked (or whose fix needs re-proof) go
# first; long-green queries fill the tail.  Names not listed keep module
# order after these.
DRIVER_PRIORITY: tuple[str, ...] = (
    # never driver-checked before round 3
    "dup_clusters", "pii_redaction", "source_mixture", "unigram_surprisal",
    "embedding_quantization", "curation_report", "funnel_conversion",
    "rolling_user_activity", "purchase_attribution", "click_attribution_asof",
    "error_click_pairs", "segment_distinct_nations", "segment_approx_distinct",
    "cube_returns", "salted_join_revenue", "latency_p95_approx",
    # broken in r2 by the TIMESTAMP_NTZ ingest regression — re-prove the fix
    "error_rate_sliding", "error_rate_tumbling", "latency_p95_daily",
    "slo_breach_streaks", "alert_metrics_daily", "escalation_metrics_daily",
    "user_sessions",
    # r2 oracle typing bug (HUGEINT shard_id) — re-prove the fix
    "token_shards",
    # new in round 3 — first driver check
    "bigram_surprisal", "knn_recall", "packing_efficiency",
    "quality_filter_funnel", "centroid_similarity", "event_lateness_audit",
    "customer_order_histogram", "part_revenue_share", "rich_idle_customers",
    "duplicate_ngram_spans", "corpus_shuffle", "error_interarrival",
    "alert_throttle", "token_weighted_sample", "pq_codes",
)


def all_queries() -> dict[str, QuerySpec]:
    from . import advanced, reference, relational, pipeline
    merged: dict[str, QuerySpec] = {}
    for mod in (reference, relational, pipeline, advanced):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in DRIVER_PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names not in registry: {missing}")
    out = {n: merged[n] for n in DRIVER_PRIORITY}
    out.update((n, s) for n, s in merged.items() if n not in out)
    return out
