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
    # ==== round-9 evidence policy =========================================
    # The r8 board was 50/50 green, so r9 does what VERDICT r8
    # next-round #1 asks — retire the r5-stale freshness tier: (a) the
    # FOURTEEN r9-new query families (error_latency_auc's rank-free
    # cumulative pair counting, error_rate_calibration's day-parity
    # train/test split, k_anonymity_audit's QI group-size reduction,
    # holt_forecast's two-state ordered float recursion,
    # changepoint_split's prefix-sum argmax, acf_daily's calendar-lag
    # spine join, nation_market_share's indicator-vs-semi-join Q8
    # shape, promo_revenue_share's Q14 indicator-carrying join,
    # dup_local_clustering's apex-kept triangle attribution,
    # embedding_outliers' broadcast-array Mahalanobis fold,
    # dow_anomalies' integer-exact seasonality flags,
    # sequence_matches' CEP-style relaxed-contiguity pattern,
    # kmeans_refine's fixed-sweep Lloyd codebook training,
    # dedup_detector_ari's pair-counting partition agreement) — new
    # construct classes go in the window immediately; (b) the ENTIRE remaining
    # 32-query r5-stale cohort (everything whose last driver check is
    # CORRECTNESS_r05) — note robust_trend is NOT here: its r9
    # trailing-window cap (ROBUST_TREND_MAX_DAYS) is proven
    # hash-neutral on the fixture by the unchanged-oracle sf0.001/0.01
    # sweeps and its r8 driver row is fresh; (c) 4 fills from the
    # 43-query r6-stale tier, taken as the alphabetical prefix (so the
    # next rotation continues deterministically at doc_split_counts).
    # After r9 no registry query's last driver check is older than r6
    # (the r8 done-bar, advanced one round).  Everything out-of-window
    # is re-proven by the sf0.01 full-registry value-exact sweep each
    # session (tests/test_oracle_parity*.py).
    #
    # -- (a) never driver-checked: r9-new (14) -------------------------------
    "error_latency_auc", "error_rate_calibration", "k_anonymity_audit",
    "holt_forecast", "changepoint_split",
    "acf_daily", "nation_market_share", "promo_revenue_share",
    "dup_local_clustering", "embedding_outliers", "dow_anomalies",
    "sequence_matches", "kmeans_refine", "dedup_detector_ari",
    # -- (b) the full r5-stale cohort (32) ----------------------------------
    "dedup_incremental", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_token_loss", "doc_chunks", "doc_fingerprints",
    "doc_length_histogram", "dup_graph_degrees", "duplicate_ngram_spans",
    "error_burst_busy_overlap", "heaps_law_fit", "knn_bruteforce",
    "language_id", "leakage_safe_split", "near_dup_survivors",
    "perplexity_buckets", "quality_filter_funnel", "quality_vs_perplexity",
    "repetition_filters", "signal_correlations", "simhash_pairs",
    "temperature_mixture", "tfidf_top_terms", "token_budget_cut",
    "token_counts", "token_entropy", "token_shards",
    "token_weighted_sample", "tokenizer_fertility", "top_terms_per_source",
    "winnowing_pairs", "zipf_fit",
    # -- (c) r6-stale fill: alphabetical prefix (4; the next rotation
    # continues deterministically at doc_split_counts) -----------------------
    "cms_term_counts", "curation_report", "customer_running_spend",
    "dedup_minhash_lsh",
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
