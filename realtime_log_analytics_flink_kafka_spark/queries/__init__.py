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
    # ==== round-10 evidence policy ========================================
    # The r9 board was 50/50 green (fifth consecutive), so r10 does what
    # VERDICT r9 next-round #2 asks — retire the r6-stale freshness
    # tier: (a) the TEN r10-new query families (media_near_dups'
    # banded dHash pair join, seasonal_decompose's centered-window +
    # ordered-fold decomposition, kmeans_silhouette's broadcast-centroid
    # (b−a)/max(a,b) scorecard, hll_source_overlap's merged-register set
    # algebra, l_diversity_audit's sensitive-diversity reduction,
    # dup_modularity's cross-detector e_c/m − (d_c/2m)² audit,
    # retrieval_mrr's first-hit reciprocal-rank report,
    # embedding_centroid_drift's split-half centroid comparison,
    # revenue_theil's det_ln concentration fold, dup_cluster_sources'
    # mirror/boilerplate verdict) — new
    # construct classes go in the window immediately; (b) the ENTIRE
    # 39-query r6-stale cohort (everything whose last driver check is
    # CORRECTNESS_r06, per the committed EVIDENCE.md freshness table);
    # and (c) embedding_anisotropy — rows-only by classification, never
    # driver-green, last rows-checked r7 — so its weaker check stays
    # fresh too.  10 + 39 + 1 = exactly 50; the r7 tier's rotation
    # continues next round at alert_metrics_daily.  After r10 no
    # registry query's last driver check is older than r7 (the r9
    # done-bar, advanced one round).  Everything out-of-window is
    # re-proven by the sf0.01 full-registry value-exact sweep each
    # session (tests/test_oracle_parity*.py).
    #
    # -- (a) never driver-checked: r10-new (10) ------------------------------
    "media_near_dups", "seasonal_decompose", "kmeans_silhouette",
    "hll_source_overlap", "l_diversity_audit", "dup_modularity",
    "retrieval_mrr", "embedding_centroid_drift", "revenue_theil",
    "dup_cluster_sources",
    # -- (b) the full r6-stale cohort (39) ----------------------------------
    "doc_split_counts", "embedding_near_dups", "error_budget_burn",
    "error_rate_sliding", "escalation_metrics_daily", "frame_samples",
    "grouping_sets_orders", "hll_shingles", "hourly_profile",
    "hybrid_retrieval", "intra_doc_dedup", "jaccard_prefix_join",
    "jm_bigram_surprisal", "knn_ivf", "knn_ivf_multiprobe",
    "knn_lsh_pairs", "label_centroids", "latency_ewma_daily",
    "latency_median_mad", "media_resize", "media_summary",
    "minhash_accuracy", "nation_trade_volume", "ngram_diversity",
    "order_fulfillment_lag", "orders_by_priority_pivot",
    "pmi_collocations", "props_json_extract", "quality_scores",
    "segment_dedup", "session_bounce_rate", "skew_audit",
    "small_quantity_revenue", "source_kl_divergence", "stratified_sample",
    "term_typo_variants", "top_revenue_orders", "unigram_surprisal",
    "zorder_locality",
    # -- (c) the never-green rows-only classification, kept fresh ------------
    "embedding_anisotropy",
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
