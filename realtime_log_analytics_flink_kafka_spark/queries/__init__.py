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
    # ==== round-12 evidence policy ========================================
    # The r11 board was 50/50 green (seventh consecutive zero-failure
    # round), so r12 rotates exactly as VERDICT r11 next-round #2
    # prescribes: (a) the six r11 queries that were added AFTER the
    # r11 window froze and have therefore never been driver-checked
    # (dedup_modality_agreement, lexical_pair_agreement,
    # audio_near_dups_incremental, latency_fdr_audit,
    # source_lang_chisq, service_burstiness) plus any r12-new queries
    # — never-checked entries always open the window; (b)
    # returns_rollup, the adjudicated r7 carry, retiring the last
    # pre-r8 staleness; (c) the r8-stale tier alphabetically from
    # alert_metrics_unpivot, as many as fit.  With the r12-new
    # queries in front, the r8 entries that do NOT fit this window
    # and stay r8-stale (rotate them first in r13) are:
    # latency_bands_daily, log_templates, media_decode,
    # metrics_reconciliation, mixture_temperature_sweep,
    # order_priority_check, pq_codes, quarter_top_supplier,
    # retrieval_ndcg,
    # returned_revenue_customers, robust_trend, semantic_dup_clusters,
    # service_daily_gapfill, supplier_revenue_share,
    # textrank_keywords, token_budget_allocation, waiting_suppliers,
    # wav_frames.  Everything out-of-window is re-proven by the
    # sf0.01 full-registry value-exact sweep each session
    # (tests/test_oracle_parity*.py + the verify-skill sweep).
    #
    # -- (a) never driver-checked: r12-new first, then the post-window
    #    r11 six ------------------------------------------------------------
    "audio_modality_agreement", "conversion_logrank",
    "conversion_survival",
    "latency_changepoint", "latency_kruskal", "latency_ks_drift",
    "latency_psi",
    "latency_wasserstein", "source_ks_drift", "source_lang_mi",
    "spearman_signal_correlations",
    "dedup_modality_agreement", "lexical_pair_agreement",
    "audio_near_dups_incremental", "latency_fdr_audit",
    "source_lang_chisq", "service_burstiness",
    # -- (b) the adjudicated r7 carry ----------------------------------------
    "returns_rollup",
    # -- (c) the r8-stale tier, alphabetical, as many as fit (40) ------------
    "alert_metrics_unpivot", "bigram_surprisal", "blocklist_filter",
    "bm25_search", "boilerplate_fraction", "bpe_pair_counts",
    "cluster_balanced_sample", "cluster_best_representative",
    "cohort_retention", "correlated_incidents", "cross_source_overlap",
    "dau_wau", "decontamination", "dedup_containment", "dedup_exact",
    "dedup_rate_by_source", "dedup_threshold_sweep",
    "disjunctive_revenue", "dsir_weights", "dup_clusters", "dup_kcore",
    "embedding_audit", "embedding_effective_rank",
    "embedding_top_eigen", "embedding_truncation", "event_transitions",
    "hard_negatives", "knn_ivf_pq", "knn_recall", "lang_confusion",
    "large_volume_orders", "latency_anomalies",
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
