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
    # ==== round-8 evidence policy =========================================
    # The r7 board was 49/49 green on oracle-paired entries (+ the
    # declared rows-only embedding_anisotropy), so r8 does what VERDICT
    # r7 next-round #1 asks: (a) the SEVEN queries that have never been
    # driver-checked — the three late-r7 additions (retrieval_ndcg,
    # token_budget_allocation, and embedding_effective_rank, which
    # additionally carries its r8 shuffle-shape rewrite: the chunk-
    # moment applyInPandas fold, proven byte-identical against the
    # UNCHANGED oracle at sf0.001/0.01 and bit-equal to the old form on
    # two 50k-vector layouts) plus the four r8-new query families
    # (dup_kcore bounded-round peel, textrank_keywords iterated float
    # folds, supplier_revenue_share scalar-subquery shape,
    # quarter_top_supplier decimal-exact argmax) — new construct
    # classes go in the window immediately; (b) the ENTIRE 29-query
    # r4-stale cohort, retiring the oldest freshness tier — after r8 no
    # registry query's last driver check is older than r5 (the r7
    # done-bar, advanced one round); (c) 14 fills from the 40-query
    # r5-stale tier, taken as the alphabetical prefix (so the next
    # rotation continues deterministically at doc_length_histogram) —
    # cluster_best_representative lands in-window anyway, re-proving
    # the bench-variance adjudication's hash-unchanged claim.
    # Everything out-of-window is re-proven by the sf0.01 full-registry
    # value-exact sweep each session (tests/test_oracle_parity*.py).
    #
    # -- (a) never driver-checked: late-r7 + r8-new ------------------------
    "embedding_effective_rank", "retrieval_ndcg", "token_budget_allocation",
    "dup_kcore", "textrank_keywords", "supplier_revenue_share",
    "quarter_top_supplier", "robust_trend", "embedding_top_eigen",
    "returned_revenue_customers", "large_volume_orders",
    "lang_confusion", "dedup_rate_by_source",
    # -- (b) the full r4-stale cohort (29) ---------------------------------
    "alert_metrics_unpivot", "blocklist_filter", "cluster_balanced_sample",
    "cohort_retention", "correlated_incidents", "dau_wau",
    "dedup_containment", "dedup_threshold_sweep", "disjunctive_revenue",
    "dsir_weights", "dup_clusters", "embedding_audit",
    "embedding_truncation", "event_transitions", "hard_negatives",
    "knn_ivf_pq", "knn_recall", "latency_anomalies", "latency_bands_daily",
    "log_templates", "media_decode", "metrics_reconciliation",
    "mixture_temperature_sweep", "order_priority_check", "pq_codes",
    "semantic_dup_clusters", "service_daily_gapfill", "waiting_suppliers",
    "wav_frames",
    # -- (c) r5-stale fill: alphabetical prefix (8) -------------------------
    "bigram_surprisal", "bm25_search", "boilerplate_fraction",
    "bpe_pair_counts", "cluster_best_representative",
    "cross_source_overlap", "decontamination", "dedup_exact",
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
