#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is materialized with count() (full plan execution without
driver-side row transfer), measured in PER-QUERY ISOLATION (VERDICT r4,
next-round #5): one untimed warmup run immediately before the timed
runs — absorbing whole-stage-codegen compilation, JIT, and parquet
footer caching while the generated classes are still hot — then the
median of RUNS timed executions, with the cache cleared and a full GC
requested before each so neither persisted intermediates nor a previous
query's garbage bleed into the measurement.  (The old design ran one
suite-wide warmup pass then one timed pass over all 75 queries; by the
timed tail the JVM was a different machine — BENCH_r04 showed ~2x
"ambient" slowdowns on untouched queries, indistinguishable from real
regressions.  See also session.py's ReservedCodeCacheSize bump.)
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from realtime_log_analytics_flink_kafka_spark.session import get_spark

#: Representative slice of the registry: reference detectors/metrics,
#: relational joins/aggs, pipeline dedup/ANN/text.
HEADLINE = [
    "error_rate_sliding",
    "latency_p95_daily",
    "slo_breach_streaks",
    "alert_metrics_daily",
    "escalation_metrics_daily",
    "pricing_summary",
    "shipping_priority",
    "regional_revenue",
    "user_sessions",
    "dedup_minhash_lsh",
    "dedup_exact",
    "knn_bruteforce",
    "token_counts",
    "doc_fingerprints",
    "error_click_pairs",
    "frame_samples",
    # round-2 additions: the heavier pipeline/relational queries, so
    # regressions in them are visible round-over-round
    "simhash_pairs",
    "tfidf_top_terms",
    "purchase_attribution",
    "knn_ivf",
    "decontamination",
    "repetition_filters",
    "curation_report",
    # round-2 continued: as-of join and iterative component clustering
    "click_attribution_asof",
    "dup_clusters",
    # round-3 additions: bigram LM scoring, the composed curation funnel,
    # ANN recall measurement, per-key event-time disorder audit
    "bigram_surprisal",
    "quality_filter_funnel",
    "knn_recall",
    "event_lateness_audit",
    "duplicate_ngram_spans",
    "pq_codes",
    # round-4 additions: the deterministic-ln rework makes these the
    # float-heaviest queries — regressions must be visible
    "unigram_surprisal",
    "token_weighted_sample",
    "knn_ivf_pq",
    "perplexity_buckets",
    # round-4 additions: corpus-wide segment dedup (two passes over the
    # segment explode), incremental batch-vs-corpus LSH, z-score anomalies
    "segment_dedup",
    "dedup_incremental",
    "latency_anomalies",
    "semantic_dup_clusters",
    "bpe_pair_counts",
    "dsir_weights",
    # round-4 continued: per-doc boilerplate share (the heaviest new span
    # aggregation), dup-graph degree histogram, temperature mixing
    "boilerplate_fraction",
    "dup_graph_degrees",
    "temperature_mixture",
    # round-4 continued: two-phase global-cumsum budget cut, robust
    # median/MAD, heavy-hitter skew audit
    "token_budget_cut",
    "latency_median_mad",
    "skew_audit",
    # round-4 continued: det_exp-composed temperature sweep (the widest
    # deterministic-float expression in the registry)
    "mixture_temperature_sweep",
    # round-4 continued: the three added relational shapes
    "metrics_reconciliation",
    "service_daily_gapfill",
    "alert_metrics_unpivot",
    "latency_bands_daily",
    "error_budget_burn",
    "cluster_balanced_sample",
    "cluster_best_representative",
    "quality_vs_perplexity",
    "dedup_threshold_sweep",
    "embedding_audit",
    "hourly_profile",
    # round-4 continued: the TPC-H Q4/Q21 self-join shapes (the anti/semi
    # probes over a shared fact shuffle are easy to regress into BNLJ)
    "order_priority_check",
    "waiting_suppliers",
    # round-4 continued: winnowing selection is the widest per-row HOF
    # pipeline (token -> k-gram hash -> window-min arrays); zipf_fit
    # stacks two det_ln DAGs plus an ordered moment fold
    "winnowing_pairs",
    "zipf_fit",
    "embedding_truncation",
    "bm25_search",
    # round-4 continued: cohort matrix (distinct + double agg over
    # events) and containment verify over the LSH candidate join
    "cohort_retention",
    "dedup_containment",
    "event_transitions",
    "disjunctive_revenue",
    "log_templates",
    "wav_frames",
    "dau_wau",
    # the one grouped-applyInPandas op (Arrow batch + LAPACK eigh)
    "embedding_anisotropy",
    "customer_spend_deciles",
    "session_bounce_rate",
    "correlated_incidents",
    "tokenizer_fertility",
    # round-5 additions: the bucketed interval-overlap (range) join and
    # the Misra-Gries heavy-hitter candidate pass with exact recount
    "error_burst_busy_overlap",
    "frequent_terms",
    # round-5 continued: group-aware train/val split (components + split
    # projection + straddle audit — the deepest composition over the
    # minhash subtree)
    "leakage_safe_split",
    # round-5 continued: corpus-statistics fits (entropy over distinct-
    # value factored det-ln; Heaps over power-of-two prefix buckets)
    "token_entropy",
    "heaps_law_fit",
    # prefix-filtered exact-Jaccard self-join (AllPairs/PPJoin candidates)
    "jaccard_prefix_join",
    # per-source Pearson matrix over integer-exact signal moments
    "signal_correlations",
    # round-6: RRF hybrid retrieval (BM25 + dense-cosine branch fusion)
    "hybrid_retrieval",
    # round-6: Count-Min grid build + probe audit (second sketch family)
    "cms_term_counts",
    # round-6: per-source HLL distinct-shingle estimate vs exact recount
    "hll_shingles",
    # round-6: within-doc repeated-span removal (per-doc agg, no corpus
    # shuffle — the plan-shape contrast to segment_dedup)
    "intra_doc_dedup",
    # round-6: JM-interpolated bigram LM (rational-mixture det_ln)
    "jm_bigram_surprisal",
    "source_kl_divergence",
    "ngram_diversity",
    "nation_trade_volume",
    "order_fulfillment_lag",
    "pmi_collocations",
    "term_typo_variants",
    "latency_ewma_daily",
    "error_trend_slope",
    "benford_price_audit",
    "zorder_locality",
    "spend_gini",
    "fk_integrity_audit",
    # round-7: degree-ordered wedge-join triangle census over the LSH
    # dup graph (the closure-rate structure audit)
    "dup_graph_triangles",
    # round-7: per-source Bloom filter over shingles + FPR probe audit
    # (third mergeable sketch family: set-union merge)
    "bloom_prefilter_audit",
    # round-7: iteration-free CUSUM change-point detector (prefix-sum
    # identity over stacked window frames)
    "error_cusum_drift",
    # round-7: Cohen's-kappa gate-agreement audit (double-DAG scalar
    # over an integer contingency table)
    "gate_agreement_kappa",
    # round-7: fixed-iteration PageRank over the dup graph (bounded
    # iterative joins, sorted-order float folds)
    "dup_pagerank",
    # round-7: HDR log-bucketed quantile sketch vs exact (fourth
    # mergeable sketch family: fixed-size cell-addition histogram)
    "hdr_latency_quantiles",
    # round-7: NDCG@k fusion audit (rank-ordered literal-weight folds
    # over the bounded retrieval lists)
    "retrieval_ndcg",
    # round-7: eigh-free effective rank via trace identities (the
    # oracle-checkable twin of the rows-only anisotropy op)
    "embedding_effective_rank",
    # round-7: closed-form capped water-filling budget allocator
    # (prefix-sum k* over the sources relation, exact-sum integer math)
    "token_budget_allocation",
    # round-8: bounded-round k-core peel over the dup graph (fixed
    # ks x rounds iterative semi-joins, the pagerank iteration class)
    "dup_kcore",
    # round-8: TextRank keywords (PageRank over the word co-occurrence
    # graph — iterated sorted-order float folds on a type-level graph)
    "textrank_keywords",
    # round-8: 10-step power-iteration top-eigenvalue (localCheckpoint
    # lineage truncation, sorted matvec folds over the cov-cell relation)
    "embedding_top_eigen",
    # round-9: exact rank-free Mann-Whitney AUC (cumulative window over
    # the bounded score-bucket relation — the no-global-sort ranking shape)
    "error_latency_auc",
    # round-9: held-out day-parity calibration audit (two map-side
    # reductions to band cardinality + one tiny join)
    "error_rate_calibration",
    # round-9: Holt linear smoothing (two-state ordered float recursion
    # folded in one pass over the days-sized array per service)
    "holt_forecast",
]

# HEADLINE membership policy (VERDICT r7 #6): the curated list above
# puts the scale-interesting queries in a stable order for
# round-over-round comparison — membership rule: every query whose plan
# shape a round deliberately changed or whose construct class is heavy
# (iterative joins, wide float DAGs, sketches, Arrow stages) joins when
# it lands and never leaves.  Since r8 the harness additionally appends
# EVERY remaining registry query (module order) so that no registry
# entry can regress silently; the curated block keeps its positions, so
# historical BENCH_r{N} comparisons stay aligned.  Set
# SPARK_GRAFT_BENCH_HEADLINE_ONLY=1 to time only the curated list.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    bench_names = list(HEADLINE)
    if os.environ.get("SPARK_GRAFT_BENCH_HEADLINE_ONLY") != "1":
        bench_names += [q for q in registry if q not in set(HEADLINE)]
    failed: str | None = None
    error: str | None = None
    times: dict[str, float] = {}
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_RUNS", "5"))
    try:
        for name in bench_names:
            fn = registry[name].fn
            spark.catalog.clearCache()
            fn(spark, sf_dir).count()  # warmup: codegen/JIT/footers, untimed
            samples = []
            while True:
                spark.catalog.clearCache()  # recompute persisted stages
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
                # adaptive: past the base runs, keep sampling only while
                # the observed spread could still move the median >20%
                if len(samples) >= runs and (
                        len(samples) >= max_runs
                        or max(samples) <= 1.2 * min(samples)):
                    break
            times[name] = round(statistics.median(samples), 3)
    except Exception as exc:  # a failed run must still yield partial timings
        failed = name
        error = f"{type(exc).__name__}: {exc}"[:500]

    out = {
        "metric": "suite_seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # provenance: which harness produced this run (VERDICT r7 #4) —
        # the external driver leaves the env unset; builder-side runs
        # set SPARK_GRAFT_BENCH_LABEL=builder-uncontended so
        # round-over-round comparisons stay same-harness
        "harness": os.environ.get("SPARK_GRAFT_BENCH_LABEL",
                                  "driver-or-unlabeled"),
    }
    if failed is not None:
        out["failed_query"] = failed
        out["error"] = error

    # The driver records only the LAST 2000 chars of stdout and
    # json.loads them (BENCH_r{1,3} parsed, r{2,4,5} did not once the
    # suite outgrew the window).  Persist the full per-query map as a
    # committed artifact, and make the FINAL stdout line a compact JSON
    # that always fits: suite metric + the slowest queries that fit the
    # window, with a pointer to the full detail.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(out), file=sys.stderr)  # full line for local diffing
    compact = dict(out)
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    head: dict[str, float] = {}
    for k, v in slowest.items():
        head[k] = v
        if len(json.dumps(head)) > 1300:
            head.pop(k)
            break
    compact["queries"] = head
    compact["n_queries"] = len(times)
    compact["detail"] = "BENCH_DETAIL.json"
    print(json.dumps(compact, separators=(",", ":")))
    if failed is not None:
        sys.exit(1)


if __name__ == "__main__":
    main()
