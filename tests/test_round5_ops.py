"""Round-5 composed ops: leakage-safe train/val split.

Cross-engine value parity is covered by the parametrized oracle sweeps
(test_oracle_parity / test_adversarial_parity — the query's SQL touches
``documents`` so it auto-enrolls in both).  These tests pin the SEMANTIC
invariants the summary can't be trusted without.
"""

from __future__ import annotations

from realtime_log_analytics_flink_kafka_spark.operators import dedup
from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from realtime_log_analytics_flink_kafka_spark.queries.pipeline import (
    MINHASH_THRESHOLD, _SPLIT_KNUTH, _SPLIT_PRIME, _SPLIT_TRAIN_PCT, _docs)
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def _bucket(group_id: int) -> int:
    return ((group_id % _SPLIT_PRIME) * _SPLIT_KNUTH) % _SPLIT_PRIME % 100


def test_leakage_safe_split_invariants(spark):
    rows = {r["split"]: r for r in
            QUERIES["leakage_safe_split"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "val"}
    total_docs = _docs(spark, SF_SMOKE).count()
    assert sum(r["n_docs"] for r in rows.values()) == total_docs
    for r in rows.values():
        assert r["leaky_groups"] == 0
        assert 0 <= r["n_clustered_docs"] <= r["n_docs"]
        assert r["n_groups"] <= r["n_docs"]
    # the train share should be in the neighbourhood of the 90% target
    train_share = rows["train"]["n_docs"] / total_docs
    assert 0.75 <= train_share <= 0.98


def test_split_never_separates_a_near_dup_pair(spark):
    """The construction guarantee, checked against the pair graph itself
    (not the query's own straddle counter): every MinHash-LSH pair maps
    to one group id, and the split is a pure function of group id."""
    docs = _docs(spark, SF_SMOKE)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=MINHASH_THRESHOLD)
    comp = {r["doc_id"]: r["cluster_id"]
            for r in dedup.duplicate_components(pairs).collect()}
    assert comp, "smoke fixture must contain near-dup pairs"
    for doc_a, doc_b in ((r["doc_a"], r["doc_b"]) for r in pairs.collect()):
        ga, gb = comp[doc_a], comp[doc_b]
        assert ga == gb
        assert _bucket(ga) == _bucket(gb)


def test_split_bucket_distribution():
    """The Knuth multiplicative bucket spreads sequential ids close to
    the 90/10 target (sequential doc ids are exactly the unclustered
    group ids at ingest time), and never overflows 63-bit arithmetic."""
    n = 100_000
    train = sum(1 for g in range(n) if _bucket(g) < _SPLIT_TRAIN_PCT)
    assert abs(train / n - _SPLIT_TRAIN_PCT / 100) < 0.01
    assert (_SPLIT_PRIME - 1) * _SPLIT_KNUTH < 2 ** 63
