"""Round-5 composed ops: leakage-safe train/val split, token entropy,
Heaps'-law vocabulary-growth fit.

Cross-engine value parity is covered by the parametrized oracle sweeps
(test_oracle_parity / test_adversarial_parity — the query's SQL touches
``documents`` so it auto-enrolls in both).  These tests pin the SEMANTIC
invariants the summary can't be trusted without.
"""

from __future__ import annotations

import math

from realtime_log_analytics_flink_kafka_spark.operators import dedup, text
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


def _doc_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_token_entropy_planted(spark):
    df = _doc_df(spark, [
        (0, "s", "a a a a"),          # degenerate: H = 0
        (1, "s", "a b c d"),          # uniform distinct: H = ln(4)
        (2, "s", "a a b b"),          # two symbols, even: H = ln(2)
        (3, "s", ""),                 # zero tokens: absent
    ])
    rows = {r["doc_id"]: r for r in text.token_entropy(df).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["entropy"] == 0.0
    assert abs(rows[1]["entropy"] - math.log(4)) < 1e-12
    assert abs(rows[2]["entropy"] - math.log(2)) < 1e-12
    assert (rows[1]["n_tokens"], rows[1]["n_distinct"]) == (4, 4)
    assert (rows[2]["n_tokens"], rows[2]["n_distinct"]) == (4, 2)


def test_token_entropy_bounds_on_fixture(spark):
    """0 <= H <= ln(n_distinct) (uniform maximizes entropy) on real data."""
    out = text.token_entropy(_docs(spark, SF_SMOKE)).collect()
    assert out
    for r in out:
        assert -1e-12 <= r["entropy"] <= math.log(r["n_distinct"]) + 1e-9


def test_heaps_law_fit_planted(spark):
    # closed vocabulary: every doc the same token -> V constant 1,
    # y = ln(1) = 0 at every checkpoint -> beta == 0 exactly
    closed = _doc_df(spark, [(i, "closed", "tok tok tok") for i in range(8)])
    # open vocabulary: every doc introduces 3 brand-new terms -> V grows
    # linearly with N -> beta near 1
    open_ = _doc_df(spark, [
        (i, "open", f"w{3 * i} w{3 * i + 1} w{3 * i + 2}") for i in range(8)])
    rows = {r["source"]: r
            for r in text.heaps_law_fit(closed.union(open_)).collect()}
    assert rows["closed"]["beta"] == 0.0
    assert rows["open"]["beta"] > 0.95
    # 8 docs -> prefix checkpoints at doc_id+1 <= {1, 2, 4, 8}
    assert rows["closed"]["n_points"] == 4
    assert rows["open"]["r2"] > 0.99


def test_heaps_law_fit_fixture_sane(spark):
    out = {r["source"]: r
           for r in text.heaps_law_fit(_docs(spark, SF_SMOKE)).collect()}
    assert out
    fitted = [r for r in out.values() if r["beta"] is not None]
    # degenerate sources (one checkpoint -> den1 = 0) emit NULL, not junk
    assert fitted
    for r in fitted:
        # vocabulary can only grow sublinearly-or-linearly: 0 <= beta <= 1
        assert -1e-9 <= r["beta"] <= 1 + 1e-9
        assert r["r2"] is None or 0.0 <= r["r2"] <= 1 + 1e-9


def test_prefix_jaccard_matches_bruteforce(spark):
    """Prefix filtering is an OPTIMIZATION with a completeness proof —
    the output must equal the brute-force all-pairs exact Jaccard at the
    threshold, computed here independently from the same shingle sets
    (exact rational compare, no rounding)."""
    from fractions import Fraction

    docs = _docs(spark, SF_SMOKE)
    sets: dict[int, set[int]] = {}
    for r in dedup.shingle_hashes(docs).distinct().collect():
        sets.setdefault(r["doc_id"], set()).add(r["h"])
    t = Fraction(1, 5)
    expected = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and Fraction(inter, uni) >= t:
                expected.add((a, b))
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["uni"])
           for r in dedup.prefix_jaccard_pairs(docs).collect()}
    assert set(got) == expected
    assert expected, "smoke fixture must contain at least one pair"
    for (a, b), (inter, uni) in got.items():
        assert inter == len(sets[a] & sets[b])
        assert uni == len(sets[a] | sets[b])


def test_signal_correlations_planted(spark, tmp_path):
    """Perfect positive/negative correlation on planted data: quality
    rises (falls) monotonically-linearly with length in src_pos
    (src_neg) via token count, and |r| is exactly 1 for the linear
    pair."""
    import pyspark.sql.functions as F
    from realtime_log_analytics_flink_kafka_spark.queries import all_queries

    # docs whose TOKEN COUNT is linear in doc_id: entropy/quality move
    # with length deterministically.  Write as parquet so the query fn
    # (which loads documents.parquet) can run unchanged.
    rows = []
    for i in range(12):
        # all-distinct tokens: entropy = ln(n), n = 5 + i
        toks = " ".join(f"w{i}x{j}" for j in range(5 + i))
        rows.append((i, toks, "en", "src_lin", len(toks)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    d = tmp_path / "planted"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    out = {r["source"]: r for r in
           all_queries()["signal_correlations"].fn(spark, str(d)).collect()}
    r = out["src_lin"]
    assert r["n_docs"] == 12
    # entropy = ln(n) and length = n: strictly monotone pairing in a
    # single source -> strong positive correlation for every pair
    assert r["r_entropy_length"] > 0.97
    assert -1 - 1e-9 <= r["r_quality_entropy"] <= 1 + 1e-9
    assert -1 - 1e-9 <= r["r_quality_length"] <= 1 + 1e-9
