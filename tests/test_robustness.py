"""Degenerate-input robustness: every registry query must plan and run
against completely empty tables (schema-faithful empty parquet, including
the events table's timestamp[ns] physical type).

At 100 TB this is not a corner case — partition-pruned scans, fresh
date partitions, and filtered side-inputs routinely produce zero-row
subtrees, and an operator that throws on them (empty-aggregate NULLs,
argmax over nothing, division guards) takes the whole job down.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Empty twin of the smoke fixture: same file names, same Arrow
    schemas (pyarrow, not a SQL LIMIT 0 copy — that would rewrite
    timestamp[ns] as timestamp[us] and dodge the nanosAsLong path)."""
    tmp = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet"):
            schema = pq.read_schema(os.path.join(SF_SMOKE, f))
            pq.write_table(schema.empty_table(), str(tmp / f))
    return str(tmp)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    # no-crash is the contract; row count varies (generator-backed
    # queries like synthetic_log_profile emit rows with no input files)
    assert QUERIES[name].fn(spark, empty_sf_dir).count() >= 0


def test_text_operators_on_degenerate_docs(spark):
    """NULL-text, empty-text, and whitespace-only documents must flow
    through the text operators (ANSI mode makes an unguarded x/0 a
    job-killing exception): ratios come back NULL, nothing raises."""
    from realtime_log_analytics_flink_kafka_spark.operators import (
        decontam, dedup, text,
    )

    docs = spark.createDataFrame(
        [(1, None, "en", "s", 0), (2, "", "en", "s", 0),
         (3, "   ", "en", "s", 3), (4, "hello world foo bar", "en", "s", 19)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    q = {r.doc_id: r for r in text.quality_scores(docs).collect()}
    assert q[2].n_tokens == 0 and q[2].quality_score is None
    assert q[3].quality_score is None  # whitespace-only: 0 tokens
    assert q[4].quality_score is not None
    assert text.repetition_metrics(docs).count() == 1   # only doc 4 has grams
    assert text.language_id(docs).count() == 4
    assert text.fingerprints(docs).count() == 4
    assert dedup.exact_duplicates(docs).count() >= 1
    assert dedup.minhash_lsh_pairs(docs).count() == 0
    assert decontam.ngram_contamination(docs, docs.limit(1)).count() == 1
    # round-3 ops: NULL/empty/whitespace docs contribute nothing, never raise
    bi = {r.doc_id: r for r in text.bigram_surprisal(docs).collect()}
    assert set(bi) == {4} and bi[4].n_bigrams == 3
    assert text.ngram_spans(docs, 3).count() == 2   # only doc 4 (4 tokens)


def test_similarity_operators_on_zero_vectors(spark):
    """An all-zero embedding (padding row, failed encoder) must not abort
    the job: cosine against it is NULL, so it is never retrieved and
    never pairs."""
    from realtime_log_analytics_flink_kafka_spark.operators import similarity as S

    vecs = spark.createDataFrame(
        [(0, [0.0] * 8, "a"), (1, [1.0] * 8, "a"),
         (2, [2.0] * 8, "b"), (3, [0.5] * 8, "b")],
        "vec_id long, embedding array<float>, label string")
    topk = S.cosine_topk(vecs, vecs.filter("vec_id < 2"), k=3).collect()
    assert all(r.corpus_id != 0 for r in topk)      # zero vec never retrieved
    assert not [r for r in topk if r.query_id == 0]  # zero query finds nothing
    assert S.lsh_near_dup_pairs(vecs).where(
        "id_a = 0 OR id_b = 0").count() == 0
    assert S.clustered_near_dup_pairs(vecs, centroid_every=2).where(
        "id_a = 0 OR id_b = 0").count() == 0
    assert S.quantization_error(vecs).count() == 4
