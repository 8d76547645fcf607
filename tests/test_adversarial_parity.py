"""Adversarial-unicode parity suite (VERDICT r4, next-round #2).

Rounds 3 and 4 both shipped token queries that were value-exact on the
local fixtures yet failed the driver's hash: the fixtures were ASCII, the
driver's corpus was not, and the engine-native tokenization primitives
(Java ``\\s`` vs RE2 ``\\s`` on U+000B; JVM ``lower('İ')`` vs utf8proc)
diverge only on characters the fixtures lacked.  This suite closes that
evidence gap: every registry query that reads ``documents`` runs against
a generated corpus stuffed with exactly the divergent classes —

- U+000B (the Java-vs-RE2 ``\\s`` split), U+0085 NEL, NBSP, U+2028/29,
  U+3000 (consistently NON-separator on both engines — must stay so);
- İ/ı (U+0130/U+0131), ß, Σ with final-sigma context, the ﬃ ligature
  (full-vs-simple case mapping divergences);
- combining marks, astral emoji + ZWJ sequences;
- empty / whitespace-only / all-punctuation documents;
- exact duplicates differing only in whitespace flavor (incl. U+000B),
  near-duplicates, and a shared >=SEGMENT_TOKENS boilerplate suffix —
  so the dedup/segment pipelines have real work, not vacuous matches.

With the textnorm primitives (explicit separator class + ASCII-only
``translate`` lowercase) every comparison must be value-exact; with the
old ``lower()``/``\\s`` primitives this suite fails, reproducing the
driver's r4 failures locally (see test_textnorm_reproduces_divergence).
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from realtime_log_analytics_flink_kafka_spark.schemas import TESTDATA_TABLES
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_connect

BOILER = ("subscribe to our newsletter for updates terms of service apply "
          "all rights reserved")  # 14 tokens >= SEGMENT_TOKENS, df >= 2

NASTY_TEXTS = [
    # the confirmed cross-engine divergence drivers
    "alpha\x0bbeta gamma\x0b delta value",          # U+000B mid/inter-token
    "alpha beta gamma delta value",                  # its \x0B-free twin
    "İstanbul DİYARBAKIR izmir ANKARA city",        # U+0130 full-casing
    "ısparta ankara IZMIR istanbul city",            # dotless ı
    "STRASSE straße weiss WEISS gross",              # ß
    "ΣΟΦΟΣ ΑΣ σοφος τελος ΤΕΛΟΣ",                  # final-sigma context
    "oﬃce ﬃ OFFICE office ligature",                # U+FB03
    "cafe\u0301 CAFE\u0301 cafe latte menu",         # combining acute
    "nb\u00a0sp and\u0085nel and\u2028ls and\u2029ps and\u3000ideo",
    "emoji 😀 test 🌍 family 👨\u200d👩\u200d👧 done",
    "",                                              # empty doc
    " \t \x0b \r\n ",                                # whitespace-only
    "!!! ??? *** ;;; ,,,",                           # all-punctuation
    "a" * 300 + " b",                                # one huge token
    "the the the the the the the the the the the the",  # repetition
    # intra-doc repeated 8-token paragraph (× 3) — exercises
    # intra_doc_dedup's drop path, which the backbone (corpus-level
    # duplicates only) never does
    ("alpha bravo charlie delta echo foxtrot golf hotel " * 3
     + "india juliet kilo lima mike november oscar papa"),
]

# corpus backbone: overlapping ASCII docs so shingle/minhash/tfidf/bm25
# pipelines produce real pairs, plus duplicate/near-duplicate families
BACKBONE = [
    "the quick brown fox jumps over the lazy dog near the river bank " + BOILER,
    "the quick brown fox jumps over the lazy dog near the river bend " + BOILER,
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG NEAR THE RIVER BANK " + BOILER,
    "the quick\x0bbrown fox jumps over the lazy dog near the river bank " + BOILER,
    "a slow green turtle walks under the busy bridge by the river bank",
    "a slow green turtle walks under the busy bridge by the river bank",
    "data pipeline quality filter token count dedup shard sample pack",
    "data pipeline quality filter token count dedup shard sample batch",
    "log error warn info debug trace fatal error warn info debug trace",
    "user clicked checkout page then payment failed with timeout error",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf_adversarial")
    texts: list[str] = []
    for i in range(3):  # cycle so every source has >1 doc
        texts += BACKBONE
    texts += NASTY_TEXTS
    langs = ["en", "es", "de", "fr", "zh"]
    sources = [f"src{i % 3}" for i in range(len(texts))]
    # srcNEG: a source whose SUM of quality scores is negative — every doc
    # is punctuation-heavy so q_e4 < 0 per doc.  Reproduces the r5 driver
    # red on curation_report (sign-blind exact_round_div_sql on a negative
    # numerator: DuckDB -0.1757 vs Spark -0.1758 before the r6 fix).
    neg_docs = [f"!!! ??? *** ;;; ,,, ### $$$ %%% @@@ ^^^ n{i}"
                for i in range(30)]
    texts += neg_docs
    sources += ["srcNEG"] * len(neg_docs)
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([langs[i % len(langs)] for i in range(len(texts))]),
        "source": pa.array(sources),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, d / "documents.parquet")
    for t in TESTDATA_TABLES:
        if t != "documents":
            shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", d / f"{t}.parquet")
    return str(d)


QUERIES = all_queries()
DOC_QUERIES = sorted(n for n, s in QUERIES.items()
                     if s.sql is not None and "documents" in s.sql)


@pytest.fixture(scope="module")
def adv_con(adv_dir):
    c = duckdb_connect(adv_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_parity(spark, adv_con, adv_dir, name):
    spec = QUERIES[name]
    compare(spec.fn(spark, adv_dir), adv_con, spec.sql, name)


def test_textnorm_reproduces_divergence(spark, adv_con):
    """Documents the bug this suite exists to catch: the engine-native
    primitives (pre-r5 tokenization) DIVERGE on this corpus, the textnorm
    primitives agree.  If an engine upgrade ever makes this assertion
    fail, the textnorm layer can be retired."""
    import duckdb
    from pyspark.sql import functions as F

    rows = spark.range(1).select(
        F.size(F.split(F.lit("a\x0bb c"), r"\s+")).alias("native_n"),
        F.lower(F.lit("İ")).alias("native_lower"),
    ).first()
    d_n = duckdb.sql(
        r"select len(regexp_split_to_array('a' || chr(11) || 'b c', '\s+')),"
        " lower('İ')").fetchone()
    assert rows["native_n"] != d_n[0] or rows["native_lower"] != d_n[1], (
        "engine-native \\s/lower now agree — textnorm layer may be retirable")
