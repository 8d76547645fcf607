"""Registry-wide oracle output-TYPE gate (VERDICT r5, next-round #2/#3).

Root cause of four rounds of driver-red on ``curation_report`` /
``unigram_surprisal`` / ``segment_dedup`` (CORRECTNESS_r02..r05, hash-only,
rows+schema green): DuckDB's ``sum()`` over any integer type returns
**HUGEINT**, and exactly those three oracle twins — and no other of the
138 — left an integer ``sum()`` uncast in the final projection.  The
local harness canonicalizes through Python ``int`` (HUGEINT and BIGINT
both arrive as ``int``), so local compare was value-exact forever while a
type-sensitive driver hash (anything that goes through Arrow/pandas,
where HUGEINT maps to float64/object instead of int64) diverged on the
same values.  This also explains why float-free ``segment_dedup`` failed
every rounding-class hypothesis: the divergence was never in the values.

This gate bans the categorically-skewed DuckDB output types from every
oracle's final projection.  Int-WIDTH skew (INTEGER vs BIGINT) and
timestamp-zone flavor are deliberately tolerated: driver-green rounds
prove the driver hash normalizes them (``doc_chunks`` int-vs-BIGINT and
``top_revenue_orders`` TIMESTAMP-vs-timestamp_ntz were green in r5 /
earlier), and they arrive as int64/datetime64 either way.

DuckDB binding only (no execution, no Spark) — the whole registry checks
in seconds.
"""

from __future__ import annotations

import pytest

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_harness import duckdb_connect

#: DuckDB result types with no faithful int64/float64/utf8 Arrow-pandas
#: mapping — any of these in a final projection can hash differently on
#: the driver even when every value is equal.
BANNED = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
          "UTINYINT", "DECIMAL")

SQL_QUERIES = sorted(n for n, s in all_queries().items() if s.sql is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_no_banned_oracle_output_types(con, name):
    spec = all_queries()[name]
    rel = con.sql(spec.sql)
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if any(str(t).startswith(b) for b in BANNED)]
    assert not bad, (
        f"{name}: oracle emits driver-hash-unsafe DuckDB types {bad}; "
        "CAST integer aggregates to BIGINT in the final projection "
        "(DuckDB sum() over integers returns HUGEINT)")
