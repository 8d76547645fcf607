"""Driver-scale (sf0.01) oracle parity for the WHOLE registry.

The r3 hash failures (curation_report, unigram_surprisal) shipped because
the local mirror ran only at sf0.001 — the boundary documents that flip a
cross-engine round simply don't exist at smoke scale (VERDICT r3 §wrong).
This suite re-runs the EXACT configuration the driver checks — same scale
factor, value-exact compare — over every registry query, not just the
front-50 the driver's window reaches, so evidence never goes stale for
the tail either.

Slow (a few minutes on local[32]) — excluded from the default run by
pytest.ini; run `python -m pytest -m sf01 -q` before handing off a round.
"""

from __future__ import annotations

import pytest

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_connect

ALL_QUERIES = list(all_queries().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.sf01
@pytest.mark.parametrize("name,spec", ALL_QUERIES, ids=[n for n, _ in ALL_QUERIES])
def test_oracle_parity_sf01(spark, con, name, spec):
    df = spec.fn(spark, SF_ORACLE)
    if spec.sql is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    compare(df, con, spec.sql, name)
