"""Every registry query vs its DuckDB oracle, at sf0.001 (fast) — the
local mirror of the driver's CORRECTNESS gate.  test_oracle_parity_sf001
runs per-query so a failure names the query.
"""

from __future__ import annotations

import pytest

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duckdb_connect

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity_sf001(spark, con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_SMOKE)
    if spec.sql is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    compare(df, con, spec.sql, name)


def test_queries_nonempty(spark):
    """Thresholded queries must actually emit rows at smoke scale —
    an always-empty detector would vacuously 'match' its oracle."""
    must_emit = [
        "error_rate_sliding", "error_rate_tumbling", "latency_p95_daily",
        "escalations_every_third", "alert_metrics_daily",
        "dedup_exact", "knn_bruteforce", "token_counts", "media_summary",
        "decontamination", "repetition_filters", "near_dup_survivors",
        "boilerplate_fraction", "dup_graph_degrees", "temperature_mixture",
    ]
    for name in must_emit:
        df = QUERIES[name].fn(spark, SF_SMOKE)
        assert df.count() > 0, f"{name} returned no rows at sf0.001"
