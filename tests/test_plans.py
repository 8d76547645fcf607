"""Plan-quality gates: the 100 TB design properties, asserted.

Correctness tests can't see a filter that silently stopped pushing down
or a dimension join that fell back to shuffle — these can.
"""

from __future__ import annotations

from realtime_log_analytics_flink_kafka_spark.plans import (
    formatted_plan, has_broadcast_join, pushed_filters, python_eval_nodes,
    scan_read_schemas,
)
from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()


def test_no_python_in_any_registry_query(spark):
    """Every registry operator is pure Catalyst — no Python eval nodes at
    all (Pandas-UDF paths like the multimodal decoder are deliberately
    outside the registry)."""
    offenders = {}
    for name, spec in QUERIES.items():
        nodes = python_eval_nodes(spec.fn(spark, SF_SMOKE))
        if nodes:
            offenders[name] = nodes
    assert not offenders, f"Python in hot path: {offenders}"


def test_pricing_summary_pushdown_and_partial_agg(spark):
    df = QUERIES["pricing_summary"].fn(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert any("l_shipdate" in f for f in pushed_filters(df)), \
        "shipdate filter must reach the parquet scan"
    # Catalyst generates map-side partial aggregation automatically —
    # the property ErrorRateAgg.merge hand-codes in the reference
    assert plan.count("HashAggregate") >= 2


def test_column_pruning_token_counts(spark):
    schemas = scan_read_schemas(QUERIES["token_counts"].fn(spark, SF_SMOKE))
    assert schemas, "expected a file scan"
    for s in schemas:
        assert "text" in s and "doc_id" in s
        assert "source" not in s and "lang" not in s, \
            f"unused columns not pruned from scan: {s}"


def test_dimension_joins_broadcast(spark):
    for name in ("shipping_priority", "regional_revenue"):
        assert has_broadcast_join(QUERIES[name].fn(spark, SF_SMOKE)), \
            f"{name}: dimension join should broadcast"


def test_detector_filters_pushed(spark):
    # event_type/user_id projections come from the same scan; the filter
    # on is_error is post-aggregation (HAVING) so only check pruning
    schemas = scan_read_schemas(QUERIES["error_rate_sliding"].fn(spark, SF_SMOKE))
    for s in schemas:
        assert "props" not in s, f"props must be pruned from the log scan: {s}"


def test_semi_anti_join_strategies(spark):
    plan_anti = formatted_plan(QUERIES["customers_without_orders"].fn(spark, SF_SMOKE))
    plan_semi = formatted_plan(QUERIES["suppliers_with_shipments"].fn(spark, SF_SMOKE))
    assert "LeftAnti" in plan_anti
    assert "LeftSemi" in plan_semi
    assert any("l_quantity" in f for f in
               pushed_filters(QUERIES["suppliers_with_shipments"].fn(spark, SF_SMOKE)))
