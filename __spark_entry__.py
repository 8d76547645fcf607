"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``realtime_log_analytics_flink_kafka_spark``
package; this module only adapts its query registry to the driver API.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_log_analytics_flink_kafka_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's sliding-window error-rate spike
    detector (flink/error_rate_detector.py) as a batch query over the
    events fixture."""
    from realtime_log_analytics_flink_kafka_spark.queries.reference import (
        q_error_rate_sliding,
    )
    return q_error_rate_sliding(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {
        name: spec.sql
        for name, spec in all_queries().items()
        if spec.sql is not None
    }
