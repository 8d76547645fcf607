"""Dump ``explain("formatted")`` for registry queries to plans/r12/.

Usage: python tools/plan_dump.py <suffix> <query> [<query> ...]
Writes /root/repo/plans/r12/<query>_<suffix>.txt (suffix: before/after).
Plan capture only — no job is executed beyond planning.
"""
import os
import sys

from realtime_log_analytics_flink_kafka_spark.plans.inspect import (
    formatted_plan,
)
from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from realtime_log_analytics_flink_kafka_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r12")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print("wrote", path)


if __name__ == "__main__":
    main()
