"""Dump ``explain("formatted")`` for registry queries to plans/<dir>/.

Usage: python tools/plan_dump.py <suffix> <query> [<query> ...]
Writes /root/repo/plans/$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt
(suffix: before/after; dir defaults to r13).

Cost note (ADVICE r12 #2): since r12 the dedup/sketch query builders run
eager localCheckpoint jobs (and par_build legs) at DataFrame-CONSTRUCTION
time, so dumping those plans executes the heavy upstream pipelines — the
dump is no longer planning-only and takes seconds per query at sf0.1.
The dumped plan is correspondingly the POST-barrier plan (RDD scans where
the checkpoints sit), which is exactly what the committed before/after
artifacts are meant to show.
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
    os.path.abspath(__file__))), "plans",
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r13"))


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
