"""Physical-plan inspection helpers.

The scale contract for every operator in this engine is checked, not
assumed: filters reach the parquet scan (row-group pruning), projections
prune the read schema, dimension joins broadcast, and no row-at-a-time
Python appears in a hot path.  tests/test_plans.py asserts these
properties over the query registry, so a regression that, say, un-pushes
a filter fails CI even though results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    return [m.group(1) for m in
            re.finditer(r"PushedFilters: \[([^\]]*)\]", plan) if m.group(1)]


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — the column-pruning witness."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or \
        "BroadcastNestedLoopJoin" in formatted_plan(df)


def node_count(df: DataFrame, node: str) -> int:
    """Occurrences of a physical operator in the formatted plan (counted
    on the numbered detail lines, once per node instance)."""
    return len(re.findall(rf"\(\d+\) {node}\b", formatted_plan(df)))


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-execution operators in the plan (empty = fully JVM-side).

    BatchEvalPython = row-at-a-time UDF (the slow path we ban);
    ArrowEvalPython / FlatMapGroupsInPandas etc. are the sanctioned
    vectorized escape hatches and are reported so tests can whitelist
    them explicitly where intended.
    """
    plan = formatted_plan(df)
    return re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas\w*|"
        r"MapInPandas|FlatMapCoGroupsInPandas)\b", plan)
