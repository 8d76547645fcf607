"""Scale-adaptive physical-layout helpers.

Every operator in this package is written for 100 TB inputs, where a
parquet scan yields thousands of splits and scan-stage expressions
(tokenize / shingle / md5 / payload decode) run wide by construction.
On small inputs the same plan degenerates: a one-file, one-row-group
table scans as a SINGLE task, so exactly the per-row work that
dominates those operators runs serially while the rest of the machine
idles.  The optimization guide's partitioning rule (§2) is that
parallelism must be derived from the input, not hard-coded for either
end of the scale — this module is that derivation.

Determinism: round-robin ``repartition(n)`` sorts rows within each
input partition before assignment (``spark.sql.execution.
sortBeforeRepartition``, on by default since SPARK-23207), so the
row-to-partition mapping is stable across retries; and every operator
in this package is partition-order independent (sorted float folds,
order-free integer aggregates — the dual-engine oracle discipline), so
results are unchanged under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def par_build(*thunks):
    """Build independent query legs from driver threads (optimization
    guide §2.6: actions are only sequential because driver code calls
    them sequentially).  Operators that materialize eagerly
    (localCheckpoint barriers, convergence-probe actions) serialize one
    leg behind another when built inline; building each leg in its own
    thread lets their jobs interleave, so one leg's stage tail
    back-fills the cores the other leg is not using.  Returns the
    thunks' results in order; exceptions propagate."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


#: Logical nodes whose presence means the input is NOT a narrow chain
#: over a scan.  Two reasons to bail: (a) such inputs are already wide
#: (their parallelism came from a shuffle, not the scan split count);
#: (b) probing ``df.rdd`` under AQE EXECUTES the upstream query stages
#: eagerly — safe and job-free only on an exchange-free plan.
_BARRIER_NODES = ("Join", "Aggregate", "Window", "Sort", "Repartition",
                  "Deduplicate", "GlobalLimit", "LogicalRDD", "Generate",
                  "MapInPandas", "MapInArrow", "FlatMap", "CoGroup",
                  "Union", "Expand")


def _is_narrow_over_scan(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return not any(node in plan for node in _BARRIER_NODES)


def fan_out(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to the session's default parallelism before
    expensive per-row work; identity when the input is already at least
    that wide (any real-scale scan — the branch is decided from the
    actual scan partitioning, never a constant, so at 100 TB this is
    dead code and no extra exchange is ever planned).  Inputs that are
    not a narrow project/filter chain over a scan pass through
    untouched: they are post-shuffle (already wide) and probing their
    partitioning would execute them.  Streaming inputs also pass
    through untouched (stream-polymorphism contract of the text
    operators: a micro-batch's parallelism is the source's), and the
    batch QueryExecution probe would reject them anyway."""
    if df.isStreaming or not _is_narrow_over_scan(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
