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


#: Logical node names that make up a NARROW chain over a scan: bare
#: projections/filters directly over a file-source relation.  Anything
#: else — joins, aggregates, windows, generators, Python nodes,
#: repartitions, RDD scans, …  — means the input either is already wide
#: (its parallelism came from a shuffle, not the scan split count) or
#: must not be probed at all: probing ``df.rdd`` under AQE EXECUTES the
#: upstream query stages eagerly, so only exchange-free plans are safe
#: to probe.  ADVICE r12 #1: this is a WHITELIST on ``nodeName()``
#: (exact node classes), replacing the r12 substring blacklist over the
#: full plan string — that match also saw column aliases and relation
#: paths (a capitalized 'Sort' in a path silently disabled fan_out),
#: and any shuffle-inducing node missing from the blacklist would have
#: let the probe execute upstream stages.  The whitelist fails CLOSED:
#: an unlisted node family is treated as not-narrow and passes through
#: untouched, which can only ever cost a missed optimization.
_NARROW_NODES = frozenset((
    "Project", "Filter", "LogicalRelation", "Relation",
    "DataSourceV2Relation", "DataSourceV2ScanRelation",
    "LocalRelation", "OneRowRelation",
))


def _is_narrow_over_scan(df: DataFrame) -> bool:
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() not in _NARROW_NODES:
            return False
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return True


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
