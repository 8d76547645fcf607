"""Advanced relational patterns (SURVEY §7.2 step 7 continued): as-of
joins, distinct aggregation, cube, and the salted-join skew pattern — the
operators a reference user hits right after the basics, each with the
scale rationale in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.batch import load_table
from . import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- as-of join: purchase attribution ---------------------------------------

def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the most recent prior 'view' by the same
    user (classic attribution as-of join).

    Spark has no native as-of join; instead of bucketing + pd.merge_asof
    (Python in the hot path) this is the interleave trick: one window per
    user ordered by event time, carrying the last view id forward with
    ignorenulls=last_value over a 1-preceding frame.  ONE shuffle on
    user_id, no join at all — strictly better than any join-based as-of
    at scale.
    """
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("event_id", "ts", "user_id", "event_type")
    )
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_view = F.col("event_type") == "view"
    attributed = ev.select(
        "*",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True).over(w)
            .alias("attributed_view_id"),
        F.last(F.when(is_view, F.col("ts")), ignorenulls=True).over(w)
            .alias("view_ts"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.unix_timestamp("ts").alias("purchase_ts"),
            "attributed_view_id",
            F.unix_timestamp("view_ts").alias("view_ts"),
            (F.unix_timestamp("ts") - F.unix_timestamp("view_ts"))
                .alias("gap_seconds"),
        )
    )


SQL_PURCHASE_ATTRIBUTION = """
WITH ev AS (
    SELECT event_id, ts, user_id, event_type FROM events
    WHERE event_type IN ('view', 'purchase')
),
attributed AS (
    SELECT *,
        last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS attributed_view_id,
        last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS view_ts
    FROM ev
)
SELECT user_id,
       event_id AS purchase_event_id,
       CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS purchase_ts,
       attributed_view_id,
       CAST(floor(epoch_us(view_ts) / 1000000) AS BIGINT) AS view_ts,
       CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
         - CAST(floor(epoch_us(view_ts) / 1000000) AS BIGINT) AS gap_seconds
FROM attributed WHERE event_type = 'purchase'
"""


# --- distinct aggregation ----------------------------------------------------

def q_segment_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact countDistinct per group.  At 100 TB the first reach is
    approx_count_distinct (HLL, no per-key distinct state) — kept as a
    separate rows-only query since DuckDB's sketch differs."""
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count("*").alias("n_customers"),
        )
    )


SQL_SEGMENT_DISTINCT_NATIONS = """
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       count(*) AS n_customers
FROM customer GROUP BY c_mktsegment
"""


def q_segment_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the bounded-state scale path.  No
    DuckDB oracle (different sketch); accuracy is unit-tested against the
    exact count instead (tests/test_operators.py)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
            F.count("*").alias("n_orders"),
        )
    )


# --- cube --------------------------------------------------------------------

def q_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(20,6)")).cast("double")
                .alias("sum_qty"),
        )
    )


SQL_CUBE_RETURNS = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- salted join (skew pattern) ----------------------------------------------

N_SALTS = 8


def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual skew-salting pattern: the build side (orders) is
    replicated N_SALTS ways, the probe side (lineitem) picks a
    deterministic salt, and the join key becomes (key, salt) — a hot
    orderkey's rows spread over N_SALTS reducers instead of one.

    Results are identical to the plain join (the oracle IS the plain
    join); AQE's skewJoin handles this automatically for sort-merge, but
    the explicit pattern is what you reach for when a single key
    dominates a stateful/streaming join where AQE can't help.

    The probe-side salt is a hash of the full row key, not a data column
    mod N: l_linenumber is 1..7, so ``l_linenumber % 8`` would never
    produce salt 0 (one replicated build row dead, a hot key spread over
    at most 7 reducers) and correlates the salt with the data.
    """
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "salt",
        F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(N_SALTS)).cast("int"))
    orders = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(N_SALTS)])))
    )
    joined = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt),
        "inner",
    )
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .cast("decimal(20,6)")).cast("double").alias("revenue"),
        )
    )


SQL_SALTED_JOIN_REVENUE = """
SELECT o_orderstatus, count(*) AS n_lineitems,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DOUBLE)
           AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


# --- approximate percentile (scale path for A3) ------------------------------

def q_latency_p95_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx variant of the exact p95 detector — bounded
    state per (key, window) for unbounded-cardinality windows.  Rows-only
    check (approximation is engine-specific); closeness to the exact p95
    is unit-tested."""
    from ..operators.detect import latency_p95
    from ..operators.logs import as_logs

    return latency_p95(as_logs(_t(spark, sf_dir, "events")),
                       size="1 day", approx=True)


def q_error_click_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: for every error event, the same user's clicks in
    the preceding hour — ``operators.joins.range_join`` (bucketed
    equi-join on (user_id, time-bucket), ≤2× left fan-out, exact-range
    post-filter) instead of the theta-join Spark would otherwise plan as
    a per-key nested loop."""
    from ..operators.joins import range_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        F.unix_micros(F.col("ts")).alias("e_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.unix_micros(F.col("ts")).alias("c_us"),
    )
    hour = 3_600_000_000  # microseconds
    return (
        range_join(errors, clicks, ["user_id"], "e_us", "c_us",
                   lower=-hour, upper=-1)
        .select(
            "user_id", "error_event_id", "click_event_id",
            (F.col("e_us") - F.col("c_us")).alias("lag_us"),
        )
    )


SQL_ERROR_CLICK_PAIRS = """
SELECT e.user_id,
       e.event_id AS error_event_id,
       c.event_id AS click_event_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS lag_us
FROM events e
JOIN events c
  ON c.user_id = e.user_id
 AND e.event_type = 'error'
 AND c.event_type = 'click'
 AND epoch_us(c.ts) BETWEEN epoch_us(e.ts) - 3600000000
                        AND epoch_us(e.ts) - 1
"""


QUERIES: dict[str, QuerySpec] = {
    "purchase_attribution": QuerySpec(q_purchase_attribution,
                                      SQL_PURCHASE_ATTRIBUTION),
    "error_click_pairs": QuerySpec(q_error_click_pairs,
                                   SQL_ERROR_CLICK_PAIRS),
    "segment_distinct_nations": QuerySpec(q_segment_distinct_nations,
                                          SQL_SEGMENT_DISTINCT_NATIONS),
    "segment_approx_distinct": QuerySpec(q_segment_approx_distinct, None),
    "cube_returns": QuerySpec(q_cube_returns, SQL_CUBE_RETURNS),
    "salted_join_revenue": QuerySpec(q_salted_join_revenue,
                                     SQL_SALTED_JOIN_REVENUE),
    "latency_p95_approx": QuerySpec(q_latency_p95_approx, None),
}
