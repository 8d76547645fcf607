"""Advanced relational patterns (SURVEY §7.2 step 7 continued): as-of
joins, distinct aggregation, cube, and the salted-join skew pattern — the
operators a reference user hits right after the basics, each with the
scale rationale in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.detmath import det_round, det_round_sql, exact_round_div, \
    exact_round_div_sql
from ..operators.detect import ANOMALY_Z
from ..operators.logs import LOGS_CTE
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


#: Tolerance for the general as-of join query, in whole seconds — applied
#: to the floored-to-seconds gap in BOTH dialects so sub-second boundary
#: cases cannot diverge between Spark and the oracle.
ASOF_TOLERANCE_S = 3600


def q_click_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general ``asof_join`` operator end-to-end: for each purchase,
    the user's most recent click at-or-before it, nulled when the click
    is older than an hour (tolerance).

    Contrast with ``purchase_attribution`` (the inline interleave for
    one hard-coded pair): this drives the reusable cross-table operator
    — two separate DataFrames in, left-outer semantics, inclusive ties.
    Tolerance is applied here on the floored-seconds gap rather than via
    the operator's native ``tolerance`` (which compares raw
    microseconds) purely for oracle precision parity; the native path is
    unit-tested.
    """
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id",
                                            "event_type")
    purchases = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    joined = asof_join(purchases, clicks, ["user_id"], "ts", "ts",
                       right_cols=["event_id"], prefix="click_")
    gap = F.unix_timestamp("ts") - F.unix_timestamp("click_ts")
    in_tol = gap <= ASOF_TOLERANCE_S
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.unix_timestamp("ts").alias("purchase_ts"),
        F.when(in_tol, F.col("click_event_id")).alias("click_event_id"),
        F.when(in_tol, F.unix_timestamp("click_ts")).alias("click_ts"),
        F.when(in_tol, gap).alias("gap_seconds"),
    )


SQL_CLICK_ATTRIBUTION_ASOF = f"""
WITH ev AS (
    SELECT event_id, ts, user_id, event_type FROM events
    WHERE event_type IN ('click', 'purchase')
),
interleaved AS (
    SELECT user_id, ts, event_id,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_left,
        CASE WHEN event_type = 'click' THEN event_id END AS c_id,
        CASE WHEN event_type = 'click' THEN ts END AS c_ts
    FROM ev
),
matched AS (
    SELECT *,
        last_value(c_id IGNORE NULLS) OVER w AS m_id,
        last_value(c_ts IGNORE NULLS) OVER w AS m_ts
    FROM interleaved
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_left, c_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
secs AS (
    SELECT user_id, event_id AS purchase_event_id,
        CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS purchase_ts,
        m_id,
        CAST(floor(epoch_us(m_ts) / 1000000) AS BIGINT) AS m_ts_s
    FROM matched WHERE is_left = 1
)
SELECT user_id, purchase_event_id, purchase_ts,
    CASE WHEN purchase_ts - m_ts_s <= {ASOF_TOLERANCE_S} THEN m_id
         END AS click_event_id,
    CASE WHEN purchase_ts - m_ts_s <= {ASOF_TOLERANCE_S} THEN m_ts_s
         END AS click_ts,
    CASE WHEN purchase_ts - m_ts_s <= {ASOF_TOLERANCE_S}
         THEN purchase_ts - m_ts_s END AS gap_seconds
FROM secs
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
    """HLL++ approximate distinct — the bounded-state scale path.

    DuckDB can't reproduce Spark's sketch value, so the query makes the
    approximation itself checkable: it co-computes the exact distinct
    count and emits ``approx_within_tol`` = |approx − exact| ≤ 2 % + 2.
    The oracle recomputes the exact side and asserts the flag is TRUE —
    a real accuracy gate on every group, not a rows-only count.  (The
    sketch value is deliberately not an output column: it is
    engine-specific by nature.)
    """
    g = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
            F.countDistinct("o_custkey").alias("exact_custs"),
            F.count("*").alias("n_orders"),
        )
    )
    tol = F.ceil(F.col("exact_custs") * 0.02) + 2
    return g.select(
        "o_orderstatus", "n_orders", "exact_custs",
        (F.abs(F.col("_approx") - F.col("exact_custs")) <= tol)
            .alias("approx_within_tol"),
    )


SQL_SEGMENT_APPROX_DISTINCT = """
SELECT o_orderstatus, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS exact_custs,
       TRUE AS approx_within_tol
FROM orders GROUP BY o_orderstatus
"""


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
    """percentile_approx variant of the exact p95 detector, made
    oracle-checkable via its rank-error contract.

    percentile_approx guarantees RANK error (≤ n/accuracy), not value
    error, so a % tolerance on the value is meaningless.  The registry
    variant therefore co-computes the exact order statistics ``delta``
    ranks either side of the nearest-rank-low p95 index and emits
    ``approx_in_bounds`` = lo ≤ approx ≤ hi; the oracle recomputes
    lo/hi exactly and asserts TRUE.  delta = max(2, ceil(n/1000)) covers
    the n/10000 default-accuracy error plus rank-convention off-by-ones.

    The exact bounds need a per-window collect_list, which the
    production scale path (``operators.detect.latency_p95(approx=True)``,
    plain percentile_approx with O(accuracy) state) does not — this
    query exists to prove that path's accuracy, and keeps the validation
    machinery out of the operator itself.
    """
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    grouped = (
        logs.groupBy("service", F.window("ts", "1 day").alias("window"))
        .agg(
            F.percentile_approx("latency_ms", 0.95).alias("_approx"),
            F.array_sort(F.collect_list("latency_ms")).alias("_sorted"),
            F.count("*").alias("total_logs"),
        )
    )
    n = F.size("_sorted")
    idx = F.floor(F.lit(0.95) * (n - 1)).cast("int")
    delta = F.greatest(F.lit(2), F.ceil(n / F.lit(1000)).cast("int"))
    lo = F.get("_sorted", F.greatest(idx - delta, F.lit(0)))
    hi = F.get("_sorted", F.least(idx + delta, n - 1))
    return grouped.select(
        "service",
        F.col("window.start").cast("long").alias("window_start"),
        F.col("window.end").cast("long").alias("window_end"),
        "total_logs",
        lo.alias("p95_rank_lo"),
        hi.alias("p95_rank_hi"),
        ((F.col("_approx") >= lo) & (F.col("_approx") <= hi))
            .alias("approx_in_bounds"),
    )


SQL_LATENCY_P95_APPROX = """
WITH {logs_cte},
s AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {day_us}) AS BIGINT) * {day} AS window_start,
           CAST(floor(epoch_us(ts) / {day_us}) AS BIGINT) * {day} + {day}
               AS window_end,
           count(*) AS total_logs,
           list_sort(list(latency_ms)) AS sorted
    FROM logs GROUP BY 1, 2, 3
),
b AS (
    SELECT *,
           CAST(floor(0.95 * (len(sorted) - 1)) AS INT) AS idx,
           greatest(2, CAST(ceil(len(sorted) / 1000.0) AS INT)) AS delta
    FROM s
)
SELECT service, window_start, window_end, total_logs,
       sorted[greatest(idx - delta, 0) + 1] AS p95_rank_lo,
       sorted[least(idx + delta, len(sorted) - 1) + 1] AS p95_rank_hi,
       TRUE AS approx_in_bounds
FROM b
"""

_DAY = 86400
SQL_LATENCY_P95_APPROX = SQL_LATENCY_P95_APPROX.format(
    logs_cte=LOGS_CTE, day_us=_DAY * 1_000_000, day=_DAY)


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


# --- ordered funnel conversion ----------------------------------------------

#: Funnel stages in required order; a user reaches stage i+1 only with an
#: event strictly after their stage-i completion time and within
#: FUNNEL_WINDOW_S seconds of it (the bound is what makes conversion
#: drop off — unbounded, any active user eventually completes).
FUNNEL_STAGES = ("signup", "view", "click", "purchase")
FUNNEL_WINDOW_S = 86400


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: how many users progress signup -> view -> click ->
    purchase, each stage completed strictly after the previous one.

    Staged min-after-min: stage 1 is min(ts) per user; stage i+1 is
    min(ts) of that type within (stage-i time, +1 day].  Every join and
    aggregation keys on user_id, so after the first shuffle the
    partitioning is reused down the whole chain (no re-exchange per
    stage), and per-stage state is one timestamp per user — no
    collect_list of event histories.  The final 4-row summary uses a
    single-partition window, which is fine because it runs on 4 rows,
    not on events.
    """
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .select("user_id", "event_type", "ts")
    )
    cur = (
        ev.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id").agg(F.min("ts").alias("t"))
    )
    reached = [cur]
    for stage in FUNNEL_STAGES[1:]:
        cur = (
            ev.filter(F.col("event_type") == stage)
            .join(cur.select("user_id", F.col("t").alias("prev_t")), "user_id")
            .filter((F.col("ts") > F.col("prev_t"))
                    & (F.col("ts") <= F.col("prev_t")
                       + F.expr(f"INTERVAL {FUNNEL_WINDOW_S} SECOND")))
            .groupBy("user_id").agg(F.min("ts").alias("t"))
        )
        reached.append(cur)

    tagged = None
    for i, (stage, df) in enumerate(zip(FUNNEL_STAGES, reached)):
        part = df.select(
            F.lit(i + 1).alias("stage"),
            F.lit(stage).alias("event_type"),
            "user_id",
        )
        tagged = part if tagged is None else tagged.unionAll(part)
    counts = tagged.groupBy("stage", "event_type").agg(
        F.count("*").alias("n_users"))
    w = Window.orderBy("stage")
    return counts.select(
        "stage", "event_type", "n_users",
        exact_round_div(F.col("n_users"), F.first("n_users").over(w))
            .alias("conversion"),
    )


def _funnel_sql() -> str:
    stages = FUNNEL_STAGES
    ctes = [f"""
s1 AS (
    SELECT user_id, min(ts) AS t FROM ev
    WHERE event_type = '{stages[0]}' GROUP BY user_id
)"""]
    for i, stage in enumerate(stages[1:], start=2):
        ctes.append(f"""
s{i} AS (
    SELECT e.user_id, min(e.ts) AS t
    FROM ev e JOIN s{i - 1} p ON e.user_id = p.user_id
    WHERE e.event_type = '{stage}' AND e.ts > p.t
      AND e.ts <= p.t + INTERVAL {FUNNEL_WINDOW_S} SECOND
    GROUP BY e.user_id
)""")
    union = "\n    UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{s}' AS event_type, user_id FROM s{i + 1}"
        for i, s in enumerate(stages))
    in_list = ", ".join(f"'{s}'" for s in stages)
    return f"""
WITH ev AS (
    SELECT user_id, event_type, ts FROM events WHERE event_type IN ({in_list})
),{",".join(ctes)},
staged AS (
    {union}
),
counts AS (
    SELECT stage, event_type, count(*) AS n_users FROM staged
    GROUP BY stage, event_type
)
SELECT stage, event_type, n_users,
       {exact_round_div_sql('n_users',
             'first_value(n_users) OVER (ORDER BY stage)', 4)} AS conversion
FROM counts
"""


# --- event-time RANGE-frame rolling aggregate --------------------------------

ROLLING_WINDOW_US = 3_600_000_000  # trailing 1 hour, microseconds


def q_rolling_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the same user's event count and mean value over
    the trailing hour — an event-time RANGE frame, the window-operator
    class the groupBy-window detectors and ROWS-frame running totals
    don't cover (per-row sliding intervals, peers included by value).

    One shuffle on user_id; within a partition the frame slides over the
    time-sorted events with bounded state (only rows inside the hour).
    The mean goes through an exact DECIMAL sum so frame evaluation order
    can't perturb the float result across engines.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )
    w = (Window.partitionBy("user_id").orderBy("ts_us")
         .rangeBetween(-(ROLLING_WINDOW_US - 1), 0))
    n = F.count("*").over(w)
    s = F.sum(F.col("value").cast("decimal(20,2)")).over(w)
    return ev.select(
        "event_id", "user_id",
        n.alias("n_1h"),
        det_round(s.cast("double") / n, 4).alias("avg_value_1h"),
    )


SQL_ROLLING_USER_ACTIVITY = f"""
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       {det_round_sql('''CAST(sum(CAST(value AS DECIMAL(20,2))) OVER w AS DOUBLE)
             / count(*) OVER w''', 4)} AS avg_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLLING_WINDOW_US - 1} PRECEDING AND CURRENT ROW)
"""


# --- event-time disorder audit ----------------------------------------------

#: Lateness bucket edges in microseconds (1 min / 10 min / 1 h).
LATE_1M_US = 60 * 1_000_000
LATE_10M_US = 600 * 1_000_000
LATE_1H_US = 3600 * 1_000_000


def q_event_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How out-of-order the event stream actually is, per key: for each
    event, lateness = (per-user high-water-mark of event time over
    earlier arrivals) - (own event time), bucketed.  Arrival order is
    event_id (the producer's monotonic sequence).

    This is THE query you run before choosing a watermark delay
    (reference hardcodes 5 s, flink/error_rate_detector.py:131, with no
    evidence): the bucket histogram says what fraction of events a given
    delay would drop.  The window partitions by user_id — per-key
    watermarking is what Spark's withWatermark does NOT give you (its
    watermark is global), so the audit also quantifies how much a global
    watermark over-drops slow keys.  One shuffle on user_id; no global
    ordering anywhere.
    """
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    late = ev.select(
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.max("ts_us").over(w), F.col("ts_us"))
            - F.col("ts_us"),
        ).alias("late_us"))
    bucket = (
        F.when(F.col("late_us") == 0, "on_time")
        .when(F.col("late_us") <= LATE_1M_US, "le_1m")
        .when(F.col("late_us") <= LATE_10M_US, "le_10m")
        .when(F.col("late_us") <= LATE_1H_US, "le_1h")
        .otherwise("gt_1h")
    )
    return (
        late.groupBy(bucket.alias("lateness_bucket"))
        .agg(F.count("*").cast("long").alias("n_events"),
             F.max("late_us").alias("max_late_us"))
    )


SQL_EVENT_LATENESS_AUDIT = f"""
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
l AS (
    SELECT greatest(0, COALESCE(max(ts_us) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), ts_us)
           - ts_us) AS late_us
    FROM e
),
b AS (
    SELECT CASE WHEN late_us = 0 THEN 'on_time'
                WHEN late_us <= {LATE_1M_US} THEN 'le_1m'
                WHEN late_us <= {LATE_10M_US} THEN 'le_10m'
                WHEN late_us <= {LATE_1H_US} THEN 'le_1h'
                ELSE 'gt_1h' END AS lateness_bucket,
           late_us
    FROM l
)
SELECT lateness_bucket, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(late_us) AS BIGINT) AS max_late_us
FROM b GROUP BY lateness_bucket
"""


# --- error inter-arrival statistics -----------------------------------------

def q_error_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per service: gap statistics between consecutive error events —
    the burst-detection baseline (a p50 collapsing far below the mean
    reveals clustered failures the rate detector's fixed windows
    smear).  lag() over a (service)-partitioned event-time order, then
    the same exact nearest-rank-low percentile the p95 detector uses;
    one shuffle on service, percentile state bounded per service.
    """
    from ..functions.percentile import exact_percentile_disc
    from ..operators.logs import error_logs

    errors = error_logs(load_table(spark, sf_dir, "events")).select(
        "service", "event_id", F.unix_micros("ts").alias("ts_us"))
    w = Window.partitionBy("service").orderBy("ts_us", "event_id")
    gaps = (
        errors.withColumn("prev_us", F.lag("ts_us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .select("service", (F.col("ts_us") - F.col("prev_us")).alias("gap_us"))
    )
    return gaps.groupBy("service").agg(
        F.count("*").cast("long").alias("n_gaps"),
        exact_percentile_disc(F.col("gap_us"), 0.5).alias("p50_gap_us"),
        exact_percentile_disc(F.col("gap_us"), 0.95).alias("p95_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


def _error_interarrival_sql() -> str:
    from ..functions.percentile import percentile_disc_sql

    return f"""
WITH {LOGS_CTE},
e AS (
    SELECT service, event_id, epoch_us(ts) AS ts_us
    FROM logs WHERE is_error = 1
),
g AS (
    SELECT service,
           ts_us - lag(ts_us) OVER (PARTITION BY service
                                    ORDER BY ts_us, event_id) AS gap_us
    FROM e
)
SELECT service, CAST(count(*) AS BIGINT) AS n_gaps,
       {percentile_disc_sql('gap_us', 0.5)} AS p50_gap_us,
       {percentile_disc_sql('gap_us', 0.95)} AS p95_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY service
"""


# --- per-service latency anomaly detection ----------------------------------

def q_latency_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.detect import latency_anomalies
    from ..operators.logs import as_logs

    return latency_anomalies(as_logs(load_table(spark, sf_dir, "events")))


SQL_LATENCY_ANOMALIES = f"""
WITH {LOGS_CTE},
cs AS (
    SELECT service, CAST(ts AS DATE) AS day,
           CAST(round(latency_ms * 100) AS HUGEINT) AS x_cs
    FROM logs WHERE latency_ms IS NOT NULL
),
stats AS (
    SELECT service, day,
           CAST(count(*) AS HUGEINT) AS n,
           sum(x_cs) AS s,
           sum(x_cs * x_cs) AS q
    FROM cs GROUP BY 1, 2
)
SELECT c.service,
       strftime(c.day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN (n * x_cs - s) * (n * x_cs - s)
                          > {ANOMALY_Z * ANOMALY_Z} * (n * q - s * s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(max(c.x_cs) AS BIGINT) AS max_latency_cs
FROM cs c JOIN stats USING (service, day)
GROUP BY 1, 2
"""


# --- multi-quantile latency bands --------------------------------------------

def q_latency_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service daily latency BANDS — p50/p90/p99/max from ONE sorted
    buffer per (service, day), not one aggregation per quantile: the
    dashboard query that draws percentile ribbons.  All four outputs are
    order STATISTICS (selection, never arithmetic), so doubles carry no
    cross-engine float surface, and the nearest-rank-low convention
    matches the reference's p95 discipline
    (flink/latency_slo_monitor.py:45-64, functions/percentile.py).

    Scale: state is O(window) once, shared by every quantile; the
    documented scale path is ``percentile_approx(col, array(.5,.9,.99))``
    — Spark's t-digest accepts a quantile ARRAY natively, keeping the
    one-buffer shape with bounded state (cf. latency_p95_approx)."""
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events")) \
        .filter(F.col("latency_ms").isNotNull())
    g = (
        logs.groupBy("service", F.window("ts", "1 day").alias("window"))
        .agg(F.array_sort(F.collect_list("latency_ms")).alias("_arr"))
    )

    def pick(q: float):
        idx = F.floor(F.lit(q) * (F.size("_arr") - 1)).cast("int")
        return F.get(F.col("_arr"), idx)

    return g.select(
        "service",
        F.col("window.start").cast("long").alias("day_start"),
        F.size("_arr").cast("long").alias("n_events"),
        pick(0.5).alias("p50"),
        pick(0.9).alias("p90"),
        pick(0.99).alias("p99"),
        F.element_at("_arr", -1).alias("max_latency"),
    )


def _latency_bands_daily_sql() -> str:
    from ..functions.percentile import percentile_disc_sql
    from .reference import DAY

    return f"""
WITH {LOGS_CTE},
l AS (SELECT service, ts, latency_ms FROM logs WHERE latency_ms IS NOT NULL)
SELECT service,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY}
           AS day_start,
       CAST(count(*) AS BIGINT) AS n_events,
       {percentile_disc_sql('latency_ms', 0.5)} AS p50,
       {percentile_disc_sql('latency_ms', 0.9)} AS p90,
       {percentile_disc_sql('latency_ms', 0.99)} AS p99,
       max(latency_ms) AS max_latency
FROM l GROUP BY 1, 2
"""


# --- SLO error-budget burn ---------------------------------------------------

#: Error-budget SLO: tolerated error rate, in basis points (2000 = 20%
#: — sized to the fixture's synthetic error rates so burn crosses 1.0).
ERROR_SLO_BP = 2000


def q_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget accounting: per (service, day), the daily error
    rate plus the RUNNING burn ratio — cumulative errors over cumulative
    budget (tolerated errors at the SLO rate).  burn > 1 means the
    service has spent more than its to-date budget; the row where it
    first crosses is when a release freeze triggers.

    Exactness: both the daily rate and the burn ratio divide exact
    BIGINT running sums (detmath.exact_round_div) — the cumulative
    window is integer addition, so no float drift accumulates over
    days.  Scale: one (service, day) aggregation, then a per-service
    ordered window over #days rows."""
    from ..functions.detmath import exact_round_div
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    daily = (
        logs.groupBy("service", F.window("ts", "1 day").alias("window"))
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum("is_error").cast("long").alias("n_errors"))
        .select("service",
                F.col("window.start").cast("long").alias("day_start"),
                "n_events", "n_errors")
    )
    w = (Window.partitionBy("service").orderBy("day_start")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = daily.withColumns({
        "_cum_n": F.sum("n_events").over(w),
        "_cum_e": F.sum("n_errors").over(w),
    })
    return cum.select(
        "service", "day_start", "n_events", "n_errors",
        exact_round_div(F.col("n_errors"), F.col("n_events"))
            .alias("error_rate"),
        exact_round_div(F.col("_cum_e") * 10_000,
                        F.col("_cum_n") * ERROR_SLO_BP).alias("burn_ratio"),
    )


def _error_budget_burn_sql() -> str:
    from ..functions.detmath import exact_round_div_sql
    from .reference import DAY

    return f"""
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY}
               AS day_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_error) AS BIGINT) AS n_errors
    FROM logs GROUP BY 1, 2
),
cum AS (
    SELECT *,
           sum(n_events) OVER (PARTITION BY service ORDER BY day_start
                               ROWS UNBOUNDED PRECEDING) AS cum_n,
           sum(n_errors) OVER (PARTITION BY service ORDER BY day_start
                               ROWS UNBOUNDED PRECEDING) AS cum_e
    FROM daily
)
SELECT service, day_start, n_events, n_errors,
       {exact_round_div_sql('n_errors', 'n_events')} AS error_rate,
       {exact_round_div_sql('cum_e * 10000',
                            f'cum_n * {ERROR_SLO_BP}')} AS burn_ratio
FROM cum
"""


# --- full-outer metrics reconciliation ---------------------------------------

def q_metrics_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ops-coverage reconciliation: per (service, day), the
    log-side p95 FULL OUTER JOINed with the alert-side counts — days
    with traffic but zero alerts are the (healthy) norm, alert rows
    without matching traffic would indicate a pipeline bug.  The one
    join shape the registry didn't exercise: both inputs keep their
    non-matching rows.

    Scale: both sides are already (service, day)-aggregated — tiny
    relative to their inputs — and the full outer is an equi-join on
    the grouping key both sides ALREADY shuffled on, so no extra
    corpus-sized exchange."""
    from .reference import q_alert_metrics_daily, q_latency_p95_daily

    p95 = q_latency_p95_daily(spark, sf_dir) \
        .select("service", "window_start", "p95_latency", "total_logs")
    al = q_alert_metrics_daily(spark, sf_dir) \
        .select("service", "window_start", "total_alerts")
    return (
        p95.join(al, ["service", "window_start"], "full_outer")
        .select(
            "service", "window_start", "p95_latency",
            F.coalesce(F.col("total_logs"), F.lit(0)).cast("long")
                .alias("total_logs"),
            F.coalesce(F.col("total_alerts"), F.lit(0)).cast("long")
                .alias("total_alerts"),
            F.when(F.col("total_logs").isNotNull()
                   & F.col("total_alerts").isNotNull(), F.lit("both"))
             .when(F.col("total_logs").isNotNull(), F.lit("logs_only"))
             .otherwise(F.lit("alerts_only")).alias("coverage"),
        )
    )


def _metrics_reconciliation_sql() -> str:
    from .reference import SQL_ALERT_METRICS_DAILY, SQL_LATENCY_P95_DAILY

    return f"""
WITH p95 AS ({SQL_LATENCY_P95_DAILY}),
al AS ({SQL_ALERT_METRICS_DAILY})
SELECT COALESCE(p95.service, al.service) AS service,
       COALESCE(p95.window_start, al.window_start) AS window_start,
       p95.p95_latency,
       COALESCE(p95.total_logs, 0) AS total_logs,
       COALESCE(al.total_alerts, 0) AS total_alerts,
       CASE WHEN p95.total_logs IS NOT NULL
                 AND al.total_alerts IS NOT NULL THEN 'both'
            WHEN p95.total_logs IS NOT NULL THEN 'logs_only'
            ELSE 'alerts_only' END AS coverage
FROM p95 FULL OUTER JOIN al
  ON p95.service = al.service AND p95.window_start = al.window_start
"""


# --- dense time-series gap filling -------------------------------------------

def q_service_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-service daily series: every (service, day) in the
    corpus's date span gets a row — zero-filled counts for silent days
    plus ``days_since_activity`` (distance to the last day with any
    traffic, NULL before first activity) — the resample/gap-fill step
    every telemetry dashboard and training-cadence monitor needs, which
    a plain groupBy cannot produce (it emits only observed days).

    Scale: the heavy side is the one (service, day) aggregation the
    query would do anyway; the spine is |services|·|days| rows built
    from a single-row min/max broadcast crossed with the distinct
    service dim (sanctioned small-dim nested loop), and the
    carried-forward window partitions by service.  Integer-only."""
    from ..operators.logs import as_logs
    from .reference import DAY

    logs = as_logs(_t(spark, sf_dir, "events"))
    daily = (
        logs.groupBy("service", F.window("ts", "1 day").alias("window"))
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum("is_error").cast("long").alias("n_errors"))
        .select("service",
                F.col("window.start").cast("long").alias("day_start"),
                "n_events", "n_errors")
    )
    bounds = daily.agg(F.min("day_start").alias("lo"),
                       F.max("day_start").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(DAY)))
            .alias("day_start"))
    spine = daily.select("service").distinct().crossJoin(F.broadcast(days))
    filled = (
        spine.join(daily, ["service", "day_start"], "left")
        .select("service", "day_start",
                F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
                    .alias("n_events"),
                F.coalesce(F.col("n_errors"), F.lit(0)).cast("long")
                    .alias("n_errors"))
    )
    w = (Window.partitionBy("service").orderBy("day_start")
         .rowsBetween(Window.unboundedPreceding, 0))
    last_active = F.max(
        F.when(F.col("n_events") > 0, F.col("day_start"))).over(w)
    from ..functions.detmath import int_div
    return filled.select(
        "service", "day_start", "n_events", "n_errors",
        (F.col("n_events") == 0).alias("is_gap"),
        int_div(F.col("day_start") - last_active, F.lit(DAY))
            .alias("days_since_activity"),
    )


def _service_daily_gapfill_sql() -> str:
    from .reference import DAY

    return f"""
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY}
               AS day_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_error) AS BIGINT) AS n_errors
    FROM logs GROUP BY 1, 2
),
bounds AS (SELECT min(day_start) AS lo, max(day_start) AS hi FROM daily),
days AS (
    SELECT unnest(range(lo, hi + {DAY}, {DAY})) AS day_start FROM bounds
),
spine AS (
    SELECT s.service, d.day_start
    FROM (SELECT DISTINCT service FROM daily) s CROSS JOIN days d
),
filled AS (
    SELECT s.service, s.day_start,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.n_errors, 0) AS n_errors
    FROM spine s LEFT JOIN daily d
      ON s.service = d.service AND s.day_start = d.day_start
)
SELECT service, day_start, n_events, n_errors,
       n_events = 0 AS is_gap,
       (day_start - max(CASE WHEN n_events > 0 THEN day_start END)
            OVER (PARTITION BY service ORDER BY day_start
                  ROWS UNBOUNDED PRECEDING)) // {DAY}
           AS days_since_activity
FROM filled
"""


# --- unpivot (wide metrics -> long) ------------------------------------------

#: Count metrics melted by the unpivot query (shared by both dialects).
UNPIVOT_METRICS = ("total_alerts", "latency_breaches", "error_spikes",
                   "max_breach_count")


def q_alert_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily alert metrics melted from wide to long — one
    (service, window, metric, value) row per count column, via Spark's
    native ``DataFrame.unpivot`` — the shape a metrics store or
    plotting layer ingests.  NULL values survive the melt (a day with
    no breach alerts reports max_breach_count NULL, not a dropped row).

    Scale: unpivot is a per-row expand (Expand node), no shuffle beyond
    the upstream aggregation; output is #rows × #metrics."""
    from .reference import q_alert_metrics_daily

    m = q_alert_metrics_daily(spark, sf_dir)
    return m.unpivot(
        ids=["service", "window_start"],
        values=list(UNPIVOT_METRICS),
        variableColumnName="metric",
        valueColumnName="value",
    ).withColumn("value", F.col("value").cast("long"))


def _alert_metrics_unpivot_sql() -> str:
    from .reference import SQL_ALERT_METRICS_DAILY

    arms = "\nUNION ALL\n".join(
        f"SELECT service, window_start, '{c}' AS metric,"
        f" CAST({c} AS BIGINT) AS value FROM am"
        for c in UNPIVOT_METRICS)
    return f"""
WITH am AS ({SQL_ALERT_METRICS_DAILY})
{arms}
"""


# --- robust per-service latency statistics -----------------------------------

def q_latency_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service robust latency center/spread: exact nearest-rank-low
    median and MAD (median absolute deviation) — the robust twin of
    latency_anomalies' mean/z-score (a handful of timeout outliers moves
    a mean by seconds but the median by nothing, so SLO baselines are
    set on median/MAD in practice).

    Both medians reuse the reference's nearest-rank-low selection
    discipline (functions/percentile.py, flink/latency_slo_monitor.py:45-64
    provenance), so the result is an ELEMENT of the data — selection, not
    arithmetic, hence no float parity surface even on double latencies
    (the |x − med| deviations are single IEEE subtractions of
    identically-derived doubles).  Two shuffles on service; the
    #services-row median table broadcasts back.  At 100 TB the
    collect_list per service is the documented exact/approx pair:
    percentile_approx replaces both selections, same schema
    (cf. latency_p95_daily vs latency_p95_approx)."""
    from ..functions.percentile import exact_percentile_disc
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events")) \
        .filter(F.col("latency_ms").isNotNull())
    med = logs.groupBy("service").agg(
        exact_percentile_disc(F.col("latency_ms"), 0.5).alias("med"))
    return (
        logs.join(F.broadcast(med), "service")
        .select("service", "med",
                F.abs(F.col("latency_ms") - F.col("med")).alias("dev"))
        .groupBy("service")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("med").alias("median_latency"),
            exact_percentile_disc(F.col("dev"), 0.5).alias("mad_latency"),
        )
    )


def _latency_median_mad_sql() -> str:
    from ..functions.percentile import percentile_disc_sql

    return f"""
WITH {LOGS_CTE},
l AS (SELECT service, latency_ms FROM logs WHERE latency_ms IS NOT NULL),
med AS (
    SELECT service, {percentile_disc_sql('latency_ms', 0.5)} AS med
    FROM l GROUP BY service
)
SELECT l.service,
       CAST(count(*) AS BIGINT) AS n_events,
       min(m.med) AS median_latency,
       {percentile_disc_sql('abs(l.latency_ms - m.med)', 0.5)} AS mad_latency
FROM l JOIN med m ON l.service = m.service
GROUP BY l.service
"""


# --- partition-skew audit ----------------------------------------------------

#: Heavy hitters reported by the skew audit.
SKEW_TOP_K = 20


def q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter audit of the events keyspace: the top-20 user_ids by
    row count, each with its corpus share and its skew factor vs the
    mean key (count · n_keys / total) — the measurement that DECIDES
    whether a keyed join/agg needs the salting treatment
    (salted_join_revenue is the cure; this query is the diagnosis).

    Scale: one groupBy(key) count — the same shuffle any keyed op would
    do anyway — then a k-row TakeOrdered (per-partition partial top-k
    merged on the driver, never a global sort) against a single-row
    totals broadcast.  Shares and skew factors are
    detmath.exact_round_div over exact BIGINT counts."""
    from ..functions.detmath import exact_round_div

    per_key = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    tot = per_key.agg(
        F.sum("n_events").alias("total_events"),
        F.count("*").cast("long").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(SKEW_TOP_K)
        .select(
            "user_id", "n_events",
            exact_round_div(F.col("n_events"), F.col("total_events"),
                            scale=6).alias("share"),
            exact_round_div(F.col("n_events") * F.col("n_keys"),
                            F.col("total_events")).alias("skew_vs_mean"),
        )
    )


def _skew_audit_sql() -> str:
    from ..functions.detmath import exact_round_div_sql

    return f"""
WITH per_key AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
),
tot AS (
    SELECT CAST(sum(n_events) AS BIGINT) AS total_events,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM per_key
)
SELECT user_id, n_events,
       {exact_round_div_sql('n_events', 'total_events', 6)} AS share,
       {exact_round_div_sql('n_events * n_keys', 'total_events')}
           AS skew_vs_mean
FROM per_key CROSS JOIN tot
ORDER BY n_events DESC, user_id ASC
LIMIT {SKEW_TOP_K}
"""


def q_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (operators/layout): bucket events onto a
    256×256 (user, latency) grid, interleave to a Morton key, and
    measure per 256-cell key tile how bounded BOTH dimensions stay —
    the property that makes a Z-ordered file layout prune on either
    predicate (a single-column sort gives n_x=1 but n_y up to 256; the
    Z-curve bounds both at 16).  This is the read-side audit for
    layout.write_zordered.

    Scale: one projection computes the key inside codegen (pure
    div/%/multiply arithmetic, no bit intrinsics), one
    map-side-combined groupBy onto ≤256 tile rows.

    Determinism: all-integer — the latency bucket floors a
    bit-identical double, everything after is BIGINT.
    """
    from ..functions.detmath import int_div
    from ..operators.layout import morton_key

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).alias("zx"),
        F.greatest(F.lit(0), F.least(
            F.lit(255), F.floor("value").cast("long"))).alias("zy"),
    )
    keyed = ev.select(morton_key(F.col("zx"), F.col("zy")).alias("zkey"),
                      "zx", "zy")
    return (
        keyed.groupBy(int_div(F.col("zkey"), F.lit(256)).alias("tile"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("zx").alias("n_x"),
            F.countDistinct("zy").alias("n_y"),
            F.min("zkey").alias("zkey_min"),
            F.max("zkey").alias("zkey_max"),
        )
    )


def _zorder_locality_sql() -> str:
    from ..operators.layout import morton_key_sql

    return f"""
WITH keyed AS (
    SELECT {morton_key_sql('zx', 'zy')} AS zkey, zx, zy
    FROM (SELECT user_id % 256 AS zx,
                 greatest(0, least(255, CAST(floor(value) AS BIGINT))) AS zy
          FROM events)
)
SELECT zkey // 256 AS tile,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT zx) AS BIGINT) AS n_x,
       CAST(count(DISTINCT zy) AS BIGINT) AS n_y,
       CAST(min(zkey) AS BIGINT) AS zkey_min,
       CAST(max(zkey) AS BIGINT) AS zkey_max
FROM keyed GROUP BY 1
"""


# --- cohort retention matrix -------------------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day, then
    the fraction of each cohort active again N days later — the
    (cohort_day, day_offset) retention matrix product analytics reads.

    Shuffle shape: ONE distinct over (user, day) (events collapse
    map-side to at most users x days rows), one groupBy(user) for the
    cohort assignment, then the matrix aggregation over user-day rows —
    no self-join of the raw events table; the cohort-size table
    (≤ #days rows) broadcasts back.  The retention ratio is
    detmath.exact_round_div over exact BIGINT counts.
    """
    from ..functions.detmath import exact_round_div

    ev = load_table(spark, sf_dir, "events")
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = activity.join(first, "user_id").select(
        "user_id", "cohort_day",
        F.datediff(F.col("day"), F.col("cohort_day")).cast("long")
            .alias("day_offset"))
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").cast("long").alias("cohort_size"))
    # (cohort_day, day_offset, user) rows are unique by construction
    # (activity is distinct, cohort_day is functional on user), so
    # count(*) IS the distinct-user count — no countDistinct shuffle.
    ret = joined.groupBy("cohort_day", "day_offset").agg(
        F.count("*").cast("long").alias("n_active"))
    return (
        ret.join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset", "n_active", "cohort_size",
            exact_round_div(F.col("n_active"), F.col("cohort_size"),
                            scale=4).alias("retention"),
        )
    )


def _cohort_retention_sql() -> str:
    from ..functions.detmath import exact_round_div_sql

    return f"""
WITH activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
firsts AS (
    SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
),
joined AS (
    SELECT a.user_id, f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
               AS day_offset
    FROM activity a JOIN firsts f USING (user_id)
),
sizes AS (
    SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
    FROM firsts GROUP BY cohort_day
),
ret AS (
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM joined GROUP BY cohort_day, day_offset
)
SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day, r.day_offset,
       r.n_active, s.cohort_size,
       {exact_round_div_sql('r.n_active', 's.cohort_size', 4)} AS retention
FROM ret r JOIN sizes s USING (cohort_day)
"""


# --- event transition matrix -------------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next event type | current) with counts — the navigation-flow /
    behavioral-model input.  lead() over (user, event-time) pairs each
    event with its successor; transition counts aggregate map-side; the
    per-source-type totals (≤ #types rows) broadcast back; probability
    is detmath.exact_round_div over exact BIGINT counts.

    Scale shape: the window partitions by user_id — per-user history is
    small at any corpus size, so no partition outgrows a task — and the
    only corpus-wide shuffle is the user repartition the window needs.
    """
    from ..functions.detmath import exact_round_div

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type",
                  F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
    )
    trans = (
        pairs.groupBy(F.col("event_type").alias("from_type"),
                      F.col("next_type").alias("to_type"))
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("_tot"))
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select("from_type", "to_type", "n_transitions",
                exact_round_div(F.col("n_transitions"), F.col("_tot"), 4)
                    .alias("prob"))
    )


def _event_transitions_sql() -> str:
    from ..functions.detmath import exact_round_div_sql

    return f"""
WITH pairs AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
),
trans AS (
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM pairs WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
),
totals AS (
    SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS tot
    FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n_transitions,
       {exact_round_div_sql('t.n_transitions', 'tt.tot', 4)} AS prob
FROM trans t JOIN totals tt ON t.from_type = tt.from_type
"""


# --- DAU / WAU stickiness ----------------------------------------------------

def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives, trailing-7-day actives, and the DAU/WAU
    stickiness ratio per day — the standard engagement dashboard.

    WAU is computed WITHOUT a range join or windowed distinct: each
    distinct (user, day) row fans out to the 7 days it keeps the user
    "weekly active" for (a bounded sequence explode), then one distinct
    + count per day.  Work is 7x the user-day table — linear, map-side
    expanded, shuffled once on (day, user) — where a range join would
    rescan and a per-day window would hold growing distinct state.
    Days with WAU but no same-day activity still appear (DAU 0).
    """
    from ..functions.detmath import exact_round_div

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    week = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"),
                             F.date_add(F.col("day"), 6))).alias("day"),
    ).distinct()
    wau = week.groupBy("day").agg(F.count("*").cast("long").alias("wau"))
    return (
        wau.join(dau, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            "wau",
            exact_round_div(F.coalesce(F.col("dau"), F.lit(0)),
                            F.col("wau"), 4).alias("stickiness"),
        )
    )


def _dau_wau_sql() -> str:
    from ..functions.detmath import exact_round_div_sql

    return f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (
    SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
),
week AS (
    SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
    FROM ud, range(0, 7) r(i)
),
wau AS (
    SELECT day, CAST(count(*) AS BIGINT) AS wau FROM week GROUP BY day
)
SELECT strftime(w.day, '%Y-%m-%d') AS day,
       CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
       w.wau,
       {exact_round_div_sql('coalesce(d.dau, 0)', 'w.wau', 4)} AS stickiness
FROM wau w LEFT JOIN dau d ON w.day = d.day
"""


# --- bucketed interval-overlap (range) join ---------------------------------

#: Error bursts aggregate on 1-hour buckets; busy intervals coalesce
#: 6-hour buckets, which is also the join grid (≈ the busy-interval
#: granularity, so the explode factor stays small).
BURST_BUCKET_S = 3_600
BUSY_BUCKET_S = 21_600


def q_error_burst_busy_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which error bursts happened during busy traffic intervals — an
    interval-overlap (range) join, the operator Spark has no native form
    of.

    Both interval sets derive from the log stream: bursts are hours with
    >= 2 errors per service ([first, last+1) of the actual error times);
    busy intervals are maximal runs of 6-hour buckets whose event count
    is >= 1.2x the service's per-bucket average (gaps-and-islands,
    operators/intervals.islands — the 1.2x gate is the integer-exact
    cross-multiplied ``5*n*buckets >= 6*total``, no float division).
    The overlap join is operators/intervals.bucketed_interval_join: both
    sides explode onto the 6-hour grid and equi-join on (service,
    bucket) — NOT a range-predicate join on the 4-value service key,
    which would put each service's full history in one skewed partition;
    the grid multiplies join-key cardinality by the timeline so the
    shuffle balances at any scale.  All arithmetic is integer epoch
    seconds: exact in both engines by construction.
    """
    from ..operators.intervals import bucketed_interval_join, islands
    from ..operators.logs import as_logs, error_logs

    ev = _t(spark, sf_dir, "events")
    sec = F.floor(F.unix_micros(F.col("ts")) / 1_000_000).cast("long")

    bursts = (
        error_logs(ev).select("service", sec.alias("s"))
        .groupBy("service", F.floor(F.col("s") / BURST_BUCKET_S).alias("hb"))
        .agg(F.min("s").alias("burst_start"),
             (F.max("s") + 1).alias("burst_end"),
             F.count("*").cast("long").alias("n_errors"))
        .filter(F.col("n_errors") >= 2)
        .drop("hb")
    )

    buckets = (
        as_logs(ev).select("service", sec.alias("s"))
        .groupBy("service", F.floor(F.col("s") / BUSY_BUCKET_S).alias("bb"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy("service")
    busy = (
        buckets
        .withColumn("nb", F.count("*").over(w))
        .withColumn("tot", F.sum("n").over(w))
        .filter(F.lit(5) * F.col("n") * F.col("nb")
                >= F.lit(6) * F.col("tot"))
        .select("service", "bb", "n")
    )
    busy_islands = (
        islands(busy, ["service"], "bb", BUSY_BUCKET_S,
                agg_cols={"busy_events": F.sum("n").cast("long")})
        .withColumnRenamed("start_s", "busy_start")
        .withColumnRenamed("end_s", "busy_end")
        .withColumnRenamed("n_buckets", "n_busy_buckets")
    )

    pairs = bucketed_interval_join(
        bursts, busy_islands, ["service"],
        a_start="burst_start", a_end="burst_end",
        b_start="busy_start", b_end="busy_end",
        bucket_s=BUSY_BUCKET_S)
    return pairs.select(
        "service", "burst_start", "burst_end", "n_errors",
        "busy_start", "busy_end", "n_busy_buckets", "busy_events",
        (F.least("burst_end", "busy_end")
         - F.greatest("burst_start", "busy_start")).alias("overlap_s"))


SQL_ERROR_BURST_BUSY_OVERLAP = f"""
WITH {LOGS_CTE},
sec AS (
    SELECT service, is_error,
           CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS s
    FROM logs
),
bursts AS (
    SELECT service,
           MIN(s) AS burst_start,
           MAX(s) + 1 AS burst_end,
           CAST(COUNT(*) AS BIGINT) AS n_errors
    FROM sec WHERE is_error = 1
    GROUP BY service, CAST(floor(s / {BURST_BUCKET_S}) AS BIGINT)
    HAVING COUNT(*) >= 2
),
bb AS (
    SELECT service, CAST(floor(s / {BUSY_BUCKET_S}) AS BIGINT) AS bb,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sec GROUP BY 1, 2
),
busy AS (
    SELECT service, bb, n FROM (
        SELECT service, bb, n,
               COUNT(*) OVER (PARTITION BY service) AS nb,
               SUM(n) OVER (PARTITION BY service) AS tot
        FROM bb)
    WHERE 5 * n * nb >= 6 * tot
),
isl AS (
    SELECT service,
           MIN(bb) * {BUSY_BUCKET_S} AS busy_start,
           (MAX(bb) + 1) * {BUSY_BUCKET_S} AS busy_end,
           CAST(COUNT(*) AS BIGINT) AS n_busy_buckets,
           CAST(SUM(n) AS BIGINT) AS busy_events
    FROM (SELECT service, bb, n,
                 bb - ROW_NUMBER() OVER (PARTITION BY service ORDER BY bb)
                     AS run
          FROM busy)
    GROUP BY service, run
)
SELECT b.service, burst_start, burst_end, n_errors,
       busy_start, busy_end, n_busy_buckets, busy_events,
       LEAST(burst_end, busy_end) - GREATEST(burst_start, busy_start)
           AS overlap_s
FROM bursts b JOIN isl i ON b.service = i.service
WHERE burst_start < busy_end AND busy_start < burst_end
"""


# --- in-engine model eval: exact ROC-AUC without a global sort ---------------

#: AUC score quantization: latency scores are bucketed at 0.01 ms
#: (x100, floor) before ranking, so the cumulative pair-count relation
#: is bounded by the score RANGE (~56k buckets for 0-560 ms), never by
#: event volume — the knob that turns "sort a service-day onto one
#: task" into a bounded per-group window.  The result is the exact AUC
#: of the quantized classifier (ties at bucket granularity score 1/2,
#: the standard Mann-Whitney convention).
AUC_SCORE_SCALE = 100


def q_error_latency_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (service, day) ROC-AUC of latency as a ranking score for
    ``is_error`` — "do errors come from the slow tail?", the in-engine
    model-eval companion to lang_confusion's confusion matrix: AUC ==
    P(latency_err > latency_ok) + ½·P(tie), the Mann-Whitney U
    statistic, computed EXACTLY and rank-free.

    Scale shape: no global sort and no pairwise join.  One map-side-
    combined aggregation to (service, day, score-bucket) counts, then a
    cumulative window over the BUCKET relation (bounded by the score
    range — AUC_SCORE_SCALE — not by event count): concordant pairs =
    Σ_b pos_b · cumneg_{<b}, ties = Σ_b pos_b·neg_b.  The usual
    sort-by-score AUC puts an entire group on one task; this form keeps
    per-group state at ≤56k bucket rows no matter how many billions of
    events a service-day holds.

    Determinism: bucket ids, pair counts and the n_pos·n_neg
    denominator are all BIGINT; the final division is one IEEE divide
    of identical int64s (correctly rounded from identical operands —
    emitted UNROUNDED per the detmath policy).  Overflow bound:
    2·n_pos·n_neg must fit int64, i.e. ~1.5e9 positives × negatives per
    service-day — beyond that, shrink the group (hourly) or widen to
    the repo's decimal sums.  NULL auc when a day has no errors or no
    successes (single-class AUC is undefined)."""
    from ..functions.detmath import int_div
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events")) \
        .filter(F.col("latency_ms").isNotNull())
    day = int_div(F.unix_timestamp("ts"), F.lit(86400)).alias("day")
    bucket = F.floor(F.col("latency_ms") * AUC_SCORE_SCALE) \
        .cast("long").alias("b")
    bk = logs.groupBy("service", day, bucket).agg(
        F.sum("is_error").cast("long").alias("pos"),
        (F.count("*") - F.sum("is_error")).cast("long").alias("neg"))
    return auc_from_buckets(bk)


def auc_from_buckets(bk: DataFrame) -> DataFrame:
    """Statistic stage of :func:`q_error_latency_auc` over a ``(service,
    day, b, pos, neg)`` bucket-count relation — separated (the
    cusum/robust_trend _from_daily pattern) so the streaming path can
    feed it MAINTAINED bucket counts each micro-batch: per-bucket
    pos/neg sums are mergeable, so the exact AUC is recomputable from
    streamed state at any point (proven against the batch operator in
    tests/test_streaming.py)."""
    w = (Window.partitionBy("service", "day").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, -1))
    c = bk.select(
        "service", "day", "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("long")
        .alias("cumneg"))
    n_pos = F.sum("pos").cast("long")
    n_neg = F.sum("neg").cast("long")
    n_conc = F.sum(F.col("pos") * F.col("cumneg")).cast("long")
    n_tied = F.sum(F.col("pos") * F.col("neg")).cast("long")
    return c.groupBy("service", "day").agg(
        n_pos.alias("n_pos"), n_neg.alias("n_neg"),
        n_conc.alias("n_concordant"), n_tied.alias("n_tied"),
        F.when((n_pos > 0) & (n_neg > 0),
               (2 * n_conc + n_tied).cast("double")
               / (2 * n_pos * n_neg).cast("double")).alias("auc"))


def _error_latency_auc_sql() -> str:
    return f"""
WITH {LOGS_CTE},
l AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
           CAST(floor(latency_ms * {AUC_SCORE_SCALE}) AS BIGINT) AS b,
           is_error
    FROM logs WHERE latency_ms IS NOT NULL
),
bk AS (
    SELECT service, day, b,
           CAST(sum(is_error) AS BIGINT) AS pos,
           CAST(count(*) - sum(is_error) AS BIGINT) AS neg
    FROM l GROUP BY 1, 2, 3
),
c AS (
    SELECT service, day, pos, neg,
           CAST(coalesce(sum(neg) OVER (
               PARTITION BY service, day ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS cumneg
    FROM bk
)
SELECT service, day,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(neg) AS BIGINT) AS n_neg,
       CAST(sum(pos * cumneg) AS BIGINT) AS n_concordant,
       CAST(sum(pos * neg) AS BIGINT) AS n_tied,
       CASE WHEN sum(pos) > 0 AND sum(neg) > 0 THEN
           CAST(2 * CAST(sum(pos * cumneg) AS BIGINT)
                + CAST(sum(pos * neg) AS BIGINT) AS DOUBLE)
           / CAST(2 * CAST(sum(pos) AS BIGINT)
                  * CAST(sum(neg) AS BIGINT) AS DOUBLE)
       END AS auc
FROM c GROUP BY 1, 2
"""


# --- in-engine model eval: held-out calibration (reliability diagram) --------

#: Calibration predictor bands: latency in 50 ms bands, capped at band
#: 9 (the 0-500+ ms fixture range) — band count bounds per-run state.
CALIB_BAND_MS = 50.0
CALIB_MAX_BAND = 9


def q_error_rate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out calibration audit of the simplest latency->error-risk
    model: TRAIN the predictor on even epoch days (per (service,
    latency-band) error rate = predicted probability p_hat), TEST on
    odd days (observed error rate = acc), and report the per-band
    reliability-diagram row |p_hat − acc| — the in-engine train/test
    model-eval loop (split, fit, score, calibrate) run entirely as two
    map-side-combined aggregations and one band-cardinality join.
    ECE = Σ_b n_test_b/N · abs_gap_b for any consumer.

    Scale shape: both legs reduce raw events to (service, band) counts
    map-side (bands are bounded by CALIB_MAX_BAND, services by the key
    space), so the join input is kilobytes at any corpus size; the
    day-parity split is hash-free, deterministic, and stable under
    repartitioning.  Bands seen in only one split carry no calibration
    claim and are dropped by the inner join (documented).

    Determinism: counts are BIGINT; p_hat/acc are exact_round_div
    BIGINT-rounded ratios; abs_gap is |a−b| of two bit-identical
    doubles — identical cross-engine."""
    from ..functions.detmath import int_div
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events")) \
        .filter(F.col("latency_ms").isNotNull())
    day = int_div(F.unix_timestamp("ts"), F.lit(86400))
    band = F.least(F.floor(F.col("latency_ms") / F.lit(CALIB_BAND_MS)),
                   F.lit(CALIB_MAX_BAND)).cast("long").alias("band")
    base = logs.select("service", band, (day % 2).alias("parity"),
                       "is_error")

    def leg(parity: int, n_name: str, e_name: str) -> DataFrame:
        return (base.filter(F.col("parity") == parity)
                .groupBy("service", "band")
                .agg(F.count("*").cast("long").alias(n_name),
                     F.sum("is_error").cast("long").alias(e_name)))

    train = leg(0, "n_train", "_tr_err")
    test = leg(1, "n_test", "_te_err")
    p_hat = exact_round_div(F.col("_tr_err"), F.col("n_train"), 4)
    acc = exact_round_div(F.col("_te_err"), F.col("n_test"), 4)
    return (train.join(test, ["service", "band"])
            .select("service", "band", "n_train",
                    p_hat.alias("p_hat"), "n_test", acc.alias("acc"),
                    F.abs(p_hat - acc).alias("abs_gap")))


def _error_rate_calibration_sql() -> str:
    p_hat = exact_round_div_sql("tr_err", "n_train", 4)
    acc = exact_round_div_sql("te_err", "n_test", 4)
    return f"""
WITH {LOGS_CTE},
base AS (
    SELECT service,
           least(CAST(floor(latency_ms / {CALIB_BAND_MS}) AS BIGINT),
                 {CALIB_MAX_BAND}) AS band,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) % 2 AS parity,
           is_error
    FROM logs WHERE latency_ms IS NOT NULL
),
train AS (
    SELECT service, band, CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(is_error) AS BIGINT) AS tr_err
    FROM base WHERE parity = 0 GROUP BY 1, 2
),
test AS (
    SELECT service, band, CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(is_error) AS BIGINT) AS te_err
    FROM base WHERE parity = 1 GROUP BY 1, 2
)
SELECT service, band, n_train, {p_hat} AS p_hat, n_test, {acc} AS acc,
       abs(({p_hat}) - ({acc})) AS abs_gap
FROM train JOIN test USING (service, band)
"""


# --- CEP-style sequence pattern matching ---------------------------------------

#: The matched pattern and its time bound: two errors then a purchase
#: by the same user within a day — the "user pushed through failures
#: and still converted" friction audit.  Literals so the oracle emits
#: the identical alphabet filter and bound.
SEQ_PATTERN = ("error", "error", "purchase")
SEQ_WINDOW_S = 86_400


def q_sequence_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-step event-sequence pattern matches per user (operators/
    sequences.match_sequence): the CEP construct class — Flink's
    flagship feature family — as one lead() predicate over the
    alphabet-filtered per-user stream under relaxed contiguity, with a
    microsecond-exact time bound.  All-BIGINT output."""
    from ..operators.sequences import match_sequence

    return match_sequence(_t(spark, sf_dir, "events"),
                          pattern=SEQ_PATTERN, window_s=SEQ_WINDOW_S)


def _sequence_matches_sql() -> str:
    k = len(SEQ_PATTERN) - 1
    alphabet = "','".join(sorted(set(SEQ_PATTERN)))
    steps = " AND ".join(f"_t{i} = '{t}'"
                         for i, t in enumerate(SEQ_PATTERN[1:], 1))
    leads = ",\n           ".join(
        f"lead(event_type, {i}) OVER w AS _t{i}" for i in range(1, k + 1))
    return f"""
WITH relevant AS (
    SELECT user_id, event_type, epoch_us(ts) AS tus, event_id AS eid
    FROM events WHERE event_type IN ('{alphabet}')
),
led AS (
    SELECT user_id, event_type, tus, eid,
           {leads},
           lead(tus, {k}) OVER w AS _tend,
           lead(eid, {k}) OVER w AS _eend
    FROM relevant
    WINDOW w AS (PARTITION BY user_id ORDER BY tus, eid)
)
SELECT user_id, tus AS start_us, _tend AS end_us,
       _tend - tus AS duration_us,
       eid AS start_event_id, _eend AS end_event_id
FROM led
WHERE event_type = '{SEQ_PATTERN[0]}' AND {steps}
  AND _tend - tus <= {SEQ_WINDOW_S * 1_000_000}
"""


# --- per-service burstiness (Fano factor) ------------------------------------

def q_service_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service traffic burstiness: the Fano factor (variance / mean)
    of per-minute event counts — the overdispersion audit that separates
    Poisson-like steady load (F ≈ 1) from bursty/clustered arrival (the
    regime where fixed-window rate detectors under-alert between bursts
    and a CUSUM or interarrival detector is needed; complements
    error_interarrival, which looks at gaps of ERRORS only).

    Exact integer path end to end: with m observed minutes, S = Σc,
    Q = Σc² over per-minute counts c,

        fano = var/mean = (m·Q − S²) / (m·S)

    both sides BIGINT, divided once by exact_round_div — NO doubles
    until the final correctly-rounded division, so the oracle is
    value-identical by construction.  The overdispersed flag compares
    the SAME integers (m·Q − S² > m·S ⟺ fano > 1), so it can never
    disagree with the printed ratio.  Minute buckets come from
    epoch-microsecond integer division — timezone-free.  Only observed
    minutes enter (an idle service's empty minutes aren't rows; the
    all-zero-minute regime is invisible to ANY count-based stream, and
    m is reported so a reader can compare against the service's span).

    Scale shape: one map-combinable (service, minute) count, then a
    4-row reduction.  Overflow: m·Q <= minutes · (minutes · c_max²);
    at 1e6 minutes of 1e4 events/min that is ~1e14·m — past ~1e5
    heavy minutes per service move the two products to DECIMAL(38,0)
    (same expressions, wider type); the exact_round_div bound
    (|num| < 4.6e14 at scale 4) is the binding one and is asserted by
    the audit's n_minutes·max_minute² headroom being visible in the
    output."""
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    # exact integer floor division (the joins._floor_div idiom): a
    # long->double cast rounds epoch micros by up to 256 us at 2^60
    # magnitudes, so the double-division path can misbucket events
    # within ~128 us of a minute boundary vs the oracle's integer `//`
    # (ADVICE r11 #2); pmod-then-DIV is floor for every sign
    minute = ("(unix_micros(ts) - pmod(unix_micros(ts), 60000000)) "
              "DIV 60000000")
    minutes = (logs
               .select("service",
                       F.expr(minute).cast("long").alias("minute"))
               .groupBy("service", "minute")
               .agg(F.count("*").cast("long").alias("c")))
    per_svc = minutes.groupBy("service").agg(
        F.count("*").cast("long").alias("n_minutes"),
        F.sum("c").cast("long").alias("total_events"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("_q"),
        F.max("c").cast("long").alias("max_minute"))
    num = (F.col("n_minutes") * F.col("_q")
           - F.col("total_events") * F.col("total_events"))
    den = F.col("n_minutes") * F.col("total_events")
    return per_svc.select(
        "service", "n_minutes", "total_events", "max_minute",
        exact_round_div(num, den, 4).alias("fano"),
        (num > den).alias("overdispersed"))


def _service_burstiness_sql() -> str:
    fano = exact_round_div_sql(
        "n_minutes * _q - total_events * total_events",
        "n_minutes * total_events", 4)
    return f"""
WITH {LOGS_CTE},
mins AS (
    SELECT service, epoch_us(ts) // 60000000 AS minute,
           CAST(count(*) AS BIGINT) AS c
    FROM logs GROUP BY 1, 2
),
per AS (
    SELECT service,
           CAST(count(*) AS BIGINT) AS n_minutes,
           CAST(sum(c) AS BIGINT) AS total_events,
           CAST(sum(c * c) AS BIGINT) AS _q,
           CAST(max(c) AS BIGINT) AS max_minute
    FROM mins GROUP BY service
)
SELECT service, n_minutes, total_events, max_minute,
       {fano} AS fano,
       (n_minutes * _q - total_events * total_events
        > n_minutes * total_events) AS overdispersed
FROM per
"""


#: Kaplan-Meier milestone horizon: S(7 days) in the minute grid.
KM_HORIZON_MIN = 7 * 24 * 60


def _conversion_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival-cohort histogram for the KM estimator and the
    log-rank test: one row per (service, dur) with ``d`` = users whose
    first post-click purchase landed at that minute and ``c`` = users
    right-censored there (window end).  ONE definition of the cohort
    semantics — "minutes from a user's FIRST click to their first
    SUBSEQUENT purchase, censored at the global max timestamp" — so
    the two survival queries can never drift apart.

    Scale shape: TWO pushed scans — the (click ∪ purchase) slice
    (predicate + 3-column pruning; the first-click window and the
    cohort aggregate share its one user-hash shuffle) and the
    column-pruned global max-ts scalar — then one (service, duration)
    histogram shuffle over per-user rows.  Output cardinality is
    bounded by services × the window's span in MINUTES (43k for a
    month) regardless of user count."""
    from ..operators.logs import N_SERVICES

    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    # one pushed scan for the whole cohort: the per-user first-click
    # time rides a window over the SAME (click ∪ purchase) slice, so
    # "first purchase AT OR AFTER the first click" needs no self-join
    # (a two-relation formulation re-plans the click aggregate once
    # per consumer — 4 scans where this does 2)
    w = Window.partitionBy("user_id")
    sub = (ev.filter(F.col("event_type").isin("click", "purchase"))
           .select("user_id", "event_type", us.alias("u"))
           .withColumn("_t0", F.min(F.when(
               F.col("event_type") == "click", F.col("u"))).over(w)))
    cohort = (sub.filter(F.col("_t0").isNotNull())
              .groupBy("user_id")
              .agg(F.max("_t0").alias("t0"),
                   F.min(F.when((F.col("event_type") == "purchase")
                                & (F.col("u") >= F.col("_t0")),
                                F.col("u"))).alias("tc")))
    horizon = ev.groupBy().agg(F.max(us).alias("tmax"))
    base = cohort.crossJoin(F.broadcast(horizon))
    base = base.select(
        F.concat(F.lit("svc-"),
                 (F.col("user_id") % N_SERVICES).cast("string"))
        .alias("service"),
        F.expr("CAST(CASE WHEN tc IS NOT NULL THEN (tc - t0) DIV 60000000"
               " ELSE (tmax - t0) DIV 60000000 END AS BIGINT)")
        .alias("dur"),
        F.col("tc").isNotNull().cast("int").alias("ev"))
    return (base.groupBy("service", "dur")
            .agg(F.sum("ev").cast("long").alias("d"),
                 F.sum(1 - F.col("ev")).cast("long").alias("c")))


def _conversion_hist_cte() -> str:
    """DuckDB twin of :func:`_conversion_hist` — the CTE chain through
    ``hist(service, dur, d, c)``, shared by both survival twins."""
    from ..operators.logs import N_SERVICES

    return f"""sub AS (
    SELECT user_id, event_type, epoch_us(ts) AS u,
           min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id) AS _t0
    FROM events WHERE event_type IN ('click', 'purchase')
),
cohort AS (
    SELECT user_id, CAST(max(_t0) AS BIGINT) AS t0,
           min(CASE WHEN event_type = 'purchase' AND u >= _t0
                    THEN u END) AS tc
    FROM sub WHERE _t0 IS NOT NULL GROUP BY user_id
),
horizon AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
base AS (
    SELECT 'svc-' || CAST(user_id % {N_SERVICES} AS VARCHAR) AS service,
           CAST(CASE WHEN tc IS NOT NULL THEN (tc - t0) // 60000000
                ELSE (tmax - t0) // 60000000 END AS BIGINT) AS dur,
           CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS ev
    FROM cohort CROSS JOIN horizon
),
hist AS (
    SELECT service, dur, CAST(sum(ev) AS BIGINT) AS d,
           CAST(sum(1 - ev) AS BIGINT) AS c
    FROM base GROUP BY 1, 2
)"""


def q_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-convert per service: survival analysis of
    "minutes from a user's FIRST click to their first subsequent
    purchase", with users who never purchased RIGHT-CENSORED at the
    observation-window end — the estimator funnel_conversion cannot
    replace: a plain conversion rate treats not-yet-converted users as
    failures, biasing low exactly when the window is short; KM uses
    their censored exposure time correctly (the reliability/churn
    workhorse).

        S(t) = Π_{{t_i ≤ t, d_i > 0}} (1 − d_i / n_i),

    n_i = users still at risk entering duration t_i (neither converted
    nor censored earlier).  Reported per service: cohort sizes, the KM
    median time-to-convert (first duration with S ≤ 0.5 — NULL when
    conversion never crosses half, which a rate can't even express),
    S at 7 days (probability a clicker is STILL unconverted a week
    in), and S at window end (the never-converting plateau estimate).

    Determinism: durations land on an exact integer MINUTE grid
    (epoch-micros subtraction, integer DIV — the grid is part of the
    statistic's definition, identical in both engines); d, c, n are
    BIGINT; each KM factor divides exact integers as doubles and the
    product folds in duration order over the array_sort'ed struct list
    (bounded state — see below); milestone comparisons (≤ 0.5,
    ≤ horizon) run on those identical doubles; det_round(…, 4) only at
    the output edge.

    Scale shape: TWO pushed scans — the (click ∪ purchase) slice
    (predicate + 3-column pruning; the first-click window and the
    cohort aggregate share its one user-hash shuffle) and the
    column-pruned global max-ts scalar — then everything runs on
    per-user rows: one (service, duration) histogram shuffle, and the
    KM fold's state is bounded by DISTINCT OBSERVED MINUTES per
    service — capped by the observation window's span in minutes (43k
    for a month) regardless of user count, the spend_gini value-domain
    argument on the TIME axis."""
    from ..functions.detmath import det_round

    hist = _conversion_hist(spark, sf_dir)
    elem = F.struct(F.col("dur").alias("dur"), F.col("d").alias("d"),
                    F.col("c").alias("c"))
    per = (hist.groupBy("service")
           .agg(F.sum(F.col("d") + F.col("c")).cast("long")
                .alias("n_users"),
                F.sum("d").cast("long").alias("n_converted"),
                F.sum("c").cast("long").alias("n_censored"),
                F.array_sort(F.collect_list(elem)).alias("_es")))
    zero = F.struct(F.lit(1.0).alias("s"),
                    F.col("n_users").alias("ar"),
                    F.lit(None).cast("long").alias("med"),
                    F.lit(1.0).alias("s7"))

    def step(a, e):
        s_new = a["s"] * ((a["ar"] - e["d"]).cast("double")
                          / a["ar"].cast("double"))
        return F.struct(
            s_new.alias("s"),
            (a["ar"] - e["d"] - e["c"]).alias("ar"),
            F.coalesce(a["med"],
                       F.when(s_new <= 0.5, e["dur"])).alias("med"),
            F.when(e["dur"] <= KM_HORIZON_MIN, s_new)
            .otherwise(a["s7"]).alias("s7"))

    folded = per.withColumn("_acc", F.aggregate("_es", zero, step))
    return folded.select(
        "service", "n_users", "n_converted", "n_censored",
        F.col("_acc.med").alias("km_median_min"),
        det_round(F.col("_acc.s7"), 4).alias("s_7d"),
        det_round(F.col("_acc.s"), 4).alias("s_end"))


def _conversion_survival_sql() -> str:
    from ..functions.detmath import det_round_sql

    # The KM prefix product is SEQUENTIAL double arithmetic, and
    # neither DuckDB fallback reproduces Spark's fold order: window
    # sum(ln) OVER (...) accumulates via a segment TREE (measured: 1921
    # of 2000 adversarial prefixes differ from left-to-right addition),
    # and list_reduce with a multi-field struct accumulator
    # mis-evaluates `a.<field>` references under CSE (duckdb 1.0.0,
    # minimal repro in tests/test_drift.py's module docstring sibling
    # note).  A RECURSIVE CTE is sequential BY CONSTRUCTION — one
    # multiply per step in duration order, the duplicate_components
    # precedent — so both engines execute the identical chain
    # s_i = s_{i-1} * ((ar_i - d_i) / ar_i) on identical integers.
    return f"""
WITH RECURSIVE {_conversion_hist_cte()},
idx AS (
    SELECT service, dur, d, c,
           row_number() OVER (PARTITION BY service ORDER BY dur) AS i,
           CAST(sum(d + c) OVER (PARTITION BY service) AS BIGINT)
           - CAST(coalesce(sum(d + c) OVER (
                 PARTITION BY service ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS ar
    FROM hist
),
rec(service, i, s) AS (
    SELECT service, CAST(0 AS BIGINT), CAST('1.0' AS DOUBLE)
    FROM (SELECT DISTINCT service FROM idx)
    UNION ALL
    SELECT r.service, r.i + 1,
           r.s * (CAST(x.ar - x.d AS DOUBLE) / CAST(x.ar AS DOUBLE))
    FROM rec r JOIN idx x ON x.service = r.service AND x.i = r.i + 1
),
st AS (
    SELECT x.service, x.dur, x.d, x.c, r.s
    FROM idx x JOIN rec r ON r.service = x.service AND r.i = x.i
)
SELECT service,
       CAST(sum(d + c) AS BIGINT) AS n_users,
       CAST(sum(d) AS BIGINT) AS n_converted,
       CAST(sum(c) AS BIGINT) AS n_censored,
       min(CASE WHEN s <= 0.5 THEN dur END) AS km_median_min,
       {det_round_sql(
           "coalesce((max(CASE WHEN dur <= " + str(KM_HORIZON_MIN) +
           " THEN struct_pack(dur := dur, s := s) END)).s,"
           " CAST('1.0' AS DOUBLE))", 4)} AS s_7d,
       {det_round_sql("(max(struct_pack(dur := dur, s := s))).s", 4)}
           AS s_end
FROM st GROUP BY service
"""


#: χ²(1 dof) upper-5% critical value in parts-per-million for the
#: log-rank divergence flag — compared against det_round(chi2, 4) so
#: the flag can never disagree with the printed statistic.
CHI2_1_PPM = 3_841_459


def q_conversion_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does any service's time-to-convert CURVE differ from the rest?
    The log-rank (Mantel-Cox) test, one-vs-rest per service, over the
    same cohort the KM estimator (conversion_survival) reports — the
    inference half of the survival pair: KM draws each curve, log-rank
    says whether a curve's difference is real or sampling noise, using
    the WHOLE curve (a fixed-horizon rate comparison throws away
    everything after its cutoff and is biased by censoring).

    At each pooled conversion minute t with d_t total conversions, the
    service's conversions d_st are compared to the hypergeometric
    expectation under "no difference":

        E = Σ_t d_t·n_st/n_t,
        V = Σ_t d_t·n_st·(n_t−n_st)·(n_t−d_t) / (n_t²·(n_t−1)),
        χ² = (O − E)² / V  ~  χ²₁ under H0   (O = Σ_t d_st),

    n_st / n_t = service / pooled users still at risk entering t.

    Determinism: every at-risk and event count is an exact BIGINT from
    the shared cohort histogram (one definition with the KM query —
    _conversion_hist); each E/V term is the identical double DAG on
    those integers; the per-service sums fold SORTED term lists (the
    chisq discipline — no sequential recursion needed, unlike the KM
    product); det_round(…, 4) at the edge, and the flag compares the
    ROUNDED χ² against {CHI2_1_PPM}e-6 so print and flag always agree.
    χ²/diverges NULL when V = 0 (degenerate — e.g. a single service or
    no conversions at all).

    Scale shape: the cohort histogram (bounded by services × window
    MINUTES) is localCheckpointed once; the (duration × service) risk
    grid is the cross of two aggregates OF THAT CHECKPOINT — both
    attribute-bounded, the chisq-margins class — and every window runs
    on the grid, never on events.  The left join back to the histogram
    is an equi-join on (service, dur)."""
    from ..functions.detmath import det_round

    hist = _conversion_hist(spark, sf_dir).localCheckpoint()
    durd = hist.groupBy("dur").agg(
        F.sum("d").cast("long").alias("dt"),
        F.sum("c").cast("long").alias("ct"))
    svc = hist.groupBy("service").agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_cohort"),
        F.sum("d").cast("long").alias("n_converted"))
    grid = durd.crossJoin(F.broadcast(svc))
    gj = (grid.join(hist, ["service", "dur"], "left")
          .select("service", "dur", "dt", "ct", "n_cohort", "n_converted",
                  F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("ds"),
                  F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("cs")))
    wprev = (Window.partitionBy("service").orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy("service")
    rsk = gj.select(
        "service", "dur", "dt", "n_cohort", "n_converted",
        (F.col("n_cohort")
         - F.coalesce(F.sum(F.col("ds") + F.col("cs")).over(wprev),
                      F.lit(0))).cast("long").alias("nst"),
        (F.sum(F.col("dt") + F.col("ct")).over(wall)
         - F.coalesce(F.sum(F.col("dt") + F.col("ct")).over(wprev),
                      F.lit(0))).cast("long").alias("nt"))
    dtd = F.col("dt").cast("double")
    nstd = F.col("nst").cast("double")
    ntd = F.col("nt").cast("double")
    terms = (rsk.filter(F.col("dt") > 0)
             .select("service",
                     (dtd * nstd / ntd).alias("e_term"),
                     F.when(F.col("nt") > 1,
                            (dtd * nstd * (ntd - nstd) * (ntd - dtd))
                            / (ntd * ntd * (ntd - F.lit(1.0))))
                     .otherwise(F.lit(0.0)).alias("v_term")))
    fold = (lambda c: F.aggregate(F.array_sort(F.collect_list(c)),
                                  F.lit(0.0), lambda a, x: a + x))
    per = (terms.groupBy("service")
           .agg(fold("e_term").alias("_e"), fold("v_term").alias("_v")))
    rep = svc.join(per, ["service"], "left")
    chi2 = det_round((F.col("n_converted").cast("double") - F.col("_e"))
                     * (F.col("n_converted").cast("double") - F.col("_e"))
                     / F.col("_v"), 4)
    crit = (F.lit(CHI2_1_PPM).cast("double")
            / F.lit(1_000_000).cast("double"))
    return rep.select(
        "service", "n_cohort", "n_converted",
        det_round(F.col("_e"), 4).alias("expected_conv"),
        F.when(F.col("_v") > 0, chi2).alias("logrank_chi2"),
        F.when(F.col("_v") > 0, chi2 > crit).alias("diverges"))


def _conversion_logrank_sql() -> str:
    from ..functions.detmath import det_round_sql

    fold = ("list_reduce(list_prepend(0.0, list_sort(list({0}))), "
            "(acc, x) -> acc + x)")
    chi2 = det_round_sql(
        "(CAST(n_converted AS DOUBLE) - _e)"
        " * (CAST(n_converted AS DOUBLE) - _e) / _v", 4)
    return f"""
WITH {_conversion_hist_cte()},
durd AS (
    SELECT dur, CAST(sum(d) AS BIGINT) AS dt,
           CAST(sum(c) AS BIGINT) AS ct
    FROM hist GROUP BY dur
),
svc AS (
    SELECT service, CAST(sum(d + c) AS BIGINT) AS n_cohort,
           CAST(sum(d) AS BIGINT) AS n_converted
    FROM hist GROUP BY service
),
gj AS (
    SELECT g.service, g.dur, g.dt, g.ct, g.n_cohort, g.n_converted,
           CAST(coalesce(h.d, 0) AS BIGINT) AS ds,
           CAST(coalesce(h.c, 0) AS BIGINT) AS cs
    FROM (SELECT * FROM durd CROSS JOIN svc) g
    LEFT JOIN hist h ON h.service = g.service AND h.dur = g.dur
),
rsk AS (
    SELECT service, dur, dt, n_cohort, n_converted,
           CAST(n_cohort - coalesce(sum(ds + cs) OVER (
                PARTITION BY service ORDER BY dur
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS nst,
           CAST(sum(dt + ct) OVER (PARTITION BY service)
                - coalesce(sum(dt + ct) OVER (
                      PARTITION BY service ORDER BY dur
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS nt
    FROM gj
),
terms AS (
    SELECT service,
           CAST(dt AS DOUBLE) * CAST(nst AS DOUBLE) / CAST(nt AS DOUBLE)
               AS e_term,
           CASE WHEN nt > 1 THEN
                CAST(dt AS DOUBLE) * CAST(nst AS DOUBLE)
                * (CAST(nt AS DOUBLE) - CAST(nst AS DOUBLE))
                * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE))
                / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                   * (CAST(nt AS DOUBLE) - CAST('1.0' AS DOUBLE)))
           ELSE CAST('0.0' AS DOUBLE) END AS v_term
    FROM rsk WHERE dt > 0
),
per AS (
    SELECT service, {fold.format('e_term')} AS _e,
           {fold.format('v_term')} AS _v
    FROM terms GROUP BY service
)
SELECT s.service, s.n_cohort, s.n_converted,
       {det_round_sql('_e', 4)} AS expected_conv,
       CASE WHEN _v > 0 THEN {chi2} END AS logrank_chi2,
       CASE WHEN _v > 0 THEN {chi2}
            > CAST({CHI2_1_PPM} AS DOUBLE)
              / CAST(1000000 AS DOUBLE) END AS diverges
FROM svc s LEFT JOIN per USING (service)
"""


def q_latency_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each service's latency
    distribution, second half of the observed window vs the first —
    the ML-monitoring drift score that reads on a FIXED bucket grid
    (the feature-drift report a serving stack publishes):

        PSI = Σ_i (p_i − q_i) · ln(p_i / q_i)

    over HDR log-buckets of centi-ms latency, with Laplace +1
    smoothing on BOTH halves (the standard zero-bucket guard — an
    empty cell would send ln to ±∞).  PSI complements the KS flag
    (latency_ks_drift): KS answers "is there ANY difference" with a
    significance test; PSI quantifies HOW MUCH the mass moved on a
    monitoring-friendly scale (> 0.2 = act).

    Determinism: counts BIGINT; ln runs on the INTEGER cross-ratio
    (a_i+1)(n_b+B) / (b_i+1)(n_a+B) via the det_ln bit-parity DAG
    (overflow bound: (n+1)·(n+B) must fit int64 — fine to ~3e9 events
    per service, decimals beyond); the share differences divide exact
    integers as identical doubles; the bucket sum folds SORTED terms
    (the chisq discipline); det_round(…, 4) at the edge.  psi/unstable
    NULL when either half is empty (a one-sided window has no drift to
    measure).

    Scale shape: ONE event scan into (service, day, bucket) cells —
    bounded by services × days × ≤328 HDR buckets — localCheckpointed
    (the chisq multi-branch barrier); the split day, both halves'
    histograms, totals, and the fold all run on the checkpoint; the
    single-row (min_day, max_day) broadcast is the sanctioned scalar
    pattern."""
    from ..functions.detmath import int_div
    from ..operators.drift import psi_report
    from ..operators.logs import as_logs
    from ..operators.sketches import hdr_bucket

    logs = as_logs(_t(spark, sf_dir, "events"))
    cms = F.floor(F.col("latency_ms") * F.lit(100.0) + F.lit(0.5)) \
        .cast("long")
    cells = (logs
             .filter(F.col("latency_ms").isNotNull())
             .select("service",
                     F.expr("(unix_micros(ts) - pmod(unix_micros(ts), "
                            "86400000000)) DIV 86400000000")
                     .cast("long").alias("day"),
                     hdr_bucket(cms).alias("bucket"))
             .groupBy("service", "day", "bucket")
             .agg(F.count("*").cast("long").alias("c"))
             .localCheckpoint())
    rng = cells.groupBy().agg(
        int_div(F.min("day") + F.max("day"), F.lit(2)).alias("mid"))
    per_b = (cells.crossJoin(F.broadcast(rng))
             .groupBy("service", "bucket")
             .agg(F.coalesce(F.sum(F.when(F.col("day") <= F.col("mid"),
                                          F.col("c"))), F.lit(0))
                  .cast("long").alias("a"),
                  F.coalesce(F.sum(F.when(F.col("day") > F.col("mid"),
                                          F.col("c"))), F.lit(0))
                  .cast("long").alias("b")))
    return psi_report(per_b, group_cols=["service"])


def _latency_psi_sql() -> str:
    from ..functions.detmath import det_ln_sql_items
    from ..operators.drift import PSI_ACTION
    from ..operators.sketches import hdr_bucket_sql

    bucket = hdr_bucket_sql(
        "CAST(floor(latency_ms * 100.0 + 0.5) AS BIGINT)")
    fold = ("list_reduce(list_prepend(0.0, list_sort(list(term))), "
            "(acc, x) -> acc + x)")
    return f"""
WITH {LOGS_CTE},
cells AS (
    SELECT service, epoch_us(ts) // 86400000000 AS day,
           {bucket} AS bucket,
           CAST(count(*) AS BIGINT) AS c
    FROM logs WHERE latency_ms IS NOT NULL
    GROUP BY 1, 2, 3
),
rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM cells),
per_b AS (
    SELECT service, bucket,
           CAST(coalesce(sum(CASE WHEN day <= mid THEN c END), 0)
                AS BIGINT) AS a,
           CAST(coalesce(sum(CASE WHEN day > mid THEN c END), 0)
                AS BIGINT) AS b
    FROM cells CROSS JOIN rng
    GROUP BY 1, 2
),
tot AS (
    SELECT service, CAST(sum(a) AS BIGINT) AS na,
           CAST(sum(b) AS BIGINT) AS nb,
           CAST(count(*) AS BIGINT) AS nbk
    FROM per_b GROUP BY service
),
lnj AS (
    SELECT per_b.service, a, b, na, nb, nbk,
           {det_ln_sql_items('(a + 1) * (nb + nbk)',
                             '(b + 1) * (na + nbk)', 'lr')}
    FROM per_b JOIN tot USING (service)
),
terms AS (
    SELECT service, na, nb, nbk,
           (CAST(a + 1 AS DOUBLE) / CAST(na + nbk AS DOUBLE)
            - CAST(b + 1 AS DOUBLE) / CAST(nb + nbk AS DOUBLE)) * lr
               AS term
    FROM lnj
),
per AS (
    SELECT service, max(na) AS n_base, max(nb) AS n_curr,
           max(nbk) AS n_buckets, {fold} AS _psi
    FROM terms GROUP BY service
)
SELECT service, n_base, n_curr, n_buckets,
       CASE WHEN n_base > 0 AND n_curr > 0
            THEN {det_round_sql('_psi', 4)} END AS psi,
       CASE WHEN n_base > 0 AND n_curr > 0
            THEN {det_round_sql('_psi', 4)} > {PSI_ACTION} END AS unstable
FROM per
"""


def q_latency_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW FAR did each service's latency distribution move, in
    milliseconds?  Wasserstein-1 (earth-mover) distance between the
    second half of the observed window and the first — the drift
    MAGNITUDE companion closing the two-sample family: KS
    (latency_ks_drift) answers "any difference?" with a significance
    test but saturates near 1 for large shifts; PSI (latency_psi)
    scores bucket-mass movement on a convention scale; W1 reads
    directly as "the typical request moved N ms" and is
    translation-faithful (shift everything by Δ ms ⟹ W1 = Δ ms,
    exactly) — the number a capacity review actually wants.

    Transport integral, exactness, and bounds: operators/drift.
    wasserstein_from_counts.  Latencies enter on a whole-millisecond
    grid (floor(ms + 0.5) — the grid is part of the statistic's
    definition, identical in both engines, and keeps the value-domain
    state bounded by the latency RANGE in ms rather than the event
    count); the reported w1_ms is exact for the gridded distributions.

    Scale shape: ONE event scan into (service, day, ms) cells —
    bounded by services × days × latency-range — localCheckpointed
    (the PSI multi-branch barrier: the split-day scalar and the halves
    both derive from it); the single-row mid-day broadcast is the
    sanctioned scalar pattern; the cumulative window runs on the
    per-service distinct-value histogram, never a global sort."""
    from ..functions.detmath import int_div
    from ..operators.drift import wasserstein_from_counts
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    ms = F.floor(F.col("latency_ms") + F.lit(0.5)).cast("long")
    cells = (logs
             .filter(F.col("latency_ms").isNotNull())
             .select("service",
                     F.expr("(unix_micros(ts) - pmod(unix_micros(ts), "
                            "86400000000)) DIV 86400000000")
                     .cast("long").alias("day"),
                     ms.alias("v"))
             .groupBy("service", "day", "v")
             .agg(F.count("*").cast("long").alias("c"))
             .localCheckpoint())
    rng = cells.groupBy().agg(
        int_div(F.min("day") + F.max("day"), F.lit(2)).alias("mid"))
    hist = (cells.crossJoin(F.broadcast(rng))
            .groupBy("service", "v")
            .agg(F.coalesce(F.sum(F.when(F.col("day") <= F.col("mid"),
                                         F.col("c"))), F.lit(0))
                 .cast("long").alias("ca"),
                 F.coalesce(F.sum(F.when(F.col("day") > F.col("mid"),
                                         F.col("c"))), F.lit(0))
                 .cast("long").alias("cb")))
    rep = wasserstein_from_counts(hist, group_cols=["service"])
    return rep.select("service",
                      F.col("n_a").alias("n_base"),
                      F.col("n_b").alias("n_curr"),
                      F.col("w1").alias("w1_ms"))


def _latency_wasserstein_sql() -> str:
    from ..operators.drift import wasserstein_report_sql

    body = wasserstein_report_sql("hist", ["service"])
    # rename the generic report columns to this query's aliases
    body = body.replace("SELECT service, n_a, n_b,",
                        "SELECT service, n_a AS n_base, n_b AS n_curr,") \
               .replace("END AS w1", "END AS w1_ms")
    return f"""
WITH {LOGS_CTE},
cells AS (
    SELECT service, epoch_us(ts) // 86400000000 AS day,
           CAST(floor(latency_ms + 0.5) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
    FROM logs WHERE latency_ms IS NOT NULL
    GROUP BY 1, 2, 3
),
rng AS (SELECT (min(day) + max(day)) // 2 AS mid FROM cells),
hist AS (
    SELECT service, v,
           CAST(coalesce(sum(CASE WHEN day <= mid THEN c END), 0)
                AS BIGINT) AS ca,
           CAST(coalesce(sum(CASE WHEN day > mid THEN c END), 0)
                AS BIGINT) AS cb
    FROM cells CROSS JOIN rng
    GROUP BY 1, 2
),
{body}
"""


def q_latency_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN did each service's latency regime change?  Pettitt's
    nonparametric changepoint test over the per-day latency means —
    the structural-break companion to the drift family:
    error_cusum_drift tracks a running deviation against a known
    baseline, latency_fdr_audit screens individual anomalous DAYS,
    this finds the single most plausible SPLIT POINT (rank-based, so a
    monotone latency transform can't move it) and says whether the
    before/after difference survives α = 5 %.

    Statistic, rank identity, and the integral significance rule:
    operators/drift.pettitt_changepoint.  change_day is the LAST day
    of the "before" segment (epoch days); u_sign +1 means latency
    ranked HIGHER before the change (a speedup), −1 a slowdown.

    Scale shape: one map-combinable (service, day) decimal-sum shuffle
    (the latency_fdr_audit days relation, localCheckpointed for the
    same multi-branch reason), then BOTH Pettitt windows run on the
    days×services-bounded checkpoint — the seasonal_decompose
    days-relation precedent, never an event-sized sort."""
    from ..operators.drift import pettitt_changepoint
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    days = (logs
            .select("service",
                    F.expr("(unix_micros(ts) - pmod(unix_micros(ts), "
                           "86400000000)) DIV 86400000000")
                    .cast("long").alias("day"),
                    F.col("latency_ms").cast("decimal(18,6)").alias("lat"))
            .groupBy("service", "day")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("lat").alias("s"))
            .select("service", "day",
                    (F.col("s").cast("double") / F.col("n").cast("double"))
                    .alias("day_mean"))
            .localCheckpoint())
    rep = pettitt_changepoint(days, group_cols=["service"],
                              time_col="day", value_col="day_mean")
    return rep.select("service", F.col("n").alias("n_days"),
                      F.col("change_t").alias("change_day"),
                      "k_stat", "u_sign", "shifted")


def _latency_changepoint_sql() -> str:
    from ..operators.drift import pettitt_report_sql

    return f"""
WITH {LOGS_CTE},
days AS (
    SELECT service, epoch_us(ts) // 86400000000 AS day,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(latency_ms AS DECIMAL(18,6))) AS s
    FROM logs GROUP BY 1, 2
),
series AS (
    SELECT service, day,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS day_mean
    FROM days
),
{pettitt_report_sql('series', ['service'], time_col='day',
                    value_col='day_mean', n_alias='n_days',
                    change_alias='change_day')}
"""


def q_latency_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does ANY service draw its latency from a different distribution
    than the others?  ONE Kruskal-Wallis H test across all services —
    the k-sample gate that belongs BEFORE the pairwise/two-sample
    drill-downs (latency_ks_drift, latency_wasserstein): running
    k·(k−1)/2 pairwise comparisons at α = 5 % each inflates the
    family-wide false-alarm rate (the latency_fdr_audit lesson, solved
    here by a single omnibus statistic instead of a correction).
    Rank-based, so it sees shift/spread/shape without normality, and a
    monotone latency transform cannot change it.

    Statistic, tie correction, midrank integerization, overflow
    bounds, and the dof-indexed χ² critical table:
    operators/drift.kruskal_from_counts.  Latencies enter on the
    whole-ms grid (floor(ms + 0.5), the latency_wasserstein
    convention — the grid is part of the statistic's definition and
    bounds the rank state by the latency RANGE).

    Scale shape: ONE event scan into (service, ms) cells — bounded by
    services × latency-range — localCheckpointed (the operator's
    three-branch CONTRACT); the global cumulative rank window runs on
    the DISTINCT-ms histogram (the seasonal_decompose bounded-relation
    precedent); the rank join-back is an equi-join on ms; the final
    assembly crosses two single-row aggregates."""
    from ..operators.drift import kruskal_from_counts
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    ms = F.floor(F.col("latency_ms") + F.lit(0.5)).cast("long")
    cells = (logs
             .filter(F.col("latency_ms").isNotNull())
             .select("service", ms.alias("v"))
             .groupBy("service", "v")
             .agg(F.count("*").cast("long").alias("c"))
             .localCheckpoint())
    return kruskal_from_counts(cells, group_col="service")


def _latency_kruskal_sql() -> str:
    from ..operators.drift import kruskal_report_sql

    return f"""
WITH {LOGS_CTE},
cells AS (
    SELECT service, CAST(floor(latency_ms + 0.5) AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS c
    FROM logs WHERE latency_ms IS NOT NULL
    GROUP BY 1, 2
),
{kruskal_report_sql('cells', group_col='service', value_col='v',
                    count_col='c')}
"""


def q_latency_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do ERROR events draw their latency from a different distribution
    than healthy traffic?  Per-service two-sample Kolmogorov-Smirnov D
    between error and non-error latency_ms, with the asymptotic α = 5 %
    rejection flag — the nonparametric companion to latency_anomalies
    (which assumes a z-scale) and latency_fdr_audit (which screens day
    MEANS): KS sees ANY distributional difference — shift, spread, or
    shape — without a normality assumption, the canonical "errors are
    slow-path" triage.

    Semantics, bounds, and the integral rejection rule live on
    operators/drift (VERDICT r11 next-round #4).  Sample a = error
    events, b = the rest; latencies are quantized by the monotone map
    floor(ms·10⁶ + 0.5) — exact for the fixture's ≤ 6-decimal doubles,
    and D is invariant under monotone maps anyway.

    Scale shape: ONE map-combinable (service, value) count is the only
    event-sized shuffle; the cumulative window runs on the per-service
    DISTINCT-VALUE histogram (the spend_gini value-domain discipline),
    partitioned by service — never a global sort."""
    from ..operators.drift import ks_two_sample
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    v = F.floor(F.col("latency_ms") * F.lit(1_000_000.0) + F.lit(0.5)) \
        .cast("long")
    return ks_two_sample(
        logs.select("service", "is_error", v.alias("v")),
        group_cols=["service"], value_col="v",
        side_a=F.col("is_error") == 1)


def _latency_ks_drift_sql() -> str:
    from ..operators.drift import ks_report_sql

    return f"""
WITH {LOGS_CTE},
hist AS (
    SELECT service,
           CAST(floor(latency_ms * 1000000.0 + 0.5) AS BIGINT) AS v,
           CAST(sum(is_error) AS BIGINT) AS ca,
           CAST(sum(1 - is_error) AS BIGINT) AS cb
    FROM logs WHERE latency_ms IS NOT NULL
    GROUP BY 1, 2
),
{ks_report_sql('hist', ['service'])}
"""


# --- Benjamini-Hochberg FDR audit over daily latency anomalies ---------------

#: BH target false-discovery rate.  0.25 (not the textbook 0.05)
#: because the Chebyshev p-values below are conservative by an order
#: of magnitude; the audit is a day-screening triage, not inference.
FDR_ALPHA_BP = 2500  # basis points, so the BH comparison stays integral

#: Chunking modulus for the per-day latency fold (the label_centroids
#: two-level discipline).
FDR_DAY_CHUNKS = 32


def q_latency_fdr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which (service, day) latency means are anomalous after
    MULTIPLE-TESTING correction?  Screening every service-day with a
    fixed z-cut inflates false alarms linearly in days×services; this
    runs the Benjamini-Hochberg step-up at FDR α = 25 % over
    distribution-free Chebyshev p-values with LEAVE-ONE-OUT
    studentization:

        z²_d = (mean_d − μ_−d)² / var_−d   (moments of the OTHER days),
        p_d  = min(1, 1/z²_d)              (two-sided Chebyshev bound),
        reject p_(1..k*) where k* = max{{k : p_(k) ≤ k·α/m}}.

    Leave-one-out is load-bearing, not a refinement: with the naive
    self-normalized z², Σ_d z²_d = m identically, so the k-th smallest
    p is ≥ k/m... making p_(k) ≤ k·α/m UNSATISFIABLE for any α < 1 —
    the naive audit can never reject anything (a spike day inflates
    the very variance it is scored against).  Excluding the tested day
    from μ and var breaks the self-masking: a lone 100x day scores
    z² → huge, p → ~0.  (Found by the planted-anomaly test; the naive
    form passed parity while being vacuous.)

    Per service: days tested, days flagged, and the most anomalous
    day's index and rounded p.

    Determinism: latency sums go through DECIMAL(18,6) (exact,
    order-free — the fixture's doubles carry ≤ 6 decimals); day means
    become doubles once, via one division of identical decimals; the
    per-service mean/var over day means folds SORTED day-mean lists
    (days-bounded); the BH comparison p ≤ k·α/m is evaluated as
    p·(m·10⁴) ≤ k·{FDR_ALPHA_BP} — the α denominator moved into
    integers so both engines compare identical doubles.  Ordering for
    the step-up ranks on (p, service, day) — a total order.

    Scale shape: the raw shuffle is ONE map-combinable
    (service, day) decimal-sum; everything after runs on the
    days×services-sized relation (global rank included — bounded,
    the seasonal_decompose days-relation precedent), and k* comes
    from a single-row broadcast, not a second global window."""
    from ..operators.logs import as_logs

    logs = as_logs(_t(spark, sf_dir, "events"))
    days = (logs
            # exact integer floor day bucket (ADVICE r11 #2; see
            # q_service_burstiness for the 2^53 rationale)
            .select("service",
                    F.expr("(unix_micros(ts) - pmod(unix_micros(ts), "
                           "86400000000)) DIV 86400000000")
                    .cast("long").alias("day"),
                    F.col("latency_ms").cast("decimal(18,6)").alias("lat"))
            .groupBy("service", "day")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("lat").alias("s"))
            .select("service", "day", "n",
                    (F.col("s").cast("double") / F.col("n").cast("double"))
                    .alias("day_mean"))
            # localCheckpointed: stats, the LOO scoring join, and the m
            # count all derive from this days x services-bounded
            # relation; without the barrier Catalyst re-plans the raw
            # event scan + decimal-sum once per branch (8 scans of the
            # 100 TB table for a days-sized table)
            .localCheckpoint())
    stats = (days.groupBy("service")
             .agg(F.array_sort(F.collect_list("day_mean")).alias("dm"))
             .select(
                 "service",
                 F.size("dm").cast("long").alias("_nd"),
                 F.aggregate("dm", F.lit(0.0), lambda a, x: a + x)
                 .alias("_s1"),
                 F.aggregate("dm", F.lit(0.0), lambda a, x: a + x * x)
                 .alias("_s2")))
    # leave-one-out moments from the per-service totals: the tested
    # day's mean is subtracted back out of S and Q, so no second pass
    # over the data is ever needed
    nd1 = (F.col("_nd") - 1).cast("double")
    x = F.col("day_mean")
    mu_loo = (F.col("_s1") - x) / nd1
    var_loo = (F.col("_s2") - x * x) / nd1 - mu_loo * mu_loo
    dv = x - mu_loo
    z2 = dv * dv / var_loo
    p = (F.when(F.col("_nd") < 2, F.lit(1.0))
         .when((var_loo <= 0) & (dv * dv > 0), F.lit(0.0))
         .when(var_loo <= 0, F.lit(1.0))
         .when(z2 > 1, 1.0 / z2)
         .otherwise(F.lit(1.0)))
    scored = (days.join(stats, "service")
              .select("service", "day", p.alias("p")))
    m_row = scored.groupBy().agg(F.count("*").cast("long").alias("m"))
    ranked = (scored.crossJoin(F.broadcast(m_row))
              .withColumn("k", F.row_number().over(
                  Window.orderBy("p", "service", "day")))
              .withColumn("_pass",
                          F.col("p") * (F.col("m") * 10_000)
                          .cast("double")
                          <= (F.col("k") * FDR_ALPHA_BP).cast("double")))
    kmax = (ranked.filter("_pass")
            .groupBy().agg(F.coalesce(F.max("k"), F.lit(0)).alias("_kmax")))
    flagged = (ranked.crossJoin(F.broadcast(kmax))
               .withColumn("_rej", F.col("k") <= F.col("_kmax")))
    best = Window.partitionBy("service").orderBy("p", "day")
    return (flagged
            .withColumn("_rn", F.row_number().over(best))
            .groupBy("service")
            .agg(F.count("*").cast("long").alias("n_days"),
                 F.sum(F.when(F.col("_rej"), 1).otherwise(0)).cast("long")
                 .alias("n_flagged"),
                 F.min(F.when(F.col("_rn") == 1, F.col("day"))).cast("long")
                 .alias("top_day"),
                 det_round(F.min("p"), 6).alias("min_p")))


def _latency_fdr_audit_sql() -> str:
    # {fn} maps each element AFTER the sort, mirroring the Spark side's
    # array_sort(collect_list(day_mean)) -> aggregate(.., acc + x*x):
    # sort by VALUE, then square.  Sorting the squares instead happens
    # to coincide for non-negative day means but would silently break
    # double-exact parity on a signed metric (ADVICE r11 #3).
    fold = ("list_reduce(list_prepend(0.0, "
            "list_transform(list_sort(list({v})), x -> {fn})), "
            "(acc, x) -> acc + x)")
    return f"""
WITH {LOGS_CTE},
days AS (
    SELECT service, epoch_us(ts) // 86400000000 AS day,
           CAST(count(*) AS BIGINT) AS n,
           sum(CAST(latency_ms AS DECIMAL(18,6))) AS s
    FROM logs GROUP BY 1, 2
),
dm AS (
    SELECT service, day, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS day_mean
    FROM days
),
stats AS (
    SELECT service,
           CAST(count(*) AS BIGINT) AS _nd,
           {fold.format(v='day_mean', fn='x')} AS _s1,
           {fold.format(v='day_mean', fn='x * x')} AS _s2
    FROM dm GROUP BY service
),
loo AS (
    SELECT d.service, d.day,
           CAST(_nd AS BIGINT) AS _nd,
           d.day_mean - (_s1 - d.day_mean) / CAST(_nd - 1 AS DOUBLE) AS dv,
           (_s2 - d.day_mean * d.day_mean) / CAST(_nd - 1 AS DOUBLE)
             - ((_s1 - d.day_mean) / CAST(_nd - 1 AS DOUBLE))
               * ((_s1 - d.day_mean) / CAST(_nd - 1 AS DOUBLE)) AS var_loo
    FROM dm d JOIN stats USING (service)
),
scored AS (
    SELECT service, day,
           CASE WHEN _nd < 2 THEN 1.0
                WHEN var_loo <= 0 AND dv * dv > 0 THEN 0.0
                WHEN var_loo <= 0 THEN 1.0
                WHEN dv * dv / var_loo > 1 THEN 1.0 / (dv * dv / var_loo)
                ELSE 1.0 END AS p
    FROM loo
),
ranked AS (
    SELECT *, (SELECT count(*) FROM scored) AS m,
           row_number() OVER (ORDER BY p, service, day) AS k
    FROM scored
),
km AS (
    SELECT coalesce(max(k), 0) AS _kmax FROM ranked
    WHERE p * CAST(m * 10000 AS DOUBLE)
          <= CAST(k * {FDR_ALPHA_BP} AS DOUBLE)
),
flagged AS (
    SELECT r.*, r.k <= km._kmax AS _rej,
           row_number() OVER (PARTITION BY service ORDER BY p, day) AS _rn
    FROM ranked r CROSS JOIN km
)
SELECT service, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN _rej THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(min(CASE WHEN _rn = 1 THEN day END) AS BIGINT) AS top_day,
       {det_round_sql('min(p)', 6)} AS min_p
FROM flagged GROUP BY service
"""


QUERIES: dict[str, QuerySpec] = {
    "sequence_matches": QuerySpec(q_sequence_matches,
                                  _sequence_matches_sql()),
    "service_burstiness": QuerySpec(q_service_burstiness,
                                    _service_burstiness_sql()),
    "latency_fdr_audit": QuerySpec(q_latency_fdr_audit,
                                   _latency_fdr_audit_sql()),
    "latency_ks_drift": QuerySpec(q_latency_ks_drift,
                                  _latency_ks_drift_sql()),
    "latency_changepoint": QuerySpec(q_latency_changepoint,
                                     _latency_changepoint_sql()),
    "latency_psi": QuerySpec(q_latency_psi, _latency_psi_sql()),
    "latency_wasserstein": QuerySpec(q_latency_wasserstein,
                                     _latency_wasserstein_sql()),
    "latency_kruskal": QuerySpec(q_latency_kruskal,
                                 _latency_kruskal_sql()),
    "conversion_survival": QuerySpec(q_conversion_survival,
                                     _conversion_survival_sql()),
    "conversion_logrank": QuerySpec(q_conversion_logrank,
                                    _conversion_logrank_sql()),
    "error_latency_auc": QuerySpec(q_error_latency_auc,
                                   _error_latency_auc_sql()),
    "error_rate_calibration": QuerySpec(q_error_rate_calibration,
                                        _error_rate_calibration_sql()),
    "cohort_retention": QuerySpec(q_cohort_retention,
                                  _cohort_retention_sql()),
    "dau_wau": QuerySpec(q_dau_wau, _dau_wau_sql()),
    "event_transitions": QuerySpec(q_event_transitions,
                                   _event_transitions_sql()),
    "latency_anomalies": QuerySpec(q_latency_anomalies,
                                   SQL_LATENCY_ANOMALIES),
    "latency_median_mad": QuerySpec(q_latency_median_mad,
                                    _latency_median_mad_sql()),
    "skew_audit": QuerySpec(q_skew_audit, _skew_audit_sql()),
    "zorder_locality": QuerySpec(q_zorder_locality, _zorder_locality_sql()),
    "metrics_reconciliation": QuerySpec(q_metrics_reconciliation,
                                        _metrics_reconciliation_sql()),
    "service_daily_gapfill": QuerySpec(q_service_daily_gapfill,
                                       _service_daily_gapfill_sql()),
    "alert_metrics_unpivot": QuerySpec(q_alert_metrics_unpivot,
                                       _alert_metrics_unpivot_sql()),
    "latency_bands_daily": QuerySpec(q_latency_bands_daily,
                                     _latency_bands_daily_sql()),
    "error_budget_burn": QuerySpec(q_error_budget_burn,
                                   _error_budget_burn_sql()),
    "funnel_conversion": QuerySpec(q_funnel_conversion, _funnel_sql()),
    "event_lateness_audit": QuerySpec(q_event_lateness_audit,
                                      SQL_EVENT_LATENESS_AUDIT),
    "error_interarrival": QuerySpec(q_error_interarrival,
                                    _error_interarrival_sql()),
    "rolling_user_activity": QuerySpec(q_rolling_user_activity,
                                       SQL_ROLLING_USER_ACTIVITY),
    "purchase_attribution": QuerySpec(q_purchase_attribution,
                                      SQL_PURCHASE_ATTRIBUTION),
    "click_attribution_asof": QuerySpec(q_click_attribution_asof,
                                        SQL_CLICK_ATTRIBUTION_ASOF),
    "error_click_pairs": QuerySpec(q_error_click_pairs,
                                   SQL_ERROR_CLICK_PAIRS),
    "segment_distinct_nations": QuerySpec(q_segment_distinct_nations,
                                          SQL_SEGMENT_DISTINCT_NATIONS),
    "segment_approx_distinct": QuerySpec(q_segment_approx_distinct,
                                         SQL_SEGMENT_APPROX_DISTINCT),
    "cube_returns": QuerySpec(q_cube_returns, SQL_CUBE_RETURNS),
    "salted_join_revenue": QuerySpec(q_salted_join_revenue,
                                     SQL_SALTED_JOIN_REVENUE),
    "latency_p95_approx": QuerySpec(q_latency_p95_approx,
                                    SQL_LATENCY_P95_APPROX),
    "error_burst_busy_overlap": QuerySpec(q_error_burst_busy_overlap,
                                          SQL_ERROR_BURST_BUSY_OVERLAP),
}
