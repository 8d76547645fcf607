"""Reference-parity queries (SURVEY §2): the Flink detectors, the stateful
escalation operators, and the notebook metrics queries, run as batch
queries over the ``events`` fixture (FIXTURES.md §4 mapping, window sizes
scaled from seconds to days to fit the fixture's event density — the
operators themselves are size-parameterized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.detmath import exact_round_div, exact_round_div_sql
from ..operators.logs import LOGS_CTE, as_logs, error_logs
from ..operators.detect import (CUSUM_H_MULT, DAY_REBASE,
                                error_rate_alerts, latency_p95)
from ..operators.escalate import (consecutive_breaches,
                                  escalate_every_nth_scalable,
                                  throttle_alerts)
from ..operators.metrics import alert_metrics, escalation_metrics
from ..sources.batch import load_table
from . import QuerySpec

DAY = 86400

#: Fixture-scaled thresholds (reference values: support 100, rate 0.02,
#: p95 limit 100 ms — flink/error_rate_detector.py:89,93,
#: flink/latency_slo_monitor.py:22-23).
SLIDING_MIN_SUPPORT = 20
SLIDING_RATE_THRESHOLD = 0.18
TUMBLING_MIN_SUPPORT = 10
TUMBLING_RATE_THRESHOLD = 0.2
P95_LIMIT = 130.0
LAT_CRITICAL = 100.0


def _logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return as_logs(load_table(spark, sf_dir, "events"))


def _errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error rows only, filtered pre-projection so the predicate reaches
    the parquet scan (operators/logs.py:error_logs)."""
    return error_logs(load_table(spark, sf_dir, "events"))


# --- 1. sliding-window error-rate detector (W1 + A1/A2 + P9/P10) -----------

def q_error_rate_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return error_rate_alerts(
        _logs(spark, sf_dir), size="2 days", slide="1 day",
        min_support=SLIDING_MIN_SUPPORT, threshold=SLIDING_RATE_THRESHOLD,
    )


# DuckDB oracle: a sliding window (size 2d, slide 1d) is the union of the
# k=0 and k=1 day-offset tumbling bucketings; every event lands in both.
SQL_ERROR_RATE_SLIDING = f"""
WITH {LOGS_CTE},
exploded AS (
    SELECT service, is_error,
           (CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) - o.k) * {DAY} AS window_start
    FROM logs CROSS JOIN (VALUES (0), (1)) o(k)
),
agg AS (
    SELECT service, window_start, window_start + {2 * DAY} AS window_end,
           count(*) AS total_logs,
           CAST(sum(is_error) AS BIGINT) AS error_logs
    FROM exploded GROUP BY service, window_start
)
SELECT service, window_start, window_end, total_logs, error_logs,
       CASE WHEN total_logs > 0
            THEN {exact_round_div_sql('error_logs', 'total_logs', 4)} ELSE 0.0 END AS error_rate,
       'ERROR_RATE_SPIKE' AS type, 'HIGH' AS severity
FROM agg
WHERE total_logs >= {SLIDING_MIN_SUPPORT}
  AND CASE WHEN total_logs > 0
           THEN {exact_round_div_sql('error_logs', 'total_logs', 4)} ELSE 0.0 END
      >= {SLIDING_RATE_THRESHOLD}
"""


# --- 2. tumbling-window error-rate detector (W2 variant) -------------------

def q_error_rate_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return error_rate_alerts(
        _logs(spark, sf_dir), size="1 day",
        min_support=TUMBLING_MIN_SUPPORT, threshold=TUMBLING_RATE_THRESHOLD,
    )


SQL_ERROR_RATE_TUMBLING = f"""
WITH {LOGS_CTE},
agg AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS window_start,
           count(*) AS total_logs,
           CAST(sum(is_error) AS BIGINT) AS error_logs
    FROM logs GROUP BY 1, 2
)
SELECT service, window_start, window_start + {DAY} AS window_end,
       total_logs, error_logs,
       CASE WHEN total_logs > 0 THEN {exact_round_div_sql('error_logs', 'total_logs', 4)} ELSE 0.0 END AS error_rate,
       'ERROR_RATE_SPIKE' AS type, 'HIGH' AS severity
FROM agg
WHERE total_logs >= {TUMBLING_MIN_SUPPORT}
  AND CASE WHEN total_logs > 0 THEN {exact_round_div_sql('error_logs', 'total_logs', 4)} ELSE 0.0 END >= {TUMBLING_RATE_THRESHOLD}
"""


# --- 3. exact nearest-rank-low p95 per tumbling window (A3 + W2) ------------

def q_latency_p95_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latency_p95(_logs(spark, sf_dir), size="1 day")


P95_SQL_EXPR = ("(list_sort(list(latency_ms)))"
                "[CAST(floor(0.95 * (count(latency_ms) - 1)) AS INT) + 1]")

SQL_LATENCY_P95_DAILY = f"""
WITH {LOGS_CTE}
SELECT service,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS window_start,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} + {DAY} AS window_end,
       {P95_SQL_EXPR} AS p95_latency,
       count(*) AS total_logs
FROM logs GROUP BY 1, 2, 3
"""


def q_error_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service OLS drift of daily error counts (operators/detect.
    error_trend_slope): level detectors say "too many errors today",
    this says "errors are climbing N/day" — all-integer sufficient
    statistics, sign-aware exact division."""
    from ..operators.detect import error_trend_slope

    return error_trend_slope(error_logs(load_table(spark, sf_dir, "events")))


SQL_ERROR_TREND_SLOPE = f"""
WITH {{LOGS_CTE}},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {{DAY_US}}) AS BIGINT) - {{REBASE}} AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
s AS (
    SELECT service, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM daily GROUP BY service
)
SELECT service, n_days, sy AS total_errors,
       CASE WHEN n_days > 1 THEN
           {{SLOPE}}
       END AS slope_per_day
FROM s
""".format(LOGS_CTE=LOGS_CTE, DAY_US=DAY * 1_000_000, REBASE=DAY_REBASE,
           SLOPE=exact_round_div_sql("n_days * sxy - sx * sy",
                                     "n_days * sxx - sx * sx", 6))


def q_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service Theil-Sen slope + Mann-Kendall S over daily error
    counts (operators/detect.robust_trend): the outlier-resistant trend
    pair — the median pairwise slope shrugs off single incident spikes
    that drag the OLS detector, and S is a pure order statistic."""
    from ..operators.detect import robust_trend

    return robust_trend(error_logs(load_table(spark, sf_dir, "events")))


def _robust_trend_sql() -> str:
    from ..functions.percentile import percentile_disc_sql
    from ..operators.detect import DAY_REBASE, ROBUST_TREND_MAX_DAYS
    med = percentile_disc_sql("CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE)", 0.5)
    return f"""
WITH {LOGS_CTE},
daily0 AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT)
           - {DAY_REBASE} AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
daily AS (
    -- trailing-window cap mirroring operators/detect.robust_trend_from_daily
    SELECT service, x, y FROM daily0
    QUALIFY row_number() OVER (PARTITION BY service ORDER BY x DESC)
            <= {ROBUST_TREND_MAX_DAYS}
),
dcnt AS (
    SELECT service, CAST(count(*) AS BIGINT) AS n_days
    FROM daily GROUP BY service
),
p AS (
    SELECT a.service AS service, b.y - a.y AS dy, b.x - a.x AS dx
    FROM daily a JOIN daily b ON a.service = b.service AND a.x < b.x
),
agg AS (
    SELECT service, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1
                         ELSE 0 END) AS BIGINT) AS mk_s,
           {med} AS theil_sen_slope
    FROM p GROUP BY service
)
SELECT d.service AS service, n_days,
       coalesce(n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
       coalesce(mk_s, CAST(0 AS BIGINT)) AS mk_s,
       theil_sen_slope
FROM dcnt d LEFT JOIN agg USING (service)
"""


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service Holt linear smoothing of daily error counts
    (operators/detect.holt_forecast): smoothed level + trend, the
    one-step-ahead forecast, and the in-sample one-step SSE — the
    forecasting complement to the change detectors."""
    from ..operators.detect import holt_forecast

    return holt_forecast(error_logs(load_table(spark, sf_dir, "events")))


def _holt_forecast_sql() -> str:
    from ..operators.detect import (DAY_REBASE, HOLT_ALPHA, HOLT_BETA,
                                    HOLT_ONE_MINUS_ALPHA,
                                    HOLT_ONE_MINUS_BETA)
    # literal-double constants, CAST('…' AS DOUBLE) so DuckDB parses the
    # identical binary64 instead of a DECIMAL (the detmath discipline)
    al = f"CAST('{HOLT_ALPHA!r}' AS DOUBLE)"
    cal = f"CAST('{HOLT_ONE_MINUS_ALPHA!r}' AS DOUBLE)"
    be = f"CAST('{HOLT_BETA!r}' AS DOUBLE)"
    cbe = f"CAST('{HOLT_ONE_MINUS_BETA!r}' AS DOUBLE)"
    z = "CAST('0.0' AS DOUBLE)"
    # NOT list_reduce: DuckDB evaluates a struct_pack lambda\'s fields
    # SEQUENTIALLY — acc.field references inside later fields see the
    # ALREADY-UPDATED earlier fields — so a coupled two-state recurrence
    # (b needs the OLD l while l is also updating) silently diverges
    # from the simultaneous-update fold Spark\'s F.aggregate computes
    # (measured: sse off by 2x on the fixture).  A recursive CTE has
    # unambiguous one-step-at-a-time semantics; each step\'s arithmetic
    # is written as the identical DAG the Spark lambda evaluates.
    # l_new is textually repeated inside the b update — the identical
    # subexpression the Spark fold recomputes, keeping the DAGs equal
    l_new = f"({al} * CAST(k.y AS DOUBLE) + {cal} * (r.l + r.b))"
    return f"""
WITH RECURSIVE logs AS (
    SELECT ts, \'svc-\' || CAST(user_id % 4 AS VARCHAR) AS service,
           CASE WHEN event_type = \'error\' THEN 1 ELSE 0 END AS is_error
    FROM events
),
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT)
           - {DAY_REBASE} AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
ranked AS (
    SELECT service, y,
           row_number() OVER (PARTITION BY service ORDER BY x) AS i
    FROM daily
),
nd AS (
    SELECT service, CAST(max(i) AS BIGINT) AS n_days FROM ranked
    GROUP BY service
),
rec AS (
    SELECT service, i, CAST(y AS DOUBLE) AS l, {z} AS b, {z} AS sse
    FROM ranked WHERE i = 1
    UNION ALL
    SELECT r.service, k.i,
           {l_new} AS l,
           {be} * ({l_new} - r.l) + {cbe} * r.b AS b,
           r.sse + (CAST(k.y AS DOUBLE) - (r.l + r.b))
                 * (CAST(k.y AS DOUBLE) - (r.l + r.b)) AS sse
    FROM rec r JOIN ranked k
      ON k.service = r.service AND k.i = r.i + 1
)
SELECT n.service AS service, n.n_days AS n_days, rec.l AS level,
       rec.b AS trend, rec.l + rec.b AS forecast_next, rec.sse AS sse
FROM nd n JOIN rec ON rec.service = n.service AND rec.i = n.n_days
"""


def q_changepoint_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service offline change-point localization (operators/detect.
    changepoint_split): the binary-segmentation first split of the
    daily error-count series — the postmortem "when did the level
    shift" to cusum_drift's online "a drift is in progress"."""
    from ..operators.detect import changepoint_split

    return changepoint_split(error_logs(load_table(spark, sf_dir, "events")))


def _changepoint_split_sql() -> str:
    from ..operators.detect import DAY_REBASE
    gain = ("CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(i AS DOUBLE)"
            " + CAST(total_errors - s1 AS DOUBLE)"
            " * CAST(total_errors - s1 AS DOUBLE)"
            " / (CAST(n_days AS DOUBLE) - CAST(i AS DOUBLE))"
            " - CAST(total_errors AS DOUBLE) * CAST(total_errors AS DOUBLE)"
            " / CAST(n_days AS DOUBLE)")
    return f"""
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT)
           - {DAY_REBASE} AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
tot AS (
    SELECT service, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS total_errors
    FROM daily GROUP BY service
),
pre AS (
    SELECT service, x,
           CAST(sum(y) OVER (PARTITION BY service ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS s1,
           row_number() OVER (PARTITION BY service ORDER BY x) AS i
    FROM daily
),
ranked AS (
    SELECT p.service AS service, p.x AS x, p.i AS i, p.s1 AS s1,
           {gain} AS gain,
           row_number() OVER (PARTITION BY p.service
                              ORDER BY {gain} DESC, p.x ASC) AS rk
    FROM pre p JOIN tot t ON p.service = t.service
    WHERE p.i < t.n_days
)
SELECT t.service AS service, t.n_days AS n_days,
       t.total_errors AS total_errors,
       r.x AS split_last_left_day,
       CAST(r.i AS BIGINT) AS left_days,
       r.s1 AS left_sum, r.gain AS gain
FROM tot t LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) r
  ON t.service = r.service
"""


def q_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service autocorrelation of daily error counts at calendar
    lags 1-3 (operators/detect.acf_daily): the periodicity audit behind
    the daily detectors — high lag-1 ACF means incidents cluster across
    consecutive days (smoothing forecasters apply), near-zero means
    days are independent."""
    from ..operators.detect import acf_daily

    return acf_daily(error_logs(load_table(spark, sf_dir, "events")))


def _acf_daily_sql() -> str:
    from ..operators.detect import ACF_LAGS, DAY_REBASE
    vals = ", ".join(f"({k})" for k in ACF_LAGS)
    # one identical double DAG per dialect: mu = sy/n, ssq = syy − sy·mu,
    # num = sxy − mu·(sh+st) + m·mu² — every input an exact BIGINT sum
    mu = "(CAST(b.sy AS DOUBLE) / CAST(b.n_days AS DOUBLE))"
    ssq = f"(CAST(b.syy AS DOUBLE) - CAST(b.sy AS DOUBLE) * {mu})"
    num = (f"(CAST(p.sxy AS DOUBLE) - {mu} * CAST(p.sh + p.st AS DOUBLE)"
           f" + CAST(p.n_pairs AS DOUBLE) * {mu} * {mu})")
    return f"""
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT)
           - {DAY_REBASE} AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
base AS (
    SELECT service, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM daily GROUP BY service
),
lagsp AS (SELECT CAST(k AS BIGINT) AS lag FROM (VALUES {vals}) t(k)),
pairs AS (
    SELECT h.service AS service, l.lag AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(h.y * t.y) AS BIGINT) AS sxy,
           CAST(sum(h.y) AS BIGINT) AS sh,
           CAST(sum(t.y) AS BIGINT) AS st
    FROM daily h CROSS JOIN lagsp l
    JOIN daily t ON t.service = h.service AND t.x = h.x + l.lag
    GROUP BY 1, 2
)
SELECT b.service AS service, l.lag AS lag, b.n_days AS n_days,
       COALESCE(p.n_pairs, CAST(0 AS BIGINT)) AS n_pairs,
       CASE WHEN p.n_pairs > 0 AND {ssq} <> 0.0
            THEN {num} / {ssq} END AS acf
FROM base b CROSS JOIN lagsp l
LEFT JOIN pairs p ON p.service = b.service AND p.lag = l.lag
"""


def q_dow_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service day-of-week anomaly report (operators/detect.
    dow_anomalies): every observed day vs its same-weekday mean with an
    exact-integer 1.5× flag — the seasonality-aware complement to the
    flat-threshold detectors."""
    from ..operators.detect import dow_anomalies

    return dow_anomalies(error_logs(load_table(spark, sf_dir, "events")))


def _dow_anomalies_sql() -> str:
    from ..operators.detect import (DOW_ANOM_DEN, DOW_ANOM_MIN_OBS,
                                    DOW_ANOM_NUM)
    from ..functions.detmath import exact_round_div_sql
    return f"""
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
dailyd AS (SELECT service, x, y, (x + 3) % 7 AS dow FROM daily),
prof AS (
    SELECT service, dow, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS sy
    FROM dailyd GROUP BY 1, 2
)
SELECT d.service AS service, d.x AS day_epoch, d.dow AS dow, d.y AS y,
       p.n AS dow_days,
       {exact_round_div_sql('p.sy', 'p.n', 4)} AS dow_mean,
       {exact_round_div_sql('d.y * p.n', 'p.sy', 4)} AS ratio,
       ({DOW_ANOM_DEN} * d.y * p.n > {DOW_ANOM_NUM} * p.sy
        AND p.n >= {DOW_ANOM_MIN_OBS}) AS is_anomalous
FROM dailyd d JOIN prof p ON d.service = p.service AND d.dow = p.dow
"""


def q_error_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service one-sided CUSUM change-point detector over daily
    error counts (operators/detect.cusum_drift): catches sustained
    small level shifts that sit below the reference's instantaneous
    rate thresholds and lead the OLS trend — computed iteration-free
    via the prefix-sum identity over two stacked window frames."""
    from ..operators.detect import cusum_drift

    return cusum_drift(error_logs(load_table(spark, sf_dir, "events")))


SQL_ERROR_CUSUM_DRIFT = """
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY_US}) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
d1 AS (
    SELECT service, x, y,
           CAST(sum(y) OVER (PARTITION BY service) AS BIGINT)
           // CAST(count(*) OVER (PARTITION BY service) AS BIGINT) AS k
    FROM daily
),
d2 AS (
    SELECT service, x, y, k,
           CAST(sum(y - k) OVER (PARTITION BY service ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS s
    FROM d1
),
d3 AS (
    SELECT service, x, y, k,
           s - least(CAST(0 AS BIGINT),
                     CAST(min(s) OVER (PARTITION BY service ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                          AS BIGINT)) AS cusum
    FROM d2
)
SELECT service,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(y) AS BIGINT) AS total_errors,
       CAST(max(k) AS BIGINT) AS k_ref,
       CAST(max(cusum) AS BIGINT) AS max_cusum,
       CAST(sum(CASE WHEN cusum > {H} * k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_alarm_days,
       CAST(min(CASE WHEN cusum > {H} * k THEN x END) AS BIGINT)
           AS first_alarm_day
FROM d3 GROUP BY service
""".format(LOGS_CTE=LOGS_CTE, DAY_US=DAY * 1_000_000, H=CUSUM_H_MULT)


def q_hdr_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service p50/p95/p99 from the HDR log-bucketed histogram
    sketch (operators/sketches.hdr_cells) NEXT TO the exact values —
    the quantile-sketch audit.  The exact side uses the value-domain
    histogram (order_fulfillment_lag's two-phase shape: bounded by
    distinct centi-ms values); the sketch side is the FIXED <=328-cell
    histogram that stays bounded even when the value domain is
    continuous — its estimate is the containing bucket's lower bound,
    guaranteed est <= exact < est·(1 + 1/8) above the linear region
    (gated in tests/test_round7_ops.py).

    Scale shape: each side is one map-side-combined groupBy plus
    cumulative windows over its compact histogram; nothing sorts or
    buffers raw events.  Cells merge by addition (CMS-style), so the
    sketch is partition-, corpus-, and stream-mergeable.

    Determinism: centi-ms via the det_round DAG; everything after is
    BIGINT (ladder bucketing, nearest-rank picks, exact inverse).
    """
    from pyspark.sql import Window

    from ..functions.detmath import int_div
    from ..operators.sketches import hdr_lower

    logs = _logs(spark, sf_dir)
    vals = (logs.filter(F.col("latency_ms").isNotNull())
            .select("service",
                    F.floor(F.col("latency_ms") * F.lit(100.0)
                            + F.lit(0.5)).cast("long").alias("c"))
            .filter(F.col("c") >= 1))

    def ranked(hist: DataFrame, val_col: str) -> DataFrame:
        w_cum = Window.partitionBy("service").orderBy(val_col)
        w_tot = Window.partitionBy("service")
        wdf = (hist.withColumn("cum", F.sum("cnt").over(w_cum))
               .withColumn("tot", F.sum("cnt").over(w_tot)))

        def pick(q_pct: int):
            r = int_div(F.lit(q_pct) * (F.col("tot") - 1), F.lit(100)) + 1
            return F.min(F.when(F.col("cum") >= r, F.col(val_col)))

        return wdf.groupBy("service").agg(
            F.max("tot").alias("n"),
            F.count("*").cast("long").alias("n_cells"),
            pick(50).alias("q50"), pick(95).alias("q95"),
            pick(99).alias("q99"))

    # ONE pass over the logs: this AUDIT computes the exact value
    # histogram anyway, and HDR cells are a pure function of it
    # (re-bucket histogram rows, weight by cnt) — so the sketch side
    # re-aggregates the compact histogram instead of re-scanning
    # events.  A standalone sketch build uses hdr_cells (one pass, no
    # exact histogram).
    ex_hist = (vals.groupBy("service", "c")
               .agg(F.count("*").cast("long").alias("cnt")))
    from ..operators.sketches import hdr_bucket
    sk_hist = (ex_hist
               .select("service", hdr_bucket(F.col("c")).alias("bucket"),
                       "cnt")
               .groupBy("service", "bucket")
               .agg(F.sum("cnt").cast("long").alias("cnt")))
    sk = ranked(sk_hist, "bucket")
    ex = ranked(ex_hist, "c")
    return (
        sk.alias("s").join(ex.alias("e"), "service")
        .select(
            "service",
            F.col("s.n").alias("n_events"),
            F.col("s.n_cells").alias("n_sketch_cells"),
            F.col("e.n_cells").alias("n_exact_cells"),
            hdr_lower(F.col("s.q50")).alias("est_p50_cs"),
            F.col("e.q50").alias("exact_p50_cs"),
            hdr_lower(F.col("s.q95")).alias("est_p95_cs"),
            F.col("e.q95").alias("exact_p95_cs"),
            hdr_lower(F.col("s.q99")).alias("est_p99_cs"),
            F.col("e.q99").alias("exact_p99_cs"),
        )
    )


def _hdr_latency_quantiles_sql() -> str:
    from ..operators.sketches import hdr_bucket_sql, hdr_lower_sql

    def ranked(src: str, val: str) -> str:
        def pick(q):
            return (f"CAST(min(CASE WHEN cum >= ({q} * (tot - 1)) // 100"
                    f" + 1 THEN {val} END) AS BIGINT)")
        return f"""
    SELECT service, CAST(max(tot) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           {pick(50)} AS q50, {pick(95)} AS q95, {pick(99)} AS q99
    FROM (SELECT service, {val}, cnt,
                 CAST(sum(cnt) OVER (PARTITION BY service ORDER BY {val})
                      AS BIGINT) AS cum,
                 CAST(sum(cnt) OVER (PARTITION BY service) AS BIGINT) AS tot
          FROM {src})
    GROUP BY service"""

    return f"""
WITH {LOGS_CTE},
vals AS (
    SELECT service,
           CAST(floor(latency_ms * 100.0 + 0.5) AS BIGINT) AS c
    FROM logs
    WHERE latency_ms IS NOT NULL
      AND CAST(floor(latency_ms * 100.0 + 0.5) AS BIGINT) >= 1
),
sk_hist AS (
    SELECT service, {hdr_bucket_sql('c')} AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM vals GROUP BY 1, 2
),
ex_hist AS (
    SELECT service, c, CAST(count(*) AS BIGINT) AS cnt
    FROM vals GROUP BY 1, 2
),
sk AS ({ranked('sk_hist', 'bucket')}),
ex AS ({ranked('ex_hist', 'c')})
SELECT sk.service,
       sk.n AS n_events,
       sk.n_cells AS n_sketch_cells,
       ex.n_cells AS n_exact_cells,
       {hdr_lower_sql('sk.q50')} AS est_p50_cs,
       ex.q50 AS exact_p50_cs,
       {hdr_lower_sql('sk.q95')} AS est_p95_cs,
       ex.q95 AS exact_p95_cs,
       {hdr_lower_sql('sk.q99')} AS est_p99_cs,
       ex.q99 AS exact_p99_cs
FROM sk JOIN ex ON sk.service = ex.service
"""


def q_latency_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily p95 per service (operators/metrics.
    ewma_p95_daily): α=¼ integer recurrence over the exact daily p95
    series — the trend line the SLO dashboard plots over the raw p95."""
    from ..operators.metrics import ewma_p95_daily

    return ewma_p95_daily(latency_p95(_logs(spark, sf_dir), size="1 day"))


SQL_LATENCY_EWMA_DAILY = f"""
WITH {{LOGS_CTE}},
p95 AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {{DAY_US}}) AS BIGINT) * {{DAY}} AS window_start,
           CAST(floor({{P95}}) AS BIGINT) AS p95_latency
    FROM logs GROUP BY 1, 2
),
agg AS (
    SELECT service, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(p95_latency) AS BIGINT) AS s,
           list(p95_latency ORDER BY window_start) AS xs
    FROM p95 GROUP BY service
)
SELECT service, n_days,
       {{MEAN}} AS mean_p95,
       CAST(list_reduce(list_prepend(CAST(NULL AS BIGINT), xs),
                        (acc, x) -> CASE WHEN acc IS NULL THEN x
                                         ELSE (x + 3 * acc) // 4 END)
            AS BIGINT) AS ewma_p95
FROM agg
""".format(LOGS_CTE=LOGS_CTE, DAY_US=DAY * 1_000_000, DAY=DAY,
           P95=P95_SQL_EXPR,
           MEAN=exact_round_div_sql("s", "n_days", 4))


# --- 4. consecutive-breach SLO detector (A10/W10-W12, batch islands) --------

def q_slo_breach_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    p95 = latency_p95(_logs(spark, sf_dir), size="1 day")
    out = consecutive_breaches(p95, breach=F.col("p95_latency") > P95_LIMIT)
    return out.select("service", "window_start", "window_end", "p95_latency",
                      "total_logs", "breach_count", "type", "severity")


SQL_SLO_BREACH_STREAKS = f"""
WITH {LOGS_CTE},
p95 AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS window_start,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} + {DAY} AS window_end,
           {P95_SQL_EXPR} AS p95_latency,
           count(*) AS total_logs
    FROM logs GROUP BY 1, 2, 3
),
flagged AS (
    SELECT *, CASE WHEN p95_latency > {P95_LIMIT} THEN 1 ELSE 0 END AS is_breach FROM p95
),
islands AS (
    SELECT *,
           row_number() OVER (PARTITION BY service ORDER BY window_start)
         - row_number() OVER (PARTITION BY service, is_breach ORDER BY window_start) AS island
    FROM flagged
),
streaks AS (
    SELECT *, row_number() OVER (PARTITION BY service, island, is_breach
                                 ORDER BY window_start) AS streak
    FROM islands
)
SELECT service, window_start, window_end, p95_latency, total_logs,
       3 AS breach_count, 'LATENCY_SLO_BREACH' AS type, 'CRITICAL' AS severity
FROM streaks WHERE is_breach = 1 AND streak % 3 = 0
"""


# --- 5. every-3rd-alert escalation (A11/W9, batch row_number) ---------------

def q_escalations_every_third(spark: SparkSession, sf_dir: str) -> DataFrame:
    alerts = (
        _errors(spark, sf_dir)
        .select("event_id", "service", "ts", F.lit("HIGH").alias("severity"))
    )
    # two-phase prefix-count variant: same output as the serial window,
    # but parallelism is services x day-buckets instead of services
    return escalate_every_nth_scalable(alerts).select(
        "event_id", "service", F.col("alert_seq").cast("long").alias("alert_seq"),
        "severity", "escalation_reason",
    )


SQL_ESCALATIONS_EVERY_THIRD = f"""
WITH {LOGS_CTE},
alerts AS (SELECT event_id, service, ts FROM logs WHERE is_error = 1),
seq AS (
    SELECT event_id, service,
           row_number() OVER (PARTITION BY service ORDER BY ts, event_id) AS alert_seq
    FROM alerts
)
SELECT event_id, service, CAST(alert_seq AS BIGINT) AS alert_seq,
       CASE WHEN alert_seq % 3 = 0 THEN 'ESCALATED' ELSE 'HIGH' END AS severity,
       CASE WHEN alert_seq % 3 = 0 THEN 'MULTIPLE_INCIDENTS' END AS escalation_reason
FROM seq
"""


# --- 6/7. the notebook metrics queries (A4-A8) ------------------------------

#: Deterministic alert derivation shared by Spark and oracle: error logs
#: become alerts; high-latency ones play LATENCY_SLO_BREACH / CRITICAL with
#: an int p95 (floor: Spark double->int cast truncates, DuckDB rounds, so
#: floor() is applied explicitly on both sides).
ALERTS_CTE = f"""
alerts AS (
    SELECT ts, service,
           CASE WHEN latency_ms > {LAT_CRITICAL} THEN 'LATENCY_SLO_BREACH'
                ELSE 'ERROR_RATE_SPIKE' END AS type,
           CASE WHEN latency_ms > {LAT_CRITICAL} THEN 'CRITICAL' ELSE 'HIGH' END AS severity,
           CASE WHEN latency_ms > {LAT_CRITICAL}
                THEN CAST(floor(latency_ms) AS INT) END AS p95_latency,
           CASE WHEN latency_ms > {LAT_CRITICAL} THEN 3 END AS breach_count
    FROM logs WHERE is_error = 1
)
"""


def _derived_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    crit = F.col("latency_ms") > LAT_CRITICAL
    return (
        _errors(spark, sf_dir)
        .select(
            "ts", "service",
            F.when(crit, F.lit("LATENCY_SLO_BREACH"))
             .otherwise(F.lit("ERROR_RATE_SPIKE")).alias("type"),
            F.when(crit, F.lit("CRITICAL")).otherwise(F.lit("HIGH")).alias("severity"),
            F.when(crit, F.floor("latency_ms").cast("int")).alias("p95_latency"),
            F.when(crit, F.lit(3)).alias("breach_count"),
        )
    )


def q_alert_metrics_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alert_metrics(_derived_alerts(spark, sf_dir), size="1 day")


SQL_ALERT_METRICS_DAILY = f"""
WITH {LOGS_CTE},
{ALERTS_CTE}
SELECT service,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS window_start,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} + {DAY} AS window_end,
       count(*) AS total_alerts,
       count(CASE WHEN type = 'LATENCY_SLO_BREACH' THEN 1 END) AS latency_breaches,
       count(CASE WHEN type = 'ERROR_RATE_SPIKE' THEN 1 END) AS error_spikes,
       CASE WHEN count(p95_latency) > 0 THEN {exact_round_div_sql('sum(p95_latency)', 'count(p95_latency)', 4)} END AS avg_p95_latency,
       max(breach_count) AS max_breach_count,
       CASE WHEN count(*) > 0 THEN
             {exact_round_div_sql("sum(CASE WHEN severity = 'CRITICAL' THEN 1 ELSE 0 END)", 'count(*)', 4)} ELSE 0.0 END AS critical_ratio
FROM alerts GROUP BY 1, 2, 3
"""


def q_escalation_metrics_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    crit = F.col("latency_ms") > LAT_CRITICAL
    alerts = (
        _errors(spark, sf_dir)
        .select(
            "event_id", "ts", "service",
            F.when(crit, F.lit("CRITICAL")).otherwise(F.lit("HIGH")).alias("severity"),
            F.when(crit, F.floor("latency_ms").cast("int")).alias("p95_latency"),
        )
    )
    esc = escalate_every_nth_scalable(alerts)
    return escalation_metrics(esc, size="1 day")


SQL_ESCALATION_METRICS_DAILY = f"""
WITH {LOGS_CTE},
alerts AS (
    SELECT event_id, ts, service,
           CASE WHEN latency_ms > {LAT_CRITICAL} THEN 'CRITICAL' ELSE 'HIGH' END AS severity,
           CASE WHEN latency_ms > {LAT_CRITICAL}
                THEN CAST(floor(latency_ms) AS INT) END AS p95_latency
    FROM logs WHERE is_error = 1
),
esc AS (
    SELECT *,
           row_number() OVER (PARTITION BY service ORDER BY ts, event_id) AS alert_seq
    FROM alerts
),
enriched AS (
    SELECT ts, service, p95_latency,
           CASE WHEN alert_seq % 3 = 0 THEN 'ESCALATED' ELSE severity END AS severity,
           CASE WHEN alert_seq % 3 = 0 THEN 'MULTIPLE_INCIDENTS' END AS escalation_reason
    FROM esc
)
SELECT service,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS window_start,
       CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} + {DAY} AS window_end,
       count(*) AS total_events,
       count(CASE WHEN severity = 'ESCALATED' THEN 1 END) AS escalated,
       count(CASE WHEN escalation_reason = 'MULTIPLE_INCIDENTS' THEN 1 END)
           AS multiple_incident_escalations,
       CASE WHEN count(p95_latency) > 0 THEN {exact_round_div_sql('sum(p95_latency)', 'count(p95_latency)', 4)} END AS avg_p95_latency,
       CASE WHEN count(*) > 0 THEN
             {exact_round_div_sql("sum(CASE WHEN severity = 'ESCALATED' THEN 1 ELSE 0 END)", 'count(*)', 4)} ELSE 0.0 END AS escalation_ratio
FROM enriched GROUP BY 1, 2, 3
"""


# --- 8. heterogeneous alert union + normalization (§1.2b + §2.5) ------------

def q_alert_union_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two detectors write different JSON shapes to one topic: the
    error-rate producer emits numerics as strings
    (flink/error_rate_detector.py:99-102), the SLO producer as ints.  We
    union-by-name and normalize with try_cast at ingest (SURVEY §7.3 #4)."""
    logs = _errors(spark, sf_dir)
    day_start = (F.unix_timestamp("ts") / DAY).cast("long") * DAY
    spike_shape = logs.filter(F.col("latency_ms") <= LAT_CRITICAL).select(
        "service",
        F.lit("ERROR_RATE_SPIKE").alias("type"),
        day_start.cast("string").alias("window_start"),   # string-typed numeric
        F.lit(None).cast("int").alias("p95_latency"),
    )
    slo_shape = logs.filter(F.col("latency_ms") > LAT_CRITICAL).select(
        "service",
        F.lit("LATENCY_SLO_BREACH").alias("type"),
        day_start.alias("window_start"),                   # long-typed
        F.floor("latency_ms").cast("int").alias("p95_latency"),
    )
    unioned = spike_shape.unionByName(
        slo_shape.withColumn("window_start", F.col("window_start").cast("string")),
        allowMissingColumns=True,
    )
    normalized = unioned.withColumn(
        "window_start", F.expr("try_cast(window_start AS BIGINT)"))
    return (
        normalized.groupBy("type")
        .agg(
            F.count("*").alias("n_alerts"),
            F.min("window_start").alias("min_window_start"),
            F.max("window_start").alias("max_window_start"),
            F.count("p95_latency").alias("n_with_p95"),
        )
    )


SQL_ALERT_UNION_NORMALIZED = f"""
WITH {LOGS_CTE},
spikes AS (
    SELECT service, 'ERROR_RATE_SPIKE' AS type,
           CAST(CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS VARCHAR)
               AS window_start,
           CAST(NULL AS INT) AS p95_latency
    FROM logs WHERE is_error = 1 AND latency_ms <= {LAT_CRITICAL}
),
slo AS (
    SELECT service, 'LATENCY_SLO_BREACH' AS type,
           CAST(CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) * {DAY} AS VARCHAR)
               AS window_start,
           CAST(floor(latency_ms) AS INT) AS p95_latency
    FROM logs WHERE is_error = 1 AND latency_ms > {LAT_CRITICAL}
),
unioned AS (SELECT * FROM spikes UNION ALL SELECT * FROM slo),
normalized AS (SELECT service, type, TRY_CAST(window_start AS BIGINT) AS window_start,
                      p95_latency FROM unioned)
SELECT type, count(*) AS n_alerts,
       min(window_start) AS min_window_start,
       max(window_start) AS max_window_start,
       count(p95_latency) AS n_with_p95
FROM normalized GROUP BY type
"""


# --- 9. JSON property extraction (P1 on the props column) -------------------

def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            exact_round_div(F.sum("k"), F.count("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_PROPS_JSON_EXTRACT = f"""
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CASE WHEN count(CAST(json_extract_string(props, '$.k') AS INT)) > 0 THEN
       {exact_round_div_sql("sum(CAST(json_extract_string(props, '$.k') AS INT))",
                            "count(CAST(json_extract_string(props, '$.k') AS INT))", 4)}
       END AS avg_k,
       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


def q_synthetic_log_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's synthetic producer (kafka/log_producer.py:18-64)
    as a deterministic JVM-side generator: per-(service, level, spike)
    event counts and latency mass over 10k ticks.  The DuckDB oracle
    regenerates the identical stream from range() + the same md5 draws —
    proving the workload (error rates, 10x spike windows, 3x spike
    latency) is reproduced exactly, not just in distribution."""
    from ..sources.producer import synthetic_log_batch

    logs = synthetic_log_batch(spark, n=10_000)
    return (
        logs.groupBy("service", "level", ((F.col("ts_s") % 60) < 5).alias("spike"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum("latency_ms").alias("sum_latency_ms"),
        )
    )


_MD5L = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"

SQL_SYNTHETIC_LOG_PROFILE = f"""
WITH t AS (SELECT range AS v FROM range(10000)),
logs AS (
    SELECT (1700000000 + v) AS ts_s,
           (['auth-service', 'payment-service', 'order-service',
             'notification-service'])[CAST(v % 4 AS INT) + 1] AS service,
           CASE WHEN {_MD5L.format(x="v || ':lvl'")} % 10000
                     < (CASE WHEN (1700000000 + v) % 60 < 5 THEN 10 ELSE 1 END)
                       * ([50, 2000, 100, 3000])[CAST(v % 4 AS INT) + 1]
                THEN 'ERROR' ELSE 'INFO' END AS level,
           greatest(10,
                    (CASE WHEN (1700000000 + v) % 60 < 5 THEN 3 ELSE 1 END)
                      * ([50, 120, 80, 40])[CAST(v % 4 AS INT) + 1]
                    + {_MD5L.format(x="v || ':lat'")} % 61 - 30) AS latency_ms
    FROM t
)
SELECT service, level, (ts_s % 60) < 5 AS spike,
       count(*) AS n_events,
       CAST(sum(latency_ms) AS BIGINT) AS sum_latency_ms
FROM logs GROUP BY service, level, spike
"""


# --- correlated incidents (both detectors co-firing) --------------------------

def q_correlated_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-days where BOTH detectors fire: the error-rate alert
    (flink/error_rate_detector.py's gates) joined with an over-limit
    daily p95 (flink/latency_slo_monitor.py's SLO predicate) on
    (service, window) — the incident-correlation view an on-call
    actually triages from, which the reference's topic-per-detector
    topology leaves implicit in downstream tooling.

    Scale shape: both sides are (service, window)-grained aggregates
    (already shuffled on that key), so the join is over alert-sized
    tables co-partitioned by construction — never a raw-event join.
    """
    rate = error_rate_alerts(
        _logs(spark, sf_dir), size="1 day",
        min_support=TUMBLING_MIN_SUPPORT, threshold=TUMBLING_RATE_THRESHOLD,
    ).select("service", "window_start", "window_end",
             "total_logs", "error_rate")
    # p95 stays the exact order-statistic double: an int cast here would
    # hit the truncate-vs-round cross-engine split (Spark CAST truncates,
    # DuckDB rounds) — the identical sample value needs no conversion
    p95 = (latency_p95(_logs(spark, sf_dir), size="1 day")
           .filter(F.col("p95_latency") > P95_LIMIT)
           .select("service", "window_start", "p95_latency"))
    return (
        rate.join(p95, ["service", "window_start"])
        .select("service", "window_start", "window_end", "total_logs",
                "error_rate", "p95_latency",
                F.lit("CORRELATED_INCIDENT").alias("type"),
                F.lit("CRITICAL").alias("severity"))
    )


def _correlated_incidents_sql() -> str:
    return f"""
WITH rate AS ({SQL_ERROR_RATE_TUMBLING}),
p95 AS ({SQL_LATENCY_P95_DAILY})
SELECT r.service, r.window_start, r.window_end, r.total_logs,
       r.error_rate,
       p.p95_latency,
       'CORRELATED_INCIDENT' AS type, 'CRITICAL' AS severity
FROM rate r JOIN p95 p
  ON r.service = p.service AND r.window_start = p.window_start
WHERE p.p95_latency > {P95_LIMIT}
"""


# --- log template mining (Drain-style message clustering) --------------------

#: Ticks generated for the template-mining corpus.
TEMPLATE_TICKS = 20_000


def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-style log template mining over the synthetic producer's
    ``message`` field (SURVEY §1.2a — the reference ships 5+5 canned
    messages, kafka/log_producer.py:27-41): mask the variable parts
    (request ids, hosts, numbers) with typed placeholders, then group —
    recovering each canned template with its level-relative frequency.
    The everyday triage query ("what KINDS of errors are we seeing?")
    the reference's print-trace observability cannot answer.

    Scale shape: masking is three codegen'd regexp_replace passes in the
    scan projection; the groupBy key is the (level, template) pair —
    template cardinality, not message cardinality, crosses the exchange
    (map-side partial aggregation collapses per-partition duplicates),
    so the shuffle carries ~tens of rows at any corpus size.  Shares
    via detmath.exact_round_div over exact BIGINT counts.
    """
    from ..functions.detmath import exact_round_div
    from ..sources.producer import synthetic_log_batch

    logs = synthetic_log_batch(spark, n=TEMPLATE_TICKS)
    tpl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("message"),
                             r"req-[0-9a-f]{8}", "<id>"),
            r"node-[0-9]", "<host>"),
        r"[0-9]+", "<num>")
    grouped = (
        logs.select("level", tpl.alias("template"))
        .groupBy("level", "template")
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    totals = grouped.groupBy("level").agg(
        F.sum("n_events").cast("long").alias("_tot"))
    return (
        grouped.join(F.broadcast(totals), "level")
        .select("level", "template", "n_events",
                exact_round_div(F.col("n_events"), F.col("_tot"), 4)
                    .alias("level_share"))
    )


def _log_templates_sql() -> str:
    from ..functions.detmath import exact_round_div_sql

    return f"""
WITH t AS (SELECT range AS v FROM range({TEMPLATE_TICKS})),
base AS (
    SELECT v,
           'node-' || CAST(v % 3 + 1 AS VARCHAR) AS host,
           CASE WHEN {_MD5L.format(x="v || ':lvl'")} % 10000
                     < (CASE WHEN (1700000000 + v) % 60 < 5 THEN 10 ELSE 1 END)
                       * ([50, 2000, 100, 3000])[CAST(v % 4 AS INT) + 1]
                THEN 'ERROR' ELSE 'INFO' END AS level,
           greatest(10,
                    (CASE WHEN (1700000000 + v) % 60 < 5 THEN 3 ELSE 1 END)
                      * ([50, 120, 80, 40])[CAST(v % 4 AS INT) + 1]
                    + {_MD5L.format(x="v || ':lat'")} % 61 - 30) AS latency_ms,
           'req-' || substr(md5(v || ':req'), 1, 8) AS request_id,
           CAST({_MD5L.format(x="v || ':msg'")} % 5 AS INT) AS mi
    FROM t
),
msgs AS (
    SELECT level,
           CASE WHEN level = 'ERROR' THEN
               CASE mi
                   WHEN 0 THEN 'db connection timeout after '
                               || CAST(latency_ms AS VARCHAR) || ' ms'
                   WHEN 1 THEN 'failed to process request ' || request_id
                   WHEN 2 THEN 'upstream dependency returned 503'
                   WHEN 3 THEN 'cache miss storm detected on ' || host
                   ELSE 'unhandled exception in worker thread'
               END
           ELSE
               CASE mi
                   WHEN 0 THEN 'request ' || request_id || ' completed in '
                               || CAST(latency_ms AS VARCHAR) || ' ms'
                   WHEN 1 THEN 'health check ok on ' || host
                   WHEN 2 THEN 'cache refreshed successfully'
                   WHEN 3 THEN 'user session started'
                   ELSE 'scheduled job finished'
               END
           END AS message
    FROM base
),
tpl AS (
    SELECT level,
           regexp_replace(
               regexp_replace(
                   regexp_replace(message, 'req-[0-9a-f]{{8}}', '<id>', 'g'),
                   'node-[0-9]', '<host>', 'g'),
               '[0-9]+', '<num>', 'g') AS template
    FROM msgs
),
grouped AS (
    SELECT level, template, CAST(count(*) AS BIGINT) AS n_events
    FROM tpl GROUP BY level, template
),
totals AS (
    SELECT level, CAST(sum(n_events) AS BIGINT) AS tot
    FROM grouped GROUP BY level
)
SELECT g.level, g.template, g.n_events,
       {exact_round_div_sql('g.n_events', 't.tot', 4)} AS level_share
FROM grouped g JOIN totals t ON g.level = t.level
"""


# --- alert throttling (head-truncation dual of every-nth escalation) --------

THROTTLE_LIMIT = 2


def q_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {THROTTLE_LIMIT} error alerts per (service, day), rest
    dropped (operators/escalate.py:throttle_alerts) — the alert-fatigue
    limiter the reference's unthrottled detectors lack."""
    alerts = _errors(spark, sf_dir).select(
        "service", "ts", "event_id", "latency_ms")
    return (
        throttle_alerts(alerts, limit=THROTTLE_LIMIT)
        .select("service", "bucket_start", "alert_seq", "event_id",
                "latency_ms")
    )


SQL_ALERT_THROTTLE = f"""
WITH {LOGS_CTE},
e AS (
    SELECT service, ts, event_id, latency_ms FROM logs WHERE is_error = 1
),
r AS (
    SELECT service, event_id, latency_ms,
           CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) // 86400 AS bkt,
           row_number() OVER (
               PARTITION BY service,
                   CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) // 86400
               ORDER BY ts, event_id) AS alert_seq
    FROM e
)
SELECT service, CAST(bkt * 86400 AS BIGINT) AS bucket_start,
       CAST(alert_seq AS BIGINT) AS alert_seq, event_id, latency_ms
FROM r WHERE alert_seq <= {THROTTLE_LIMIT}
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of per-service daily error
    counts (operators/detect.seasonal_decompose): centered ±3-day trend,
    ordered-fold weekday seasonal, residual — the series-separation
    companion to dow_anomalies' flags."""
    from ..operators.detect import seasonal_decompose

    return seasonal_decompose(error_logs(load_table(spark, sf_dir, "events")))


def _seasonal_decompose_sql() -> str:
    from ..functions.detmath import det_round_sql
    from ..operators.detect import DECOMP_HALF_SPAN
    return f"""
WITH {LOGS_CTE},
daily AS (
    SELECT service,
           CAST(floor(epoch_us(ts) / {DAY * 1_000_000}) AS BIGINT) AS x,
           CAST(count(*) AS BIGINT) AS y
    FROM logs WHERE is_error = 1 GROUP BY 1, 2
),
spans AS (
    SELECT service, x, y, (x + 3) % 7 AS dow,
           CAST(sum(y) OVER w AS BIGINT) AS wsy,
           CAST(count(*) OVER w AS BIGINT) AS wn
    FROM daily
    WINDOW w AS (PARTITION BY service ORDER BY x
                 RANGE BETWEEN {DECOMP_HALF_SPAN} PRECEDING
                           AND {DECOMP_HALF_SPAN} FOLLOWING)
),
trended AS (
    SELECT service, x, y, dow,
           {exact_round_div_sql('wsy', 'wn', 4)} AS trend
    FROM spans
),
det AS (
    SELECT *, CAST(y AS DOUBLE) - trend AS detr FROM trended
),
seas AS (
    SELECT service, dow,
           list_reduce(list_prepend(0.0, list(detr ORDER BY x)),
                       (acc, v) -> acc + v)
               / CAST(count(*) AS DOUBLE) AS seasonal_raw
    FROM det GROUP BY 1, 2
)
SELECT d.service AS service, d.x AS day_epoch, d.dow AS dow, d.y AS y,
       d.trend AS trend,
       {det_round_sql('s.seasonal_raw', 4)} AS seasonal,
       {det_round_sql('d.detr - s.seasonal_raw', 4)} AS residual
FROM det d JOIN seas s ON d.service = s.service AND d.dow = s.dow
"""


QUERIES: dict[str, QuerySpec] = {
    "log_templates": QuerySpec(q_log_templates, _log_templates_sql()),
    "correlated_incidents": QuerySpec(q_correlated_incidents,
                                      _correlated_incidents_sql()),
    "alert_throttle": QuerySpec(q_alert_throttle, SQL_ALERT_THROTTLE),
    "error_rate_sliding": QuerySpec(q_error_rate_sliding, SQL_ERROR_RATE_SLIDING),
    "synthetic_log_profile": QuerySpec(q_synthetic_log_profile,
                                       SQL_SYNTHETIC_LOG_PROFILE),
    "error_rate_tumbling": QuerySpec(q_error_rate_tumbling, SQL_ERROR_RATE_TUMBLING),
    "latency_p95_daily": QuerySpec(q_latency_p95_daily, SQL_LATENCY_P95_DAILY),
    "latency_ewma_daily": QuerySpec(q_latency_ewma_daily,
                                    SQL_LATENCY_EWMA_DAILY),
    "error_trend_slope": QuerySpec(q_error_trend_slope,
                                   SQL_ERROR_TREND_SLOPE),
    "robust_trend": QuerySpec(q_robust_trend, _robust_trend_sql()),
    "holt_forecast": QuerySpec(q_holt_forecast, _holt_forecast_sql()),
    "changepoint_split": QuerySpec(q_changepoint_split,
                                   _changepoint_split_sql()),
    "acf_daily": QuerySpec(q_acf_daily, _acf_daily_sql()),
    "dow_anomalies": QuerySpec(q_dow_anomalies, _dow_anomalies_sql()),
    "seasonal_decompose": QuerySpec(q_seasonal_decompose,
                                    _seasonal_decompose_sql()),
    "error_cusum_drift": QuerySpec(q_error_cusum_drift,
                                   SQL_ERROR_CUSUM_DRIFT),
    "hdr_latency_quantiles": QuerySpec(q_hdr_latency_quantiles,
                                       _hdr_latency_quantiles_sql()),
    "slo_breach_streaks": QuerySpec(q_slo_breach_streaks, SQL_SLO_BREACH_STREAKS),
    "escalations_every_third": QuerySpec(q_escalations_every_third,
                                         SQL_ESCALATIONS_EVERY_THIRD),
    "alert_metrics_daily": QuerySpec(q_alert_metrics_daily, SQL_ALERT_METRICS_DAILY),
    "escalation_metrics_daily": QuerySpec(q_escalation_metrics_daily,
                                          SQL_ESCALATION_METRICS_DAILY),
    "alert_union_normalized": QuerySpec(q_alert_union_normalized,
                                        SQL_ALERT_UNION_NORMALIZED),
    "props_json_extract": QuerySpec(q_props_json_extract, SQL_PROPS_JSON_EXTRACT),
}
