"""Windowed detectors (SURVEY §2.4 A1-A3, §2.6 W1-W2).

Spark-first re-expression of the two PyFlink detector jobs:

- ``error_rate_alerts``: flink/error_rate_detector.py — keyed sliding
  event-time window, incremental {total, errors} accumulator
  (ErrorRateAgg, :40-68), min-support guard total>=N (:89), threshold
  error_rate>=theta (:93), 4-digit rounding (:101).  The hand-written
  partial/final merge becomes Catalyst's automatic partial->shuffle->final
  HashAggregate; count/sum are map-side combined, so the shuffle carries
  one row per (service, window) — at 100 TB the shuffle volume is bounded
  by key-cardinality x windows, not input rows.

- ``latency_p95``: flink/latency_slo_monitor.py:45-64 — keyed tumbling
  window, exact nearest-rank-low p95.  collect_list state is O(window
  rows per key); `approx=True` switches to percentile_approx for the
  scale path (documented fallback, SURVEY §7.3).

Both run identically under spark.read (oracle-testable) and
spark.readStream + withWatermark (reference parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.percentile import exact_percentile_disc
from ..functions.scalar import guarded_ratio

#: Reference thresholds (flink/error_rate_detector.py:89,93).
MIN_SUPPORT = 100
ERROR_RATE_THRESHOLD = 0.02


def windowed_error_rates(logs: DataFrame, *, size: str, slide: str | None = None,
                         key: str = "service") -> DataFrame:
    """Per (key, window) error-rate accumulator — ErrorRateAgg as two
    codegen'd aggregates; the ratio is a post-agg projection (A2)."""
    win = F.window("ts", size, slide) if slide else F.window("ts", size)
    return (
        logs.groupBy(F.col(key), win.alias("window"))
        .agg(
            F.count("*").alias("total_logs"),
            F.sum("is_error").alias("error_logs"),
        )
        .select(
            key,
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "total_logs",
            "error_logs",
            guarded_ratio(F.col("error_logs"), F.col("total_logs")).alias("error_rate"),
        )
    )


def error_rate_alerts(logs: DataFrame, *, size: str, slide: str | None = None,
                      min_support: int = MIN_SUPPORT,
                      threshold: float = ERROR_RATE_THRESHOLD,
                      key: str = "service") -> DataFrame:
    """Sliding-window error-rate spike detection.

    Filter order matters for semantics, not for the plan: the min-support
    HAVING (P9) applies before the threshold test (P10), exactly as the
    reference returns early on small windows (flink/error_rate_detector.py:89-91).
    """
    rates = windowed_error_rates(logs, size=size, slide=slide, key=key)
    return (
        rates
        .filter(F.col("total_logs") >= min_support)
        .filter(F.col("error_rate") >= threshold)
        .withColumn("type", F.lit("ERROR_RATE_SPIKE"))
        .withColumn("severity", F.lit("HIGH"))
    )


#: z-score cutoff for the latency anomaly detector.
ANOMALY_Z = 3


def latency_anomalies(logs: DataFrame, *, key: str = "service",
                      z: int = ANOMALY_Z) -> DataFrame:
    """Per-(key, day) latency outlier report: each event is tested
    against its own group's mean/std at ``z`` sigmas — the statistical
    escalation of the reference's fixed-threshold detectors
    (flink/latency_slo_monitor.py:49 hard-codes 500 ms; a per-service
    baseline flags the service whose *own* distribution shifted).

    Cross-engine exactness: latencies are scaled to centi-ms integers
    (the fixture's values carry 2 decimals), and the z-test is the
    cross-multiplied integer comparison

        (n*x - S)^2  >  z^2 * (n*Q - S^2)        [S = sum x, Q = sum x^2]

    evaluated in DECIMAL — algebraically (x - mean)^2 > z^2 * variance
    with both sides scaled by n^2, so no division, no sqrt, no doubles
    anywhere, and the outlier counts hash-match any engine bit-for-bit.

    Plan shape for 100 TB: one shuffle computes the per-(key, day)
    moment sums (map-side combined — the shuffle carries 3 numbers per
    group, not events); the tiny stats table then BROADCASTS back onto
    the event stream, so flagging is a map-side predicate, and the final
    rollup is a second small aggregation.  No self-join of the event
    table against itself, no window sort over the raw events.
    """
    cs = logs.filter(F.col("latency_ms").isNotNull()).select(
        F.col(key),
        F.to_date("ts").alias("day"),
        F.round(F.col("latency_ms") * 100).cast("decimal(18,0)").alias("x_cs"),
    )
    stats = cs.groupBy(key, "day").agg(
        F.count("*").cast("decimal(18,0)").alias("n"),
        F.sum("x_cs").alias("s"),
        F.sum(F.col("x_cs") * F.col("x_cs")).alias("q"),
    )
    j = cs.join(F.broadcast(stats), [key, "day"])
    dev = F.col("n") * F.col("x_cs") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    is_out = (dev * dev) > F.lit(z * z) * var_n2
    return (
        j.groupBy(key, "day")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
            F.max(F.col("x_cs").cast("long")).alias("max_latency_cs"),
        )
        .select(
            key,
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events", "n_outliers", "max_latency_cs",
        )
    )


def latency_p95(logs: DataFrame, *, size: str, q: float = 0.95,
                key: str = "service", approx: bool = False) -> DataFrame:
    """Tumbling-window exact (or approx at scale) p95 latency per key."""
    p95 = (
        F.percentile_approx("latency_ms", q).alias("p95_latency")
        if approx
        else exact_percentile_disc(F.col("latency_ms"), q).alias("p95_latency")
    )
    return (
        logs.groupBy(F.col(key), F.window("ts", size).alias("window"))
        .agg(p95, F.count("*").alias("total_logs"))
        .select(
            key,
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "p95_latency",
            "total_logs",
        )
    )


#: Arbitrary day-number rebase for the trend regression below.  The OLS
#: slope is EXACTLY invariant under x -> x - c in integer arithmetic
#: (n·Σxy − Σx·Σy and n·Σx² − (Σx)² both reduce to the centered sums),
#: so the constant only controls overflow headroom.  The global rebase
#: is a cheap first shift; the binding protection is the PER-SERVICE
#: centering inside trend_slope_from_daily (x − trunc(Σx/n)), which
#: shrinks |x| to the service's own span in days regardless of where
#: its activity falls on the calendar.  Real bound after centering:
#: exact_round_div at scale 6 multiplies the slope numerator by 2·10^6
#: in BIGINT, so exactness requires |n·Σx'y − Σx'·Σy| < ~4.6e12 with
#: x' the centered day index — with |x'| ≤ span/2 that is
#: n·(span/2)·Σ|y−ȳ| headroom, e.g. a decade of daily points
#: (n≈3650, span/2≈1825) tolerates ~7e5 total ABSOLUTE DEVIATION from
#: the mean daily count times; a near-flat 10^9/day series is fine
#: (deviations cancel into the centered covariance), a 10^9-scale
#: monotone ramp is not — pre-aggregate to weeks or lower the round
#: scale for such series.
DAY_REBASE = 20_000


def error_trend_slope(err_logs: DataFrame) -> DataFrame:
    """Per-service OLS trend of the daily error-count series:
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` in errors/day — the
    detector behind "errors are drifting up 3%/day" alerts, one Markov
    step beyond the reference's threshold spikes
    (flink/error_rate_detector.py:89-99 reacts to levels; this reacts
    to drift).

    Input should be pre-filtered error logs (operators/logs.error_logs)
    so the event_type predicate reaches the parquet scan.

    Scale shape: one map-side-combined (service, day) count — the only
    pass over raw events — then a per-service aggregation over the tiny
    daily table.  No window, no sort, no collect: the four sufficient
    statistics (Σx, Σy, Σxy, Σx²) fold associatively.  Streaming uses
    the standard two-stage split (Spark disallows chained streaming
    aggregations): the daily count as a windowed streaming agg, then
    :func:`trend_slope_from_daily` over the tiny maintained state per
    micro-batch — proven equal to this batch path in
    tests/test_streaming.py::test_error_trend_stream_matches_batch.

    Determinism: all-integer sufficient statistics (day index is an
    epoch-second div, counts are BIGINT), and the final ratio —
    numerator may be negative on a falling trend — is the sign-aware
    exact_round_div.  NULL slope when a service has a single active day
    (zero variance).
    """
    from ..functions.detmath import int_div

    x = (int_div(F.unix_timestamp("ts"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x")
    daily = err_logs.groupBy("service", x).agg(F.count("*").alias("y"))
    return trend_slope_from_daily(daily)


def trend_slope_from_daily(daily: DataFrame) -> DataFrame:
    """Slope stage of :func:`error_trend_slope`: per-service OLS over a
    ``(service, x, y)`` daily table.  Separated so the streaming path
    can feed it the maintained daily-count state each micro-batch.

    x is first centered PER SERVICE (x − trunc(Σx/n), any integer shift
    is exact-invariant for the slope) so the sufficient statistics sit
    at centered-covariance scale instead of days-since-rebase scale —
    the overflow-headroom fix from ADVICE r6 (see DAY_REBASE note for
    the real bound).  The centering is a window over the already-tiny
    daily table, partitioned on the same key the final aggregation
    groups by — one Exchange serves both, and no fact-table work is
    added.  The oracle SQL does NOT center: DuckDB's integer sums are
    HUGEINT so it has no overflow to defend against, and the slope is
    exactly shift-invariant, so both sides emit identical values.
    """
    from pyspark.sql import Window

    from ..functions.detmath import exact_round_div, int_div

    w = Window.partitionBy("service")
    cx = int_div(F.sum("x").over(w), F.count("*").over(w))
    daily = daily.select(
        "service", (F.col("x") - cx).alias("x"), "y")
    s = daily.groupBy("service").agg(
        F.count("*").alias("n_days"),
        F.sum("y").alias("sy"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "service",
        "n_days",
        F.col("sy").alias("total_errors"),
        exact_round_div(num, den, 6).alias("slope_per_day"),
    )


#: CUSUM alarm threshold as a multiple of the per-service reference
#: (trunc-mean daily count): alarm when the accumulated positive drift
#: exceeds three "typical days" worth of errors.
CUSUM_H_MULT = 3


def cusum_drift(err_logs: DataFrame) -> DataFrame:
    """Per-service one-sided CUSUM over the daily error-count series —
    the change-point detector that catches a sustained small LEVEL
    SHIFT (e.g. +20%/day after a bad deploy) long before a threshold
    detector fires and without the lag of the OLS trend
    (:func:`error_trend_slope`): classic ``C_t = max(0, C_{t-1} +
    (y_t − k))`` with reference ``k`` = the service's trunc-mean daily
    count, alarming when ``C_t > h = CUSUM_H_MULT·k``.

    Scale shape: the recurrence looks sequential but is computed
    WITHOUT iteration via the prefix-sum identity ``C_t = S_t −
    min(0, min_{s≤t} S_s)`` with ``S_t = Σ_{s≤t}(y_s − k)`` — two
    stacked window frames over the tiny (service, day) table (the same
    single Exchange the trend detector uses); the only pass over raw
    events is the map-side-combined daily count.

    Determinism: all-integer — k is a trunc division of BIGINT sums
    (both engines), S/cusum are BIGINT window sums, and the output is
    counts plus the first alarm's epoch day (NULL when never alarmed).

    Gap semantics: the recurrence runs over OBSERVED days only — a
    zero-error day produces no log rows, so it neither decays the
    accumulator nor counts toward the reference mean.  Zero-filling is
    a composition with the gapfill spine (queries/relational.
    service_daily_gapfill) when absence itself must decay the alarm.

    Reference parity note: flink/error_rate_detector.py reacts to
    instantaneous rate levels; this is the §7 drift extension on the
    same keyed daily series.
    """

    from ..functions.detmath import int_div

    x = int_div(F.unix_timestamp("ts"), F.lit(86400)).alias("x")
    daily = err_logs.groupBy("service", x).agg(
        F.count("*").cast("long").alias("y"))
    return cusum_from_daily(daily)


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """CUSUM stage of :func:`cusum_drift` over a ``(service, x, y)``
    daily table — separated (like trend_slope_from_daily) so the
    streaming path can feed it the maintained daily-count state each
    micro-batch; proven equal to the batch operator in
    tests/test_streaming.py."""
    from pyspark.sql import Window

    from ..functions.detmath import int_div

    w_all = Window.partitionBy("service")
    k = int_div(F.sum("y").over(w_all), F.count("*").over(w_all))
    d1 = daily.select("service", "x", "y", k.alias("k"))

    w_ord = (Window.partitionBy("service").orderBy("x")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d2 = d1.select("service", "x", "y", "k",
                   F.sum(F.col("y") - F.col("k")).over(w_ord).alias("s"))
    cusum = (F.col("s")
             - F.least(F.lit(0).cast("long"), F.min("s").over(w_ord)))
    d3 = d2.select("service", "x", "y", "k", cusum.alias("cusum"))

    alarm = F.col("cusum") > CUSUM_H_MULT * F.col("k")
    return d3.groupBy("service").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("total_errors"),
        F.max("k").cast("long").alias("k_ref"),          # constant per svc
        F.max("cusum").cast("long").alias("max_cusum"),
        F.sum(alarm.cast("long")).cast("long").alias("n_alarm_days"),
        F.min(F.when(alarm, F.col("x"))).cast("long")
        .alias("first_alarm_day"),
    )


#: Trailing-window cap on robust_trend's daily relation: the pairwise
#: stage is days²/2 per service, so an UNBOUNDED retention would put a
#: quadratically growing slope list into one percentile buffer (a
#: 10-year daily series is ~6.7M pairs ≈ 53 MB per service).  Capping at
#: the most recent 365 observed days bounds it at 365·364/2 = 66,430
#: pairs ≈ 0.5 MB per service — trend detection over more than a year of
#: dailies is a different question (seasonality) anyway.  Callers with
#: longer horizons pass ``max_days`` explicitly and own the buffer math.
ROBUST_TREND_MAX_DAYS = 365


def robust_trend(err_logs: DataFrame, *,
                 max_days: int = ROBUST_TREND_MAX_DAYS) -> DataFrame:
    """Per-service ROBUST trend of the daily error-count series:
    Theil-Sen slope (median of all pairwise day-slopes) plus the
    Mann-Kendall S statistic (sum of pairwise sign changes) — the
    outlier-resistant complement to :func:`error_trend_slope`: one
    2000-error incident day drags the OLS slope arbitrarily but moves
    the pairwise-slope median by at most one rank position, and S
    depends only on ORDER, not magnitude.

    Scale shape: the only raw-event pass is the map-side-combined
    (service, day) count; the pairwise self-join runs on that tiny
    daily table, equi-keyed on service with days² per service pairs —
    bounded by ``max_days`` (default 365: ≤66,430 pairs ≈ 0.5 MB of
    slope buffer per service; the fixture's ~12 days yield 66), never
    by event volume or retention: the statistic is computed over each
    service's most recent ``max_days`` OBSERVED days, older dailies are
    dropped before pairing (see :data:`ROBUST_TREND_MAX_DAYS`).
    Single-day services keep a row (n_pairs = 0, NULL slope) via the
    left join from the day-count relation.

    Determinism: dy, dx, and the Mann-Kendall sign sum are all-BIGINT;
    the pairwise slopes are identical double divisions and the median
    is the repo's nearest-rank-low selection (sorted element at
    ``int(0.5·(n-1))`` — functions/percentile), a single selected
    element rather than an interpolated average, so the result is one
    of the actual slope doubles, bit-equal cross-engine.
    """
    from ..functions.detmath import int_div

    x = (int_div(F.unix_timestamp("ts"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x")
    daily = err_logs.groupBy("service", x) \
        .agg(F.count("*").cast("long").alias("y"))
    return robust_trend_from_daily(daily, max_days=max_days)


def robust_trend_from_daily(daily: DataFrame, *,
                            max_days: int = ROBUST_TREND_MAX_DAYS
                            ) -> DataFrame:
    """Statistic stage of :func:`robust_trend` over a ``(service, x,
    y)`` daily table — separated (the cusum_from_daily pattern) so the
    streaming path can feed it the maintained daily-count state each
    micro-batch.

    The trailing cap runs HERE, on the daily relation (row_number over
    the days-sized table, not the raw events), so both the batch path
    and the streaming twin's maintained state see the identical
    most-recent-``max_days`` window.
    """
    from pyspark.sql import Window

    from ..functions.percentile import exact_percentile_disc

    rn = F.row_number().over(
        Window.partitionBy("service").orderBy(F.desc("x")))
    daily = (daily.withColumn("_rn", rn)
             .filter(F.col("_rn") <= max_days).drop("_rn"))
    dcnt = daily.groupBy("service") \
        .agg(F.count("*").cast("long").alias("n_days"))
    # renamed projections, not alias("a")/alias("b"): on view-derived
    # lineage (the streaming twin feeds a memory-sink table) the
    # alias-qualified self-join hits Spark's ambiguous-self-join
    # resolution failure (the r7 trend-centering gotcha, same class)
    lhs = daily.select(F.col("service").alias("_svc"),
                       F.col("x").alias("_xa"), F.col("y").alias("_ya"))
    rhs = daily.select(F.col("service").alias("_svcb"),
                       F.col("x").alias("_xb"), F.col("y").alias("_yb"))
    pairs = (lhs.join(rhs, (F.col("_svc") == F.col("_svcb"))
                     & (F.col("_xa") < F.col("_xb")))
             .select(F.col("_svc").alias("service"),
                     (F.col("_yb") - F.col("_ya")).alias("dy"),
                     (F.col("_xb") - F.col("_xa")).alias("dx")))
    slope = F.col("dy").cast("double") / F.col("dx").cast("double")
    agg = pairs.groupBy("service").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dy") > 0, 1)
              .when(F.col("dy") < 0, -1).otherwise(0))
        .cast("long").alias("mk_s"),
        exact_percentile_disc(slope, 0.5).alias("theil_sen_slope"))
    return (dcnt.join(agg, "service", "left")
            .select("service", "n_days",
                    F.coalesce("n_pairs", F.lit(0).cast("long"))
                    .alias("n_pairs"),
                    F.coalesce("mk_s", F.lit(0).cast("long")).alias("mk_s"),
                    "theil_sen_slope"))


#: Holt double-exponential-smoothing constants.  Literal doubles so BOTH
#: dialects parse the identical binary64 (the detmath discipline); the
#:   complement constants are literals too, never computed as 1 - x.
HOLT_ALPHA = 0.3
HOLT_ONE_MINUS_ALPHA = 0.7
HOLT_BETA = 0.1
HOLT_ONE_MINUS_BETA = 0.9


def holt_forecast(err_logs: DataFrame) -> DataFrame:
    """Per-service Holt linear (double-exponential) smoothing of the
    daily error-count series: smoothed level, smoothed trend, the
    one-step-ahead forecast ``level + trend``, and the in-sample
    one-step squared-error sum — the short-horizon forecaster that
    complements the detectors (cusum/robust_trend say "something
    changed"; this says "what tomorrow looks like if it doesn't").
    Recurrence (l0 = y0, b0 = 0):

        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Scale shape: the only raw-event pass is the map-side-combined
    (service, day) count; the recurrence is inherently serial per key,
    so it runs as ONE ordered in-memory fold over each service's daily
    array (observation-window-sized — the latency_ewma_daily treatment
    generalized to two-state float recursion), never as a
    self-join or a row-at-a-time UDF.

    Determinism: the fold order is pinned by array_sort on (x-first)
    structs / list_sort, every coefficient is the same literal double
    in both dialects, and each step is an identical arithmetic DAG —
    bit-equal folds, so level/trend/forecast/sse are emitted UNROUNDED.
    """
    from ..functions.detmath import int_div

    x = (int_div(F.unix_timestamp("ts"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x")
    daily = err_logs.groupBy("service", x) \
        .agg(F.count("*").cast("long").alias("y"))
    return holt_from_daily(daily)


def holt_from_daily(daily: DataFrame) -> DataFrame:
    """Recurrence stage of :func:`holt_forecast` over a ``(service, x,
    y)`` daily table — separated (the cusum/robust_trend _from_daily
    pattern) so the streaming path can feed it the maintained
    daily-count state each micro-batch (twin in tests/test_streaming)."""
    a, ca = F.lit(HOLT_ALPHA), F.lit(HOLT_ONE_MINUS_ALPHA)
    b, cb = F.lit(HOLT_BETA), F.lit(HOLT_ONE_MINUS_BETA)

    arr = F.array_sort(F.collect_list(F.struct(
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"))))
    zero = F.struct(F.lit(0.0).alias("l"), F.lit(0.0).alias("b"),
                    F.lit(0.0).alias("sse"), F.lit(0.0).alias("n"))

    def step(acc, e):
        # l_new appears twice (in l and inside b) — recomputed as the
        # SAME subexpression in both dialects, so the DAGs stay identical
        l_new = a * e["y"] + ca * (acc["l"] + acc["b"])
        resid = e["y"] - (acc["l"] + acc["b"])
        return F.when(
            acc["n"] == F.lit(0.0),
            F.struct(e["y"].alias("l"), F.lit(0.0).alias("b"),
                     F.lit(0.0).alias("sse"), F.lit(1.0).alias("n")),
        ).otherwise(
            F.struct(
                l_new.alias("l"),
                (b * (l_new - acc["l"]) + cb * acc["b"]).alias("b"),
                (acc["sse"] + resid * resid).alias("sse"),
                (acc["n"] + F.lit(1.0)).alias("n")))

    folded = daily.groupBy("service").agg(
        F.count("*").cast("long").alias("n_days"),
        F.aggregate(arr, zero, step).alias("acc"))
    return folded.select(
        "service", "n_days",
        F.col("acc.l").alias("level"),
        F.col("acc.b").alias("trend"),
        (F.col("acc.l") + F.col("acc.b")).alias("forecast_next"),
        F.col("acc.sse").alias("sse"))


def changepoint_split(err_logs: DataFrame) -> DataFrame:
    """Per-service OFFLINE change-point localization over the daily
    error-count series — binary segmentation's first split: the day
    boundary that maximizes the between-segment sum-of-squares gain

        gain(i) = S1²/i + S2²/(n−i) − S²/n

    (S1/S2 = left/right segment sums; the split minimizing total
    within-segment SSE for a piecewise-constant fit).  Where CUSUM
    (cusum_drift) detects ONLINE that a drift is in progress, this
    answers the postmortem question "WHEN did the level shift?".

    Scale shape: one map-side-combined pass to the (service, day)
    table; the candidate scan is a prefix-sum window plus an argmax
    rank over that days-sized relation — no pairwise join, no
    per-event state.  Single-day services keep a row (NULL split) via
    the left join from the per-service totals.

    Determinism: prefix sums and segment sums are BIGINT; each gain is
    the identical double DAG over int64-exact casts, so the argmax
    (gain DESC, then earliest day) selects the same row on every
    engine; gain is emitted unrounded.

    No streaming twin — BY CLASSIFICATION, not omission (the
    anisotropy precedent; README "Scale design"): binary segmentation
    is an offline, whole-series statistic.  gain(i) for EVERY candidate
    i changes whenever any day's total changes, so an incremental
    emission would retract and re-emit the argmax on nearly every
    micro-batch — there is no append-mode contract to keep, and the
    online member of this family already exists as ``cusum_drift``
    (which has a streaming twin).  Run this as a batch postmortem over
    the closed daily relation.
    """
    from pyspark.sql import Window

    from ..functions.detmath import int_div

    x = (int_div(F.unix_timestamp("ts"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x")
    daily = err_logs.groupBy("service", x) \
        .agg(F.count("*").cast("long").alias("y"))

    tot = daily.groupBy("service").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("total_errors"))

    w = Window.partitionBy("service").orderBy("x")
    pre = daily.select(
        "service", "x",
        F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long").alias("s1"),
        F.row_number().over(w).alias("i"))
    cand = (pre.join(tot, "service")
            .filter(F.col("i") < F.col("n_days")))
    s1d = F.col("s1").cast("double")
    s2d = (F.col("total_errors") - F.col("s1")).cast("double")
    sd = F.col("total_errors").cast("double")
    nd = F.col("n_days").cast("double")
    gain = (s1d * s1d / F.col("i").cast("double")
            + s2d * s2d / (nd - F.col("i").cast("double"))
            - sd * sd / nd)
    ranked = cand.select(
        "service", "x", "i", "s1", gain.alias("gain"),
        F.row_number().over(
            Window.partitionBy("service")
            .orderBy(F.desc(gain), F.asc("x"))).alias("_rk"))
    best = ranked.filter(F.col("_rk") == 1).select(
        "service", F.col("x").alias("split_last_left_day"),
        F.col("i").cast("long").alias("left_days"),
        F.col("s1").alias("left_sum"), "gain")
    return (tot.join(best, "service", "left")
            .select("service", "n_days", "total_errors",
                    "split_last_left_day", "left_days", "left_sum", "gain"))


#: Calendar lags (in days) the autocorrelation audit reports.  Literal
#: ints so the oracle's VALUES spine enumerates the identical set.
ACF_LAGS = (1, 2, 3)


def acf_daily(err_logs: DataFrame,
              *, lags: tuple[int, ...] = ACF_LAGS) -> DataFrame:
    """Per-service autocorrelation of the daily error-count series at
    calendar lags ``lags`` — the periodicity audit behind the other
    daily detectors: a large positive ACF at lag 1 says incidents
    cluster across consecutive days (cusum/holt's smoothing pays off);
    ACF near zero says days are independent and yesterday predicts
    nothing.  Estimator (global-mean form, μ = Σy/n over ALL observed
    days, pairs matched on CALENDAR distance so a gap day simply
    contributes no pair — never a rank-spaced fake lag):

        acf(k) = Σ_pairs (y_t − μ)(y_{t+k} − μ) / Σ_days (y_t − μ)²

    Scale shape: the only raw-event pass is the map-side-combined
    (service, day) count; the lag matching is ONE equi-join of the tiny
    daily relation against itself shifted through a #lags-row VALUES
    spine (join keys (service, x + k) — days·lags rows, never a theta
    join), and every sufficient statistic (Σy, Σy², Σy_t·y_{t+k}, pair
    head/tail sums) folds associatively in BIGINT.  Services with no
    matchable pair at a lag keep their row (n_pairs = 0, NULL acf) via
    the left join from the service × lags spine.

    Determinism: all sums are BIGINT; μ and the final ratio are one
    identical double DAG in both dialects (the expansion
    ``Σ y_t·y_{t+k} − μ·(Σheads + Σtails) + m·μ²`` evaluates from
    exact int64s, so the doubles are bit-equal), NULL when the
    denominator is zero (a constant series has no defined ACF).
    """
    from ..functions.detmath import int_div

    x = (int_div(F.unix_timestamp("ts"), F.lit(86400))
         - F.lit(DAY_REBASE)).alias("x")
    daily = err_logs.groupBy("service", x) \
        .agg(F.count("*").cast("long").alias("y"))
    return acf_from_daily(daily, lags=lags)


def acf_from_daily(daily: DataFrame,
                   *, lags: tuple[int, ...] = ACF_LAGS) -> DataFrame:
    """Statistic stage of :func:`acf_daily` over a ``(service, x, y)``
    daily table — separated (the cusum/holt _from_daily pattern) so the
    streaming path can feed it the maintained daily-count state each
    micro-batch (twin in tests/test_streaming.py)."""
    spark = daily.sparkSession
    lag_df = F.broadcast(spark.createDataFrame(
        [(int(k),) for k in lags], "lag long"))

    base = daily.groupBy("service").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))

    # renamed projections, not alias(): the robust_trend self-join note
    # (view-derived lineage breaks alias-qualified self-joins) applies.
    heads = (daily.crossJoin(lag_df)  # days x #lags spine rows
             .select(F.col("service").alias("_svc"), "lag",
                     (F.col("x") + F.col("lag")).alias("_xm"),
                     F.col("y").alias("_yh")))
    tails = daily.select(F.col("service").alias("_svcb"),
                         F.col("x").alias("_xb"), F.col("y").alias("_yt"))
    pairs = (heads.join(tails, (F.col("_svc") == F.col("_svcb"))
                        & (F.col("_xm") == F.col("_xb")))
             .groupBy(F.col("_svc").alias("service"), "lag")
             .agg(F.count("*").cast("long").alias("n_pairs"),
                  F.sum(F.col("_yh") * F.col("_yt")).cast("long")
                  .alias("sxy"),
                  F.sum("_yh").cast("long").alias("sh"),
                  F.sum("_yt").cast("long").alias("st")))

    spine = base.crossJoin(lag_df)
    j = spine.join(pairs, ["service", "lag"], "left")
    mu = F.col("sy").cast("double") / F.col("n_days").cast("double")
    ssq = F.col("syy").cast("double") - F.col("sy").cast("double") * mu
    num = (F.col("sxy").cast("double")
           - mu * (F.col("sh") + F.col("st")).cast("double")
           + F.col("n_pairs").cast("double") * mu * mu)
    return j.select(
        "service", "lag", "n_days",
        F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
        F.when((F.col("n_pairs") > 0) & (ssq != 0.0), num / ssq)
        .alias("acf"))


#: Day-of-week anomaly contract: flag a day when its error count
#: exceeds DOW_ANOM_NUM/DOW_ANOM_DEN (= 1.5×) of its service's SAME-
#: WEEKDAY mean, with at least DOW_ANOM_MIN_OBS observations of that
#: weekday (three Mondays before a Monday can be anomalous).  Integer
#: numerator/denominator so the comparison is exact, never a float cut.
DOW_ANOM_NUM = 3
DOW_ANOM_DEN = 2
DOW_ANOM_MIN_OBS = 3


def dow_anomalies(err_logs: DataFrame) -> DataFrame:
    """Per-service day-of-week seasonality profile with anomaly flags:
    every observed day's error count next to its service's same-weekday
    mean and the count/mean ratio, flagged when the day exceeds 1.5×
    its weekday baseline — the seasonality-aware complement to the
    level detectors (a busy Monday is only anomalous relative to OTHER
    Mondays; a flat threshold fires every Monday or misses every
    Sunday).

    Scale shape: one map-side-combined (service, day) pass over raw
    events; the weekday profile is a ≤ services×7-row aggregation of
    that daily relation, broadcast back onto it — no window, no sort,
    output is observed-days-sized.  dow = (epoch_day + 3) mod 7
    (0 = Monday; day 0, 1970-01-01, was a Thursday), identical integer
    arithmetic in both dialects.

    Determinism: the flag is the EXACT integer comparison
    ``DOW_ANOM_DEN·y·n > DOW_ANOM_NUM·Σy`` (no float threshold);
    dow_mean and ratio are exact_round_div at scale 4.  The weekday
    mean includes the flagged day itself (self-masking bounds the
    flag's sensitivity but keeps the statistic a pure function of the
    daily table; at ≥3 observations a 1.5× cut still fires on a
    genuine doubling).  Overflow: y·n must fit exact_round_div's
    |num| < 4.6e14 bound — 10⁹ errors/day × 10⁵ same-weekday
    observations stays inside it.

    No streaming twin — BY CLASSIFICATION, not omission (the
    anisotropy precedent; README "Scale design"): the weekday baseline
    requires CALENDAR COMPLETENESS — every observed day's flag depends
    on the mean over all same-weekday days, including days that arrive
    AFTER it, so each new day retroactively re-flags up to the whole
    history of its weekday.  That is a complete-mode recomputation, not
    an append-mode stream; the watermarked online detectors
    (error_rate_stream, cusum_drift's twin) cover the real-time side of
    this family, and this profile is their weekly-seasonality batch
    complement.
    """
    from ..functions.detmath import exact_round_div, int_div

    x = int_div(F.unix_timestamp("ts"), F.lit(86400)).alias("x")
    daily = err_logs.groupBy("service", x) \
        .agg(F.count("*").cast("long").alias("y"))
    daily = daily.withColumn("dow", (F.col("x") + 3) % 7)
    prof = (daily.groupBy(F.col("service").alias("_svc"),
                          F.col("dow").alias("_dow"))
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("y").cast("long").alias("sy")))
    j = daily.join(F.broadcast(prof),
                   (F.col("service") == F.col("_svc"))
                   & (F.col("dow") == F.col("_dow")))
    flag = ((F.lit(DOW_ANOM_DEN) * F.col("y") * F.col("n")
             > F.lit(DOW_ANOM_NUM) * F.col("sy"))
            & (F.col("n") >= DOW_ANOM_MIN_OBS))
    return j.select(
        "service", F.col("x").alias("day_epoch"), "dow", "y",
        F.col("n").alias("dow_days"),
        exact_round_div(F.col("sy"), F.col("n"), 4).alias("dow_mean"),
        exact_round_div(F.col("y") * F.col("n"), F.col("sy"), 4)
        .alias("ratio"),
        flag.alias("is_anomalous"))


#: Half-width of the centered trend window (±3 days = a 7-day span,
#: one full weekly cycle — the classical choice for weekly seasonality).
DECOMP_HALF_SPAN = 3


def seasonal_decompose(err_logs: DataFrame) -> DataFrame:
    """Classical additive decomposition of the per-service daily
    error-count series: ``y = trend + seasonal + residual`` — the
    postmortem companion to the point detectors (dow_anomalies flags
    days; this SEPARATES the weekly cycle from the level so the
    residual is what an on-call should actually stare at).

    - ``trend``: centered ±3-day moving average over days PRESENT (a
      RANGE window on the epoch-day value, so calendar gaps neither
      drag the mean nor leak across them), as an exact 4-dp ratio of
      BIGINT window sums;
    - ``seasonal``: per (service, weekday), the mean detrended value,
      folded in day order (the ordered-fold discipline) so the double
      is cross-engine bit-identical;
    - ``residual``: ``y − trend − seasonal``.

    Scale shape: one map-side-combined pass to the (service, day)
    relation; the trend window is per-service days-sized; the weekday
    profile is a ≤ services×7-row aggregate broadcast back.  Nothing
    row-level crosses a second shuffle.

    No streaming twin — BY CLASSIFICATION (the dow_anomalies /
    changepoint_split precedent; README "Scale design"): the centered
    window reads ±3 days around EVERY day and the weekday means read
    the whole series, so each arriving day retroactively rewrites up to
    a week of trend and the entire seasonal profile — a complete-mode
    recomputation with no append contract.  Online members of the
    family: holt_forecast's twin (level+trend) and the watermarked rate
    detectors.

    Determinism: trend is exact_round_div over BIGINT window sums;
    detrended = y − trend is one IEEE subtraction on identical inputs;
    the seasonal mean folds list(detrended ORDER BY day) and divides
    once; seasonal/residual are emitted det_round(…, 4).
    """
    from pyspark.sql import Window

    from ..functions.detmath import det_round, exact_round_div, int_div

    x = int_div(F.unix_timestamp("ts"), F.lit(86400)).alias("x")
    daily = (err_logs.groupBy("service", x)
             .agg(F.count("*").cast("long").alias("y")))
    w = (Window.partitionBy("service").orderBy("x")
         .rangeBetween(-DECOMP_HALF_SPAN, DECOMP_HALF_SPAN))
    trended = daily.select(
        "service", "x", "y", ((F.col("x") + 3) % 7).alias("dow"),
        exact_round_div(F.sum("y").over(w), F.count("y").over(w), 4)
        .alias("trend"))
    trended = trended.withColumn(
        "det", F.col("y").cast("double") - F.col("trend"))
    seas = (trended.groupBy(F.col("service").alias("_svc"),
                            F.col("dow").alias("_dow"))
            .agg(F.aggregate(
                     F.array_sort(F.collect_list(F.struct("x", "det"))),
                     F.lit(0.0), lambda acc, s: acc + s["det"])
                 .alias("dsum"),
                 F.count("*").cast("long").alias("dn"))
            .select("_svc", "_dow",
                    (F.col("dsum") / F.col("dn").cast("double"))
                    .alias("seasonal_raw")))
    j = trended.join(F.broadcast(seas),
                     (F.col("service") == F.col("_svc"))
                     & (F.col("dow") == F.col("_dow")))
    return j.select(
        "service", F.col("x").alias("day_epoch"), "dow", "y", "trend",
        det_round(F.col("seasonal_raw"), 4).alias("seasonal"),
        det_round(F.col("det") - F.col("seasonal_raw"), 4)
        .alias("residual"))
