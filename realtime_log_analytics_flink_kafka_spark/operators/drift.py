"""Two-sample distribution-drift tests over a CONTINUOUS column
(VERDICT r11 next-round #4).

The engine already covers drift on CATEGORICAL columns (chi-square +
Cramér's V, `source_lang_chisq`) and on aggregate token mass (KL
divergence, `source_kl_divergence`); this module adds the missing
NONPARAMETRIC two-sample test on a numeric column: the Kolmogorov-
Smirnov D statistic,

    D = max_v |ECDF_a(v) − ECDF_b(v)|,

with the asymptotic two-sided rejection rule D > c(α)·√((n_a+n_b)/
(n_a·n_b)), c(0.05) = 1.358.

Scale shape — the spend_gini value-domain-histogram discipline, state
bounded by DISTINCT VALUES, never events:

1. one map-side-combined ``groupBy(group, value)`` count with per-side
   conditional sums (the only event-sized shuffle);
2. a cumulative window over the compact per-group histogram (one row
   per distinct value — the merged support IS where D attains its max,
   so nothing is lost by never materializing per-event ranks);
3. a per-group reduction taking ``max |cum_a·n_b − cum_b·n_a|``.

Determinism — integers end to end:

- D's numerator/denominator are exact integer cross-products
  (DECIMAL(38,0) on Spark, HUGEINT on the DuckDB twins — both exact
  below 10^38), divided ONCE by :func:`exact_round_div`;
- the rejection rule is evaluated as the equivalent integral
  comparison ``10^6·D_num² > KS_C2_PPM·(n_a+n_b)·n_a·n_b`` (the α
  constant moved into parts-per-million), so the flag can never
  disagree with the printed statistic and no engine ever computes a
  square root.

Overflow bounds, explicit: exact_round_div at scale 4 needs
``n_a·n_b < 4.6e14`` (≈ 2·10^7 rows per side, balanced) and the
integral flag needs ``10^6·(n_a·n_b)² < 10^38`` (≈ 2·10^8 per side).
Past those, widen the division to DECIMAL with the same DAG — at such
n the test statistic itself is astronomically significant long before
the integers overflow, so the flag is also safely computable in
doubles; the exact path is kept because the ORACLE contract is
value-identity, not statistics.

Callers feed integer-valued columns.  A double column with bounded
decimals (the fixture's latency_ms carries ≤ 6) is quantized by the
monotone map ``floor(x·10^6 + 0.5)`` — KS depends only on the value
ORDERING, so any monotone injective transform leaves D exactly
unchanged, and a transform that merges sub-resolution ties computes
the KS of the quantized distributions identically in both engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.detmath import exact_round_div, exact_round_div_sql

#: c(α)² in parts-per-million for the asymptotic two-sample KS
#: rejection D > c·√((n_a+n_b)/(n_a·n_b)); c(0.05) = 1.358 (two-sided),
#: c² = 1.844164.
KS_C2_PPM = 1_844_164

_DEC = "decimal(38,0)"


def ks_from_counts(hist: DataFrame, *, group_cols: Sequence[str],
                   value_col: str = "v", ca: str = "ca", cb: str = "cb",
                   scale: int = 4) -> DataFrame:
    """KS report from a pre-built per-group value histogram.

    ``hist`` has ONE row per (group, value) with the two sides' counts
    in ``ca``/``cb`` (zeros allowed — a value seen by only one side
    still advances that side's ECDF and is exactly where D often
    peaks).  Returns one row per group: ``n_a, n_b, ks_d, drifted``
    (``ks_d``/``drifted`` NULL when either side is empty).

    Split out from :func:`ks_two_sample` so one-vs-rest callers (e.g.
    per-source vs pooled-rest) can assemble their own bounded
    histogram, the chi-square-margins pattern.
    """
    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy(value_col)
    wt = Window.partitionBy(*gc)
    cum = hist.select(
        *gc,
        F.sum(ca).over(w).cast(_DEC).alias("_cuma"),
        F.sum(cb).over(w).cast(_DEC).alias("_cumb"),
        F.sum(ca).over(wt).cast("long").alias("_ta"),
        F.sum(cb).over(wt).cast("long").alias("_tb"))
    d_term = F.abs(F.col("_cuma") * F.col("_tb").cast(_DEC)
                   - F.col("_cumb") * F.col("_ta").cast(_DEC))
    per = (cum.select(*gc, "_ta", "_tb", d_term.alias("_dt"))
           .groupBy(*gc)
           .agg(F.max("_ta").alias("_na"), F.max("_tb").alias("_nb"),
                F.max("_dt").alias("_dnum")))
    lhs = F.lit(1_000_000).cast(_DEC) * F.col("_dnum") * F.col("_dnum")
    rhs = (F.lit(KS_C2_PPM).cast(_DEC)
           * (F.col("_na") + F.col("_nb")).cast(_DEC)
           * F.col("_na").cast(_DEC) * F.col("_nb").cast(_DEC))
    return per.select(
        *gc,
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        exact_round_div(F.col("_dnum"),
                        F.col("_na") * F.col("_nb"), scale).alias("ks_d"),
        F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
               lhs > rhs).alias("drifted"))


def ks_two_sample(df: DataFrame, *, group_cols: Sequence[str],
                  value_col: str, side_a: Column,
                  scale: int = 4) -> DataFrame:
    """Per-group two-sample KS over row-level data.

    ``side_a`` is a boolean/0-1 Column splitting rows into sample a
    (true) vs sample b (false); NULL values in ``value_col`` are
    excluded from BOTH samples (an unmeasured row carries no
    distributional evidence).  ``value_col`` must be integer-valued —
    quantize doubles first (module docstring).
    """
    gc = list(group_cols)
    a = side_a.cast("int")
    hist = (df.filter(F.col(value_col).isNotNull())
            .groupBy(*gc, value_col)
            .agg(F.sum(a).cast("long").alias("ca"),
                 F.sum(1 - a).cast("long").alias("cb")))
    return ks_from_counts(hist, group_cols=gc, value_col=value_col,
                          scale=scale)


def wasserstein_from_counts(hist: DataFrame, *, group_cols: Sequence[str],
                            value_col: str = "v", ca: str = "ca",
                            cb: str = "cb", unit_div: int = 1,
                            scale: int = 4) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance per group from a per-group
    value histogram — the drift MAGNITUDE in the column's own units,
    completing the two-sample toolkit: KS answers "is there ANY
    difference" (a max, unitless, significance-tested), PSI scores
    bucket-mass movement on a monitoring convention, and W1 says "the
    distributions are this many MILLISECONDS apart" (for one-dim
    ECDFs the transport integral collapses to):

        W1 = ∫ |F_a(v) − F_b(v)| dv
           = Σ_i |F_a(v_i) − F_b(v_i)| · (v_{i+1} − v_i)

    over the SORTED distinct observed values (between consecutive
    observed values both ECDFs are constant, so the merged support
    loses nothing — the ks_from_counts argument).  W1 is translation-
    faithful where KS/PSI saturate: shift a distribution by Δ and
    W1 = Δ exactly, whether Δ is tiny or huge.

    ``hist`` has ONE row per (group, value) with the two sides' counts
    in ``ca``/``cb`` (zeros allowed).  ``unit_div`` converts the
    quantized integer grid back to natural units at the single
    division (e.g. 100 when values are centi-ms and the report should
    read in ms).  Returns ``n_a, n_b, w1`` (+ the grid units folded
    out), ``w1`` NULL when either side is empty.

    Determinism: the numerator Σ |cuma_i·n_b − cumb_i·n_a|·Δv_i is an
    EXACT non-negative integer in DECIMAL(38,0)/HUGEINT — order-free,
    no fold needed (overflow at n_a·n_b·range ≥ 10^38, i.e. ~10^15
    rows per side — never); both engines then cast that one integer
    and the one denominator n_a·n_b·unit_div to correctly-rounded
    doubles, divide once, and det_round at the edge.

    Scale shape: one cumulative window over the per-group DISTINCT-
    VALUE histogram (the spend_gini value-domain discipline, state
    bounded by distinct quantized values), partitioned by group —
    never a global sort, never per-event rank state."""
    from ..functions.detmath import det_round

    gc = list(group_cols)
    w = Window.partitionBy(*gc).orderBy(value_col)
    wt = Window.partitionBy(*gc)
    cum = hist.select(
        *gc,
        F.col(value_col),
        F.sum(ca).over(w).cast(_DEC).alias("_cuma"),
        F.sum(cb).over(w).cast(_DEC).alias("_cumb"),
        F.sum(ca).over(wt).cast("long").alias("_ta"),
        F.sum(cb).over(wt).cast("long").alias("_tb"),
        F.lead(value_col).over(w).alias("_nv"))
    # the last value's lead is NULL -> term NULL -> skipped by sum:
    # correct, both ECDFs are 1 there and the gap above the max
    # carries no mass difference
    term = (F.abs(F.col("_cuma") * F.col("_tb").cast(_DEC)
                  - F.col("_cumb") * F.col("_ta").cast(_DEC))
            * (F.col("_nv") - F.col(value_col)).cast(_DEC))
    per = (cum.select(*gc, "_ta", "_tb", term.alias("_t"))
           .groupBy(*gc)
           .agg(F.max("_ta").alias("_na"), F.max("_tb").alias("_nb"),
                F.coalesce(F.sum("_t"), F.lit(0).cast(_DEC))
                .alias("_wnum")))
    den = (F.col("_na").cast(_DEC) * F.col("_nb").cast(_DEC)
           * F.lit(unit_div).cast(_DEC))
    return per.select(
        *gc,
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
               det_round(F.col("_wnum").cast("double")
                         / den.cast("double"), scale)).alias("w1"))


def wasserstein_report_sql(hist_cte: str, group_cols: Sequence[str], *,
                           unit_div: int = 1, scale: int = 4) -> str:
    """DuckDB twin of :func:`wasserstein_from_counts`: takes the name
    of a CTE with columns (group…, v, ca, cb) and emits the final
    SELECT.  HUGEINT keeps the transport numerator exact below 10^38,
    mirroring the Spark side's DECIMAL(38,0); the single division runs
    on correctly-rounded doubles of identical integers."""
    from ..functions.detmath import det_round_sql

    g = ", ".join(group_cols)
    w1 = det_round_sql(
        "CAST(_wnum AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * n_b"
        f" * {unit_div} AS DOUBLE)", scale)
    return f"""
cum AS (
    SELECT {g}, v,
           sum(ca) OVER (PARTITION BY {g} ORDER BY v) AS cuma,
           sum(cb) OVER (PARTITION BY {g} ORDER BY v) AS cumb,
           sum(ca) OVER (PARTITION BY {g}) AS ta,
           sum(cb) OVER (PARTITION BY {g}) AS tb,
           lead(v) OVER (PARTITION BY {g} ORDER BY v) AS nv
    FROM {hist_cte}
),
per AS (
    SELECT {g},
           CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           coalesce(sum(abs(CAST(cuma AS HUGEINT) * CAST(tb AS HUGEINT)
                            - CAST(cumb AS HUGEINT) * CAST(ta AS HUGEINT))
                        * CAST(nv - v AS HUGEINT)),
                    CAST(0 AS HUGEINT)) AS _wnum
    FROM cum GROUP BY {g}
)
SELECT {g}, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN {w1} END AS w1
FROM per
"""


#: χ² upper-5% critical values in parts-per-million, indexed by
#: degrees of freedom 1..15 (the standard table) — the Kruskal-Wallis
#: flag looks up the OBSERVED group count's dof; beyond 15 groups the
#: flag reports NULL rather than extrapolate.
CHI2_95_PPM_BY_DOF = (
    3_841_459, 5_991_465, 7_814_728, 9_487_729, 11_070_498,
    12_591_587, 14_067_140, 15_507_313, 16_918_978, 18_307_038,
    19_675_138, 21_026_070, 22_362_032, 23_684_791, 24_995_790)


def kruskal_from_counts(cells: DataFrame, *, group_col: str = "g",
                        value_col: str = "v", count_col: str = "c",
                        scale: int = 4) -> DataFrame:
    """Kruskal-Wallis H: ONE nonparametric test for "do ANY of the k
    groups draw this column from a different distribution?" — the
    k-sample extension of the two-sample rank family (KS/W1 compare
    two samples; running k·(k−1)/2 pairwise tests inflates false
    alarms, which is exactly what KW exists to avoid).  With midranks
    r over the pooled sample and R_g = Σ ranks in group g,

        H = [ 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1) ] / C,
        C = 1 − Σ_v (t_v³ − t_v) / (n³ − n)        (tie correction),

    H ~ χ²_{k−1} under H0.  Returns ONE row: n, k, h, dof,
    significant (h/significant NULL when k < 2 or every value is tied
    — C = 0 leaves no rank information).

    CONTRACT: ``cells`` (one row per (group, value) with the count in
    ``count_col``) should be a MATERIALIZED relation (localCheckpoint
    or table) — it is consumed by three branches (the value histogram,
    its cumulative ranks, and the group join-back), and an
    un-materialized subtree would re-plan its upstream scan per
    branch (the psi_report lesson).

    Determinism: doubled midranks R2 = 2·cum_{<v} + t_v + 1 keep every
    rank integer; R2_g and the tie sum are exact DECIMAL(38,0)/HUGEINT
    (overflow: R2_g² needs (2n²)² inside int128/decimal38 — fine to
    ~2e9 events);
    each Σ R_g²/n_g term is one decimal→double cast and one division
    of identical integers, summed by SORTED fold over the k-bounded
    term list; H's assembly is the same explicit IEEE DAG on both
    engines; det_round(…, {scale}) at the edge and the flag compares
    the ROUNDED H against the ppm critical value, so print and flag
    always agree.

    Scale shape: the global cumulative window runs on the DISTINCT-
    VALUE histogram (bounded by the quantization grid — callers
    quantize, e.g. whole ms), the seasonal_decompose bounded-relation
    precedent; the rank join-back is an equi-join on the value; the
    final assembly crosses two single-row aggregates."""
    from ..functions.detmath import det_round

    vh = (cells.groupBy(value_col)
          .agg(F.sum(count_col).cast("long").alias("tv")))
    wv = (Window.orderBy(value_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    vh2 = vh.select(
        value_col, "tv",
        (2 * F.coalesce(F.sum("tv").over(wv), F.lit(0)) + F.col("tv")
         + 1).cast(_DEC).alias("r2"))
    tvd = F.col("tv").cast(_DEC)
    stats = vh.groupBy().agg(
        F.sum("tv").cast("long").alias("n"),
        F.sum(tvd * tvd * tvd - tvd).cast(_DEC).alias("tie"))
    per = (cells.join(vh2, value_col)
           .groupBy(group_col)
           .agg(F.sum(F.col(count_col).cast(_DEC) * F.col("r2"))
                .cast(_DEC).alias("r2g"),
                F.sum(count_col).cast("long").alias("ng")))
    sterm = ((F.col("r2g") * F.col("r2g")).cast("double")
             / (F.lit(4).cast("long") * F.col("ng")).cast("double"))
    srow = (per.select(sterm.alias("_t"))
            .groupBy()
            .agg(F.count("*").cast("long").alias("k"),
                 F.aggregate(F.array_sort(F.collect_list("_t")),
                             F.lit(0.0), lambda a, x: a + x).alias("_s")))
    row = stats.crossJoin(F.broadcast(srow))
    nd = F.col("n").cast("double")
    h0 = (F.lit(12.0) * F.col("_s") / (nd * (nd + F.lit(1.0)))
          - F.lit(3.0) * (nd + F.lit(1.0)))
    nn = F.col("n").cast(_DEC)
    corr = (F.lit(1.0)
            - F.col("tie").cast("double")
            / (nn * nn * nn - nn).cast("double"))
    h = det_round(h0 / corr, scale)
    dof = (F.col("k") - 1).cast("int")
    crit = (F.element_at(
        F.array(*[F.lit(p) for p in CHI2_95_PPM_BY_DOF]), dof)
        .cast("double") / F.lit(1_000_000).cast("double"))
    ok = (F.col("k") >= 2) & (F.col("tie").cast("double")
                              < (nn * nn * nn - nn).cast("double"))
    return row.select(
        F.col("n"), F.col("k").alias("n_groups"),
        F.when(ok, h).alias("h"),
        dof.alias("dof"),
        F.when(ok & (dof <= len(CHI2_95_PPM_BY_DOF)),
               h > crit).alias("significant"))


def kruskal_report_sql(cells_cte: str, *, group_col: str = "g",
                       value_col: str = "v", count_col: str = "c",
                       scale: int = 4) -> str:
    """DuckDB twin of :func:`kruskal_from_counts` — emits the CTE
    chain + final single-row SELECT for a cells CTE named
    ``cells_cte`` with columns (group, value, count)."""
    from ..functions.detmath import det_round_sql

    crit_list = "[" + ", ".join(str(p) for p in CHI2_95_PPM_BY_DOF) + "]"
    fold = ("list_reduce(list_prepend(0.0, list_sort(list(_t))), "
            "(acc, x) -> acc + x)")
    h_expr = det_round_sql("_h0 / _corr", scale)
    return f"""
vh AS (
    SELECT {value_col} AS v, CAST(sum({count_col}) AS BIGINT) AS tv
    FROM {cells_cte} GROUP BY 1
),
vh2 AS (
    SELECT v, tv,
           CAST(2 * coalesce(sum(tv) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) + tv + 1 AS HUGEINT) AS r2
    FROM vh
),
kstats AS (
    SELECT CAST(sum(tv) AS BIGINT) AS n,
           CAST(sum(CAST(tv AS HUGEINT) * tv * tv - tv) AS HUGEINT)
               AS tie
    FROM vh
),
kper AS (
    SELECT {group_col},
           CAST(sum(CAST({count_col} AS HUGEINT) * r2) AS HUGEINT)
               AS r2g,
           CAST(sum({count_col}) AS BIGINT) AS ng
    FROM {cells_cte} JOIN vh2 ON {cells_cte}.{value_col} = vh2.v
    GROUP BY 1
),
ksrow AS (
    SELECT CAST(count(*) AS BIGINT) AS k, {fold} AS _s
    FROM (SELECT CAST(r2g * r2g AS DOUBLE)
                 / CAST(4 * ng AS DOUBLE) AS _t FROM kper)
),
kassembly AS (
    SELECT n, k, tie,
           CAST('12.0' AS DOUBLE) * _s
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
                                   + CAST('1.0' AS DOUBLE)))
           - CAST('3.0' AS DOUBLE) * (CAST(n AS DOUBLE)
                                      + CAST('1.0' AS DOUBLE)) AS _h0,
           CAST('1.0' AS DOUBLE)
           - CAST(tie AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE) AS _corr,
           CAST(tie AS DOUBLE)
             < CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE) AS _hasinfo
    FROM kstats CROSS JOIN ksrow
)
SELECT n, k AS n_groups,
       CASE WHEN k >= 2 AND _hasinfo THEN {h_expr} END AS h,
       CAST(k - 1 AS INT) AS dof,
       CASE WHEN k >= 2 AND _hasinfo
                 AND k - 1 <= {len(CHI2_95_PPM_BY_DOF)}
            THEN {h_expr} > CAST({crit_list}[CAST(k - 1 AS INT)]
                                 AS DOUBLE)
                            / CAST(1000000 AS DOUBLE) END AS significant
FROM kassembly
"""


#: PSI "significant shift" convention threshold (industry standard:
#: < 0.1 stable, 0.1-0.2 moderate, > 0.2 action) — compared against
#: det_round(psi, 4) so the flag can never disagree with the printed
#: statistic.
PSI_ACTION = 0.2


def psi_report(per_b: DataFrame, *, group_cols: Sequence[str],
               a: str = "a", b: str = "b") -> DataFrame:
    """Population Stability Index per group from a per-bucket count
    relation: ``per_b`` has one row per (group, bucket) with the two
    periods' counts in ``a``/``b`` (zeros allowed — Laplace +1
    smoothing keeps every ln finite; B = the group's observed-bucket
    count enters both denominators):

        PSI = Σ_i (p_i − q_i)·ln(p_i/q_i),
        p_i = (a_i+1)/(n_a+B),  q_i = (b_i+1)/(n_b+B).

    Determinism: ln runs on the INTEGER cross-ratio (a_i+1)(n_b+B) /
    (b_i+1)(n_a+B) through the det_ln bit-parity DAG (overflow:
    (n+1)(n+B) must fit int64 — ~3e9 events/group; decimals beyond);
    the share differences divide exact integers as identical doubles;
    the bucket sum folds SORTED terms; det_round(…, 4) at the edge.
    psi/unstable NULL when either period is empty.  Bounded end to
    end: everything here runs on the (group × bucket)-sized relation
    the caller built.

    The group totals ride a WINDOW over that same relation rather than
    a groupBy + self-join: per_b is typically an un-materialized
    subtree (e.g. latency_psi's crossJoin of the checkpointed cells
    with the split-day scalar), and a self-join would re-plan that
    subtree once per branch — double-scanning it and double-counting
    its sanctioned broadcast in the plan gate.  The window shares ONE
    subtree and its state is bounded by the relation itself."""
    from ..functions.detmath import det_round, with_det_ln

    gc = list(group_cols)
    wg = Window.partitionBy(*gc)
    j = per_b.select(
        "*",
        F.sum(a).over(wg).cast("long").alias("na"),
        F.sum(b).over(wg).cast("long").alias("nb"),
        F.count(F.lit(1)).over(wg).cast("long").alias("nbk"))
    j = with_det_ln(j, (F.col(a) + 1) * (F.col("nb") + F.col("nbk")),
                    (F.col(b) + 1) * (F.col("na") + F.col("nbk")), "lr")
    p = (F.col(a) + 1).cast("double") \
        / (F.col("na") + F.col("nbk")).cast("double")
    q = (F.col(b) + 1).cast("double") \
        / (F.col("nb") + F.col("nbk")).cast("double")
    per = (j.select(*gc, "na", "nb", "nbk",
                    ((p - q) * F.col("lr")).alias("term"))
           .groupBy(*gc)
           .agg(F.max("na").alias("n_base"), F.max("nb").alias("n_curr"),
                F.max("nbk").alias("n_buckets"),
                F.aggregate(F.array_sort(F.collect_list("term")),
                            F.lit(0.0), lambda acc, x: acc + x)
                .alias("_psi")))
    ok = (F.col("n_base") > 0) & (F.col("n_curr") > 0)
    psi = det_round(F.col("_psi"), 4)
    return per.select(
        *gc, "n_base", "n_curr", "n_buckets",
        F.when(ok, psi).alias("psi"),
        F.when(ok, psi > F.lit(PSI_ACTION)).alias("unstable"))


#: ceil(ln(2/0.05)·10^6) for the Pettitt significance rule — the CEIL
#: makes the integral comparison CONSERVATIVE (a K in the 2e-7-relative
#: band between ln(40) and this constant fails to reject, never the
#: reverse).
PETTITT_LN40_PPM = 3_688_880


def pettitt_changepoint(series: DataFrame, *, group_cols: Sequence[str],
                        time_col: str, value_col: str) -> DataFrame:
    """Pettitt's nonparametric changepoint test per group: WHERE does a
    time series most plausibly split into before/after distributions,
    and is the split significant?

        U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j),   K = max_{t<n} |U_t|,
        p ≈ 2·exp(−6K² / (n³ + n²)),  reject at α = 5% ⟺
        6·K² ≥ ln(40)·(n³ + n²).

    Rank identity that makes it one pass instead of O(n²): with
    midranks r_i over the group (ties included),
    Σ_j sgn(x_i − x_j) = 2r_i − (n+1) EXACTLY (derivation: #less =
    r_i − (t_i+1)/2, #greater = n − #less − t_i, difference telescopes
    to 2r_i − (n+1)), and the within-prefix part of U_t cancels by
    antisymmetry, so U_t = Σ_{i≤t} (2r_i − (n+1)).  Doubled midranks
    ``R2_i = 2·(rank_i − 1) + t_i + 1`` keep everything integer.

    Input: ONE row per (group, time) — an already-aggregated bounded
    relation (e.g. the per-day means the FDR audit builds), never raw
    events; both windows below run on it.  Output per group: n,
    change_t (the argmax-|U| time, min on ties — the LAST index of the
    "before" segment), k_stat, u_sign (+1 = values RANK HIGHER before
    the change, i.e. a downward level shift after it), shifted.
    Groups with n < 2 report k_stat 0, NULL change_t, shifted false
    (a single observation cannot split).

    Determinism/overflow: U and K are exact integers; the significance
    comparison runs in DECIMAL(38,0)/HUGEINT (K ≤ n²/2, so 6·10⁶·K²
    overflows int64 past n ≈ 3.5e3 — fine for decades of days, and the
    decimal path is exact to n ≈ 6e7).  The α constant is
    :data:`PETTITT_LN40_PPM` parts-per-million, ceiling-rounded so the
    integral rule is conservative."""
    gc = list(group_cols)
    wv = Window.partitionBy(*gc).orderBy(value_col)
    wtie = Window.partitionBy(*gc, value_col)
    wg = Window.partitionBy(*gc)
    wt = (Window.partitionBy(*gc).orderBy(time_col)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wti = Window.partitionBy(*gc).orderBy(time_col)
    ranked = series.select(
        *gc, time_col,
        (2 * (F.rank().over(wv) - 1) + F.count("*").over(wtie) + 1)
        .cast("long").alias("_r2"),
        F.count("*").over(wg).cast("long").alias("_n"))
    u = (ranked
         .withColumn("_t", F.row_number().over(wti))
         .withColumn("_u", (F.sum("_r2").over(wt)
                            - F.col("_t") * (F.col("_n") + 1))
                     .cast("long"))
         .filter(F.col("_t") < F.col("_n")))  # U_n ≡ 0, not a split
    kw = F.max(F.abs(F.col("_u"))).over(wg)
    per = (u.withColumn("_k", kw)
           .groupBy(*gc)
           .agg(F.max("_n").alias("_n"),
                F.max("_k").cast("long").alias("k_stat"),
                # struct-min argmin: change_t AND its sign come from the
                # SAME row (the earliest argmax) — an independent
                # min-of-sign could pair the time of one tie row with
                # the sign of another
                F.min(F.when(F.abs(F.col("_u")) == F.col("_k"),
                             F.struct(F.col(time_col).alias("t"),
                                      F.signum("_u").alias("s"))))
                .alias("_arg")))
    per = per.select(
        *gc, "_n", "k_stat",
        F.col("_arg").getField("t").alias("change_t"),
        F.col("_arg").getField("s").cast("int").alias("u_sign"))
    # n = 1 groups produce no U rows; restore them with the null report
    singles = (series.groupBy(*gc)
               .agg(F.count("*").cast("long").alias("_n"))
               .filter(F.col("_n") < 2)
               .select(*gc, "_n", F.lit(0).cast("long").alias("k_stat"),
                       F.lit(None).cast("long").alias("change_t"),
                       F.lit(0).cast("int").alias("u_sign")))
    allg = per.unionByName(singles)
    n = F.col("_n").cast(_DEC)
    sig = (F.lit(6_000_000).cast(_DEC)
           * F.col("k_stat").cast(_DEC) * F.col("k_stat").cast(_DEC)
           >= F.lit(PETTITT_LN40_PPM).cast(_DEC) * (n * n * n + n * n))
    return allg.select(
        *gc, F.col("_n").alias("n"), "change_t", "k_stat", "u_sign",
        (sig & (F.col("_n") >= 2)).alias("shifted"))


def pettitt_report_sql(series_cte: str, group_cols: Sequence[str], *,
                       time_col: str = "t", value_col: str = "x",
                       n_alias: str = "n",
                       change_alias: str = "change_t") -> str:
    """DuckDB twin of :func:`pettitt_changepoint`: ``series_cte`` has
    columns (group…, {time_col}, {value_col}), one row per time.
    ``n_alias``/``change_alias`` rename the output columns so query
    twins can match their Spark side's aliases."""
    g = ", ".join(group_cols)
    return f"""
rk AS (
    SELECT {g}, {time_col},
           CAST(2 * (rank() OVER (PARTITION BY {g} ORDER BY {value_col})
                     - 1)
                + count(*) OVER (PARTITION BY {g}, {value_col})
                + 1 AS BIGINT) AS _r2,
           CAST(count(*) OVER (PARTITION BY {g}) AS BIGINT) AS _n
    FROM {series_cte}
),
uu AS (
    SELECT {g}, {time_col}, _n,
           CAST(sum(_r2) OVER (PARTITION BY {g} ORDER BY {time_col}
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           - CAST(row_number() OVER (PARTITION BY {g}
                                     ORDER BY {time_col})
                  AS BIGINT) * (_n + 1) AS _u,
           row_number() OVER (PARTITION BY {g} ORDER BY {time_col}) AS _t
    FROM rk
),
uk AS (
    SELECT *, max(abs(_u)) OVER (PARTITION BY {g}) AS _k
    FROM uu WHERE _t < _n
),
per AS (
    SELECT {g}, CAST(max(_n) AS BIGINT) AS _n,
           CAST(max(_k) AS BIGINT) AS k_stat,
           (min(CASE WHEN abs(_u) = _k
                     THEN {{'t': {time_col}, 's': sign(_u)}} END)).t
               AS _chg,
           CAST((min(CASE WHEN abs(_u) = _k
                          THEN {{'t': {time_col}, 's': sign(_u)}} END)).s
                AS INT) AS u_sign
    FROM uk GROUP BY {g}
    UNION ALL
    SELECT {g}, CAST(count(*) AS BIGINT) AS _n,
           CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS INT)
    FROM {series_cte} GROUP BY {g} HAVING count(*) < 2
)
SELECT {g}, _n AS {n_alias}, _chg AS {change_alias}, k_stat, u_sign,
       (CAST(6000000 AS HUGEINT) * k_stat * k_stat
        >= CAST({PETTITT_LN40_PPM} AS HUGEINT)
           * (CAST(_n AS HUGEINT) * _n * _n + CAST(_n AS HUGEINT) * _n))
       AND _n >= 2 AS shifted
FROM per
"""


def ks_report_sql(hist_cte: str, group_cols: Sequence[str], *,
                  scale: int = 4) -> str:
    """DuckDB twin of :func:`ks_from_counts`: takes the name of a CTE
    with columns (group…, v, ca, cb) and emits the final SELECT.
    HUGEINT keeps every cross-product exact below 10^38, mirroring the
    Spark side's DECIMAL(38,0)."""
    g = ", ".join(group_cols)
    ks = exact_round_div_sql("CAST(_dnum AS BIGINT)", "n_a * n_b", scale)
    return f"""
cum AS (
    SELECT {g}, v,
           sum(ca) OVER (PARTITION BY {g} ORDER BY v) AS cuma,
           sum(cb) OVER (PARTITION BY {g} ORDER BY v) AS cumb,
           sum(ca) OVER (PARTITION BY {g}) AS ta,
           sum(cb) OVER (PARTITION BY {g}) AS tb
    FROM {hist_cte}
),
per AS (
    SELECT {g},
           CAST(max(ta) AS BIGINT) AS n_a,
           CAST(max(tb) AS BIGINT) AS n_b,
           max(abs(CAST(cuma AS HUGEINT) * CAST(tb AS HUGEINT)
                   - CAST(cumb AS HUGEINT) * CAST(ta AS HUGEINT))) AS _dnum
    FROM cum GROUP BY {g}
)
SELECT {g}, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN {ks} END AS ks_d,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
            CAST(1000000 AS HUGEINT) * _dnum * _dnum
            > CAST({KS_C2_PPM} AS HUGEINT) * (n_a + n_b) * n_a * n_b
       END AS drifted
FROM per
"""
