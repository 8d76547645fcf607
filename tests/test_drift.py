"""operators/drift — two-sample KS: planted-shift power, invariances,
and the empty-side/zero-count edges.

The planted tests are the statistical-query discipline the FDR audit
forced (a detector can pass ORACLE PARITY while being vacuous — parity
only proves both engines compute the same thing): a shifted sample MUST
reject, an identical sample MUST NOT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.operators.drift import (
    KS_C2_PPM, ks_from_counts, ks_two_sample, pettitt_changepoint,
    psi_report)


def _rows(spark, a_vals, b_vals, group="g"):
    rows = ([(group, int(v), 1) for v in a_vals]
            + [(group, int(v), 0) for v in b_vals])
    return spark.createDataFrame(rows, "g string, v long, in_a int")


def _ks(spark, a_vals, b_vals):
    df = ks_two_sample(_rows(spark, a_vals, b_vals), group_cols=["g"],
                       value_col="v", side_a=F.col("in_a") == 1)
    return df.collect()[0]


def test_planted_shift_rejects(spark):
    """Uniform 0..99 vs the same shifted +50 (200 per side): D = 0.5 —
    far above the 5% critical 1.358·√(400/40000) ≈ 0.136."""
    r = _ks(spark, list(range(100)) * 2, [v + 50 for v in range(100)] * 2)
    assert r.n_a == 200 and r.n_b == 200
    assert r.ks_d == 0.5
    assert r.drifted is True


def test_identical_distributions_do_not_reject(spark):
    """The same sample on both sides: D = 0 exactly, no rejection —
    a flag that fires here is pure false alarm."""
    r = _ks(spark, list(range(100)) * 2, list(range(100)) * 2)
    assert r.ks_d == 0.0
    assert r.drifted is False


def test_small_shift_small_sample_does_not_reject(spark):
    """A 2-value shift at n=20 per side is far inside sampling noise
    (critical D ≈ 0.43) — the flag must stay quiet even though D > 0."""
    r = _ks(spark, range(20), [v + 2 for v in range(20)])
    assert 0 < r.ks_d < 0.43
    assert r.drifted is False


def test_side_symmetry(spark):
    """|ECDF_a − ECDF_b| is symmetric in the two samples: swapping
    sides must give the identical D and flag."""
    a, b = list(range(0, 60)), list(range(30, 120))
    r1, r2 = _ks(spark, a, b), _ks(spark, b, a)
    assert r1.ks_d == r2.ks_d
    assert r1.drifted == r2.drifted
    assert (r1.n_a, r1.n_b) == (r2.n_b, r2.n_a)


def test_monotone_transform_invariance(spark):
    """D depends only on the value ORDERING: any monotone injective
    transform (here v -> 7v + 3) leaves it exactly unchanged — the
    property that licenses the µs quantization in latency_ks_drift."""
    a, b = list(range(50)), [v + 10 for v in range(50)]
    r1 = _ks(spark, a, b)
    r2 = _ks(spark, [7 * v + 3 for v in a], [7 * v + 3 for v in b])
    assert r1.ks_d == r2.ks_d and r1.drifted == r2.drifted


def test_empty_side_yields_null(spark):
    """One-sided input: no distribution to compare — ks_d and drifted
    are NULL, not 0/false (absence of evidence, not agreement)."""
    df = ks_two_sample(_rows(spark, range(10), []), group_cols=["g"],
                       value_col="v", side_a=F.col("in_a") == 1)
    r = df.collect()[0]
    assert r.n_a == 10 and r.n_b == 0
    assert r.ks_d is None and r.drifted is None


def test_null_values_excluded(spark):
    """NULL measurements carry no distributional evidence and must not
    count toward either side's n."""
    df = _rows(spark, range(10), range(10)).union(
        _rows(spark, [0], [0]).select("g", F.lit(None).cast("long"),
                                      "in_a"))
    r = ks_two_sample(df, group_cols=["g"], value_col="v",
                      side_a=F.col("in_a") == 1).collect()[0]
    assert r.n_a == 10 and r.n_b == 10


def test_zero_count_rows_advance_the_other_ecdf(spark):
    """ks_from_counts must honor ca=0 rows: a value only side b emits
    still moves b's ECDF — dropping such rows understates D.  Here a
    occupies {0}, b occupies {1}: D = 1 exactly, and the max is only
    visible AT the b-only value."""
    hist = spark.createDataFrame(
        [("g", 0, 5, 0), ("g", 1, 0, 5)],
        "g string, v long, ca long, cb long")
    r = ks_from_counts(hist, group_cols=["g"], value_col="v").collect()[0]
    assert r.ks_d == 1.0
    assert r.drifted is True


def _pettitt(spark, series, group="g"):
    df = spark.createDataFrame([(group, t, float(x))
                                for t, x in enumerate(series, start=1)],
                               "g string, t long, x double")
    return pettitt_changepoint(df, group_cols=["g"], time_col="t",
                               value_col="x").collect()[0]


def test_pettitt_planted_step_found_and_significant(spark):
    """15 quiet days then 15 slow days: the split must land exactly on
    the last quiet day (t=15), with the textbook K = 15·15 = 225
    (every before/after pair discordant), direction = slowdown, and a
    rejection (p ≈ 2e-5)."""
    r = _pettitt(spark, [10.0] * 15 + [100.0] * 15)
    assert r.n == 30
    assert r.change_t == 15
    assert r.k_stat == 225
    assert r.u_sign == -1  # values ranked LOWER before => slowdown
    assert r.shifted is True


def test_pettitt_constant_series_never_fires(spark):
    """An all-ties series has U_t = 0 for every t (the midrank identity
    sends every R2 to n+1): K = 0, no rejection — a flag here would be
    pure false alarm."""
    r = _pettitt(spark, [7.0] * 20)
    assert r.k_stat == 0
    assert r.shifted is False


def test_pettitt_alternating_series_not_significant(spark):
    """A structureless alternating series keeps every |U_t| small —
    the test must not mistake oscillation for a level shift."""
    r = _pettitt(spark, [float(i % 2) for i in range(30)])
    assert r.shifted is False


def test_pettitt_monotone_invariance(spark):
    """Rank-based: any monotone transform of the values leaves the
    split point, K, and the verdict exactly unchanged."""
    base = [10.0] * 10 + [30.0] * 10
    r1 = _pettitt(spark, base)
    r2 = _pettitt(spark, [x * x + 5 for x in base])
    assert (r1.change_t, r1.k_stat, r1.u_sign, r1.shifted) == \
           (r2.change_t, r2.k_stat, r2.u_sign, r2.shifted)


def test_pettitt_direction_sign(spark):
    """A downward step (fast after slow) must report u_sign = +1 —
    values ranked HIGHER before the change."""
    r = _pettitt(spark, [100.0] * 12 + [10.0] * 12)
    assert r.u_sign == 1 and r.shifted is True and r.change_t == 12


def test_pettitt_single_observation_group(spark):
    """n = 1 cannot split: k_stat 0, NULL change point, no flag —
    the group must still appear in the report."""
    r = _pettitt(spark, [42.0])
    assert r.n == 1
    assert r.k_stat == 0 and r.change_t is None and r.shifted is False


def _psi(spark, counts):
    df = spark.createDataFrame([("g", i, int(a), int(b))
                                for i, (a, b) in enumerate(counts)],
                               "g string, bucket long, a long, b long")
    return psi_report(df, group_cols=["g"]).collect()[0]


def test_psi_identical_distributions_near_zero(spark):
    """Equal per-bucket mass at real sample sizes: PSI ≈ 0, no flag —
    the smoothing must not manufacture drift out of agreement."""
    r = _psi(spark, [(1000, 1000)] * 10)
    assert r.n_base == r.n_curr == 10_000
    assert r.psi < 0.001
    assert r.unstable is False


def test_psi_planted_mass_shift_fires(spark):
    """Half the mass moves to previously-cold buckets: PSI far above
    the 0.2 action threshold."""
    r = _psi(spark, [(2000, 400)] * 5 + [(400, 2000)] * 5)
    assert r.psi > 0.2
    assert r.unstable is True


def test_psi_symmetry(spark):
    """PSI is symmetric in the two periods ((p−q)ln(p/q) is invariant
    under swap): reversing base and current gives the identical
    statistic."""
    counts = [(900, 300), (300, 900), (500, 500), (10, 700)]
    r1 = _psi(spark, counts)
    r2 = _psi(spark, [(b, a) for a, b in counts])
    assert r1.psi == r2.psi and r1.unstable == r2.unstable


def test_psi_empty_period_is_null(spark):
    """A one-sided window has no drift to measure: NULL, not 0 or a
    fired flag."""
    r = _psi(spark, [(100, 0), (250, 0)])
    assert r.n_curr == 0
    assert r.psi is None and r.unstable is None


def test_psi_zero_buckets_stay_finite(spark):
    """Buckets observed in only one period must contribute a FINITE
    term (the Laplace +1 guard) — without smoothing ln(p/0) would send
    the sum to infinity."""
    import math
    r = _psi(spark, [(1000, 1000), (600, 0), (0, 600)])
    assert math.isfinite(r.psi)
    assert r.unstable is True  # a 600-count bucket vanishing IS drift


def test_flag_agrees_with_printed_statistic(spark):
    """The integral rejection rule must equal the textbook double-math
    rule on every group — the can-never-disagree contract."""
    import math
    cases = [(list(range(100)), [v + k for v in range(100)])
             for k in (0, 5, 10, 20, 40, 80)]
    for a, b in cases:
        r = _ks(spark, a, b)
        crit = math.sqrt(KS_C2_PPM / 1e6) * math.sqrt(
            (r.n_a + r.n_b) / (r.n_a * r.n_b))
        # every planted case sits >1e-3 from the boundary, so the
        # scale-4 rounding of ks_d cannot flip the comparison
        assert r.drifted == (r.ks_d > crit), (r.ks_d, crit, r.drifted)


# --- Wasserstein-1 ----------------------------------------------------------

def _w1(spark, a_vals, b_vals, unit_div=1):
    from realtime_log_analytics_flink_kafka_spark.operators.drift import (
        wasserstein_from_counts)
    df = _rows(spark, a_vals, b_vals)
    hist = (df.groupBy("g", "v")
            .agg(F.sum("in_a").cast("long").alias("ca"),
                 F.sum(1 - F.col("in_a")).cast("long").alias("cb")))
    return wasserstein_from_counts(
        hist, group_cols=["g"], unit_div=unit_div).collect()[0]


def test_w1_translation_faithful(spark):
    """The property KS and PSI both lack: shift a distribution by Δ and
    W1 = Δ EXACTLY, whether Δ is 3 or 300 (KS saturates at 1, PSI at
    its bucket grid)."""
    base = list(range(0, 100)) * 2
    for delta in (3, 50, 300):
        r = _w1(spark, base, [v + delta for v in base])
        assert r.w1 == float(delta), (delta, r.w1)


def test_w1_identical_distributions_zero(spark):
    r = _w1(spark, list(range(50)) * 3, list(range(50)) * 3)
    assert r.w1 == 0.0


def test_w1_textbook_two_point(spark):
    """Hand-checkable mass split: a = all at 0, b = half at 0, half at
    10 ⟹ half the mass moves 10 units ⟹ W1 = 5."""
    r = _w1(spark, [0] * 10, [0] * 5 + [10] * 5)
    assert r.w1 == 5.0


def test_w1_side_symmetry(spark):
    a, b = list(range(0, 60)), list(range(30, 120))
    r1, r2 = _w1(spark, a, b), _w1(spark, b, a)
    assert r1.w1 == r2.w1


def test_w1_unbalanced_sizes_normalize(spark):
    """W1 compares NORMALIZED ECDFs: duplicating one side's sample
    leaves the distance unchanged."""
    a, b = list(range(100)), [v + 7 for v in range(100)]
    assert _w1(spark, a, b).w1 == _w1(spark, a * 3, b).w1 == 7.0


def test_w1_unit_div_rescales(spark):
    """unit_div folds the quantization grid back out: values on a
    ×100 grid with unit_div=100 read in natural units."""
    a = [v * 100 for v in range(50)]
    b = [(v + 4) * 100 for v in range(50)]
    assert _w1(spark, a, b, unit_div=100).w1 == 4.0


def test_w1_empty_side_yields_null(spark):
    r = _w1(spark, list(range(10)), [])
    assert r.w1 is None and r.n_b == 0


def test_w1_single_distinct_value_both_sides(spark):
    """One shared distinct value: no lead row, numerator coalesces to
    0 — the distributions coincide."""
    r = _w1(spark, [42] * 8, [42] * 3)
    assert r.w1 == 0.0


# --- Kruskal-Wallis ---------------------------------------------------------

def _kw(spark, groups):
    """groups: dict name -> list of int values."""
    from realtime_log_analytics_flink_kafka_spark.operators.drift import (
        kruskal_from_counts)
    rows = [(g, int(v)) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    cells = df.groupBy("g", "v").agg(F.count("*").cast("long").alias("c"))
    return kruskal_from_counts(cells, group_col="g").collect()[0]


def test_kw_textbook_no_ties(spark):
    """Hand-computed: A={1,2}, B={3,4} -> ranks 1..4, R_A=3, R_B=7,
    H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4; dof=1, crit 3.8415 -> not
    significant at this tiny n even though the separation is total."""
    r = _kw(spark, {"A": [1, 2], "B": [3, 4]})
    assert r.n == 4 and r.n_groups == 2 and r.dof == 1
    assert r.h == 2.4
    assert r.significant is False


def test_kw_planted_separation_fires(spark):
    """Three disjoint blocks of 50: the omnibus must reject."""
    r = _kw(spark, {"A": list(range(0, 50)),
                    "B": list(range(100, 150)),
                    "C": list(range(200, 250))})
    assert r.n == 150 and r.dof == 2
    assert r.significant is True
    assert r.h > 100  # near the theoretical max (n-1)=149 for full separation


def test_kw_identical_distributions_quiet(spark):
    """Three groups drawing the same values (heavy ties): H ~ 0."""
    vals = list(range(10)) * 5
    r = _kw(spark, {"A": vals, "B": vals, "C": vals})
    assert r.h == 0.0
    assert r.significant is False


def test_kw_monotone_invariance(spark):
    """Rank-based: squaring the (positive) values changes nothing."""
    g = {"A": [1, 5, 9, 14], "B": [2, 6, 11, 17], "C": [3, 8, 12, 20]}
    r1 = _kw(spark, g)
    r2 = _kw(spark, {k: [v * v for v in vs] for k, vs in g.items()})
    assert r1.h == r2.h and r1.significant == r2.significant


def test_kw_single_group_null(spark):
    r = _kw(spark, {"A": [1, 2, 3]})
    assert r.h is None and r.significant is None and r.dof == 0


def test_kw_all_tied_null(spark):
    """Every observation identical: the tie correction removes ALL
    rank information (C = 0) — H must be NULL, not a 0/0 artifact."""
    r = _kw(spark, {"A": [7] * 5, "B": [7] * 5})
    assert r.h is None and r.significant is None


def test_kw_agrees_with_scipy_formula(spark):
    """Cross-check H (with tie correction) against an independent
    textbook implementation on a tied, unbalanced case."""
    groups = {"A": [3, 7, 7, 12, 1], "B": [5, 7, 9], "C": [2, 2, 14, 20]}
    import itertools
    pooled = sorted(itertools.chain.from_iterable(groups.values()))
    n = len(pooled)
    # midranks
    rank = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        rank[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    s = sum(sum(rank[v] for v in vs) ** 2 / len(vs)
            for vs in groups.values())
    h0 = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    from collections import Counter
    ties = sum(t ** 3 - t for t in Counter(pooled).values())
    h = h0 / (1 - ties / (n ** 3 - n))
    r = _kw(spark, groups)
    # the operator reports det_round(h, 4) — compare at that scale
    assert abs(r.h - h) < 5.1e-5, (r.h, h)
