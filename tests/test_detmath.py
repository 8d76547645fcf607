"""Bit-level cross-engine parity for functions/detmath — the primitives
every float-emitting query leans on.  These tests compare raw 64-bit
patterns (struct.pack), not approximate equality: the whole contract is
ZERO ulp of divergence between Spark and DuckDB.
"""

from __future__ import annotations

import math
import random
import struct
from fractions import Fraction

import duckdb
import pytest

from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.functions.detmath import (
    det_exp_sql_items, det_ln_ratio, det_ln_sql_items, exact_round_div,
    exact_round_div_sql, with_det_exp, with_det_ln)


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


EDGE_PAIRS = [
    (1, 1), (2, 1), (1, 2), (3, 7), (10 ** 12, 1), (1, 10 ** 12),
    (999_999, 1_000_000), (2 ** 40, 3), (2 ** 52, 1), (1, 2 ** 52),
    (6, 3), (7, 3), (2 ** 31 - 1, 2 ** 31),
]


def _spark_vs_duck(spark, pairs, spark_col, sql_items):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a long, b long")
    sp = {r.i: r.v for r in df.select("i", spark_col.alias("v")).collect()}
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE q(i BIGINT, a BIGINT, b BIGINT)")
        con.executemany("INSERT INTO q VALUES (?,?,?)",
                        [(i, a, b) for i, (a, b) in enumerate(pairs)])
        dk = {r[0]: r[1] for r in con.execute(
            f"SELECT i, v FROM (SELECT i, {sql_items} FROM q) t").fetchall()}
    finally:
        con.close()
    return sp, dk


def test_det_ln_bit_identical(spark):
    rng = random.Random(1234)
    pairs = [(rng.randint(1, 10 ** 12), rng.randint(1, 10 ** 12))
             for _ in range(20_000)] + EDGE_PAIRS
    sp, dk = _spark_vs_duck(
        spark, pairs, det_ln_ratio(F.col("a"), F.col("b")),
        det_ln_sql_items("a", "b", "v").replace("\n", " "))
    mism = [i for i in sp if _bits(sp[i]) != _bits(dk[i])]
    assert not mism, f"{len(mism)} bit mismatches, first: {pairs[mism[0]]}"
    # and the value is a faithful ln (few-ulp tolerance, NOT exactness)
    worst = max(abs(sp[i] - math.log(pairs[i][0] / pairs[i][1]))
                for i in range(len(pairs)))
    assert worst < 1e-16 + 1e-14 * max(
        abs(math.log(a / b)) for a, b in pairs)


def test_exact_round_div_bit_identical_and_exact(spark):
    rng = random.Random(99)
    pairs = [(rng.randint(-10 ** 9, 10 ** 9), rng.randint(1, 10 ** 6))
             for _ in range(20_000)]
    e = exact_round_div_sql("abs(a)", "b")
    sp, dk = _spark_vs_duck(
        spark, pairs, exact_round_div(F.col("a"), F.col("b")),
        f"CASE WHEN a < 0 THEN -{e} ELSE {e} END AS v")
    mism = [i for i in sp if _bits(sp[i]) != _bits(dk[i])]
    assert not mism, f"{len(mism)} bit mismatches"
    # spot-check against exact rational half-away-from-zero rounding
    for i, (n, d) in enumerate(pairs[:500]):
        scaled = Fraction(n, d) * 10_000
        want = math.floor(abs(scaled) + Fraction(1, 2)) * (1 if n >= 0 else -1)
        assert sp[i] == pytest.approx(want / 10_000.0, abs=0), (n, d)


def test_with_det_ln_bitwise_equals_inline(spark):
    """The staged (hot-path) form computes the IDENTICAL doubles as the
    inline Column form — same DAG, different evaluation shape."""
    rng = random.Random(7)
    pairs = [(rng.randint(1, 10 ** 12), rng.randint(1, 10 ** 12))
             for _ in range(5_000)] + EDGE_PAIRS
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a long, b long")
    staged = {r.i: r.v for r in with_det_ln(
        df, F.col("a"), F.col("b"), "v").select("i", "v").collect()}
    inline = {r.i: r.v for r in df.select(
        "i", det_ln_ratio(F.col("a"), F.col("b")).alias("v")).collect()}
    assert all(_bits(staged[i]) == _bits(inline[i]) for i in staged)


def test_det_exp_bit_identical_and_faithful(spark):
    """with_det_exp vs its DuckDB twin: zero-ulp cross-engine parity on
    ln-composed arguments (the temperature-weight use), and few-ulp
    faithfulness to math.exp."""
    rng = random.Random(4321)
    # α·ln(n) arguments in both signs, covering the whole useful range
    xs = [rng.uniform(-30.0, 30.0) for _ in range(20_000)] \
        + [0.0, 1.0, -1.0, 0.3466, -0.3466, 29.9, -29.9]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "i long, x double")
    sp = {r.i: r.v for r in with_det_exp(
        df, F.col("x"), "v").select("i", "v").collect()}
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE q(i BIGINT, x DOUBLE)")
        con.executemany("INSERT INTO q VALUES (?,?)",
                        list(enumerate(xs)))
        items = det_exp_sql_items("x", "v").replace("\n", " ")
        dk = {r[0]: r[1] for r in con.execute(
            f"SELECT i, v FROM (SELECT i, {items} FROM q) t").fetchall()}
    finally:
        con.close()
    mism = [i for i in sp if _bits(sp[i]) != _bits(dk[i])]
    assert not mism, f"{len(mism)} bit mismatches, first x: {xs[mism[0]]}"
    worst = max(abs(sp[i] - math.exp(xs[i])) / math.exp(xs[i])
                for i in sp)
    assert worst < 1e-14


def test_det_exp_inverts_det_ln(spark):
    """exp(α·ln n) at α=1 recovers n to ~1e-14 relative — the
    deterministic power is a faithful power, not just a consistent
    hash input."""
    ns = [1, 2, 3, 10, 999, 10 ** 6, 10 ** 12]
    df = spark.createDataFrame([(i, n) for i, n in enumerate(ns)],
                               "i long, n long")
    df = with_det_ln(df, F.col("n"), F.lit(1), "lnv")
    rows = with_det_exp(df, F.col("lnv"), "v").select("i", "v").collect()
    for r in rows:
        assert abs(r.v - ns[r.i]) / ns[r.i] < 1e-14


def test_det_exp_out_of_range_is_null(spark):
    df = spark.createDataFrame([(60.0,), (-60.0,)], "x double")
    vals = [r.v for r in with_det_exp(df, F.col("x"), "v")
            .select("v").collect()]
    assert vals == [None, None]


def test_with_det_ln_drops_scratch_columns(spark):
    df = spark.createDataFrame([(10, 3)], "a long, b long")
    out = with_det_ln(df, F.col("a"), F.col("b"), "lnv")
    assert out.columns == ["a", "b", "lnv"]


def test_exact_round_div_null_on_zero_denominator(spark):
    df = spark.createDataFrame([(5, 0)], "a long, b long")
    [r] = df.select(exact_round_div(F.col("a"), F.col("b")).alias("v")).collect()
    assert r.v is None


def test_det_round_zero_sign_bit_parity(spark):
    """ADVICE r6: Spark signum(-0.0) is -0.0, so before the +0.0
    normalization a zero-magnitude det_round result was -0.0 on Spark
    and +0.0 on the DuckDB CASE twin ('x < 0' is false for -0.0) — a
    bit-level asymmetry the driver's type/bit-sensitive hash punishes.
    Both dialects now carry a trailing +0.0; this pins (a) zero-ulp
    cross-engine parity on adversarial zero-neighborhood inputs and
    (b) that every zero-magnitude result is POSITIVE zero bits."""
    from realtime_log_analytics_flink_kafka_spark.functions.detmath import (
        det_round, det_round_sql)

    # NaN/inf are outside det_round's precondition (|x|·10^k < 2^53)
    # — Spark's floor returns BIGINT so they aren't representable.
    xs = [-0.0, 0.0, -1e-10, 1e-10, -4.9e-7, 4.9e-7, -5.1e-7,
          -1.0, 1.0, -0.00000049999, -123.4567891, 123.4567894, -1e-300]
    rows = [(i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i long, x double")
    sp = {r.i: r.v for r in
          df.select("i", det_round(F.col("x"), 6).alias("v")).collect()}
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE q(i BIGINT, x DOUBLE)")
        con.executemany("INSERT INTO q VALUES (?,?)", rows)
        dk = {r[0]: r[1] for r in con.execute(
            f"SELECT i, {det_round_sql('x', 6)} AS v FROM q").fetchall()}
    finally:
        con.close()
    mism = [i for i in sp if _bits(sp[i]) != _bits(dk[i])]
    assert not mism, f"bit mismatches at inputs {[xs[i] for i in mism]}"
    # every zero-magnitude output must be +0.0, not -0.0
    for i, x in enumerate(xs):
        if sp[i] == 0.0:
            assert _bits(sp[i]) == _bits(0.0), f"-0.0 leaked for x={x}"
