"""Meta-tests of the correctness gate itself (tests/oracle_harness):
the whole round's evidence flows through ``compare``, so prove it
actually rejects each mismatch class and accepts only order
differences — a gate that silently passes everything would make every
green row meaningless.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _df(spark, rows, schema="k long, v double"):
    return spark.createDataFrame(rows, schema)


def test_accepts_row_and_column_order_differences(spark, con):
    df = _df(spark, [(1, 1.5), (2, 2.5)])
    # oracle emits reversed rows AND reversed column order
    compare(df, con,
            "SELECT v, k FROM (VALUES (2, 2.5), (1, 1.5)) t(k, v)",
            "order-insensitive")


def test_rejects_value_mismatch(spark, con):
    df = _df(spark, [(1, 1.5)])
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(df, con, "SELECT 1 AS k, 1.5000001 AS v", "value")


def test_rejects_one_ulp_float_difference(spark, con):
    import math
    v = 0.1 + 0.2  # 0.30000000000000004
    df = _df(spark, [(1, v)])
    compare(df, con, f"SELECT 1 AS k, CAST('{v!r}' AS DOUBLE) AS v", "exact")
    bumped = math.nextafter(v, 1.0)
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(df, con,
                f"SELECT 1 AS k, CAST('{bumped!r}' AS DOUBLE) AS v", "ulp")


def test_rejects_row_count_mismatch(spark, con):
    df = _df(spark, [(1, 1.5)])
    with pytest.raises(AssertionError, match="row count"):
        compare(df, con,
                "SELECT * FROM (VALUES (1, 1.5), (2, 2.5)) t(k, v)", "rows")


def test_rejects_column_name_mismatch(spark, con):
    df = _df(spark, [(1, 1.5)])
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(df, con, "SELECT 1 AS k, 1.5 AS wrong_name", "cols")


def test_null_and_nan_are_distinct(spark, con):
    df = _df(spark, [(1, None)])
    compare(df, con, "SELECT 1 AS k, CAST(NULL AS DOUBLE) AS v", "null")
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(df, con, "SELECT 1 AS k, CAST('nan' AS DOUBLE) AS v",
                "null-vs-nan")
