"""Parquet batch readers over the fixture star schema.

The reference has no batch storage at all (Kafka topics are its only
"tables", SURVEY §1.1); batch parquet is our engine's oracle-testable
stand-in plus the scale path for 100 TB workloads (columnar scans with
predicate pushdown + column pruning, which Catalyst applies for free once
plans are declarative).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table.  Plain ``spark.read.parquet`` — filters and
    projections applied by callers push down into the scan.

    events.ts has shipped in three parquet shapes across fixture
    generations, and all three must normalize to a tz-aware TimestampType
    so downstream windowing (`window.start.cast("long")`) analyzes:

    * timestamp[ns] — with spark.sql.legacy.parquet.nanosAsLong it scans
      as a long which we truncate to microseconds (integer division: nanos
      exceed 2^53, double arithmetic would lose precision), matching
      DuckDB's ns->us truncation.
    * timestamp[us] (no tz) — Spark reads TIMESTAMP_NTZ, which refuses
      direct casts to BIGINT; cast to TIMESTAMP (session is UTC, so epoch
      values are unchanged).
    * timestamp[us, tz=UTC] — already TimestampType, passes through.
    """
    # Runtime-set (not only in our session factory): the driver calls
    # entry()/queries() with its own vanilla SparkSession.  UTC keeps
    # date_format/strftime parity with the UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Session tz is UTC (set above), so NTZ wall-clock == UTC epoch.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Register fixture tables as temp views so operators can be written in
    SQL where that is clearer (Catalyst produces the same plan)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
