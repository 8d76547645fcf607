"""Synthetic log producer — the engine's port of ``kafka/log_producer.py``
(SURVEY §2.1 S1, §3.4).

The reference producer is a Python loop emitting ~5-20 events/s per
service with per-service error rates (0.5%-30%) and a deterministic
spike window (``time % 60 < 5`` → 10× error rate, 3× latency,
kafka/log_producer.py:52-64).  Here the same workload is a pure
DataFrame transformation over a tick source, so it is:

- **batch/stream polymorphic**: ``spark.range(n)`` for tests/oracles,
  ``spark.readStream.format("rate")`` for a live demo feeding the
  detectors;
- **deterministic**: "randomness" is md5-hash-derived per tick (distinct
  salt per field), so the DuckDB oracle regenerates the identical
  stream — the reference's implicit test harness (its producer is
  *designed* so detectors fire) made reproducible;
- **JVM-side**: pure expressions, no Python in the data path, unlike the
  reference's per-event Python loop — at 1000 executors the generator
  scales with partitions of the range/rate source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

SERVICES = ("auth-service", "payment-service", "order-service",
            "notification-service")
#: per-service error rates in basis points (reference: 0.5%-30%,
#: kafka/log_producer.py:18-23)
ERROR_BP = (50, 2000, 100, 3000)
#: per-service base latency ms
BASE_LATENCY = (50, 120, 80, 40)
SPIKE_ERROR_X = 10
SPIKE_LATENCY_X = 3
BASE_EPOCH = 1_700_000_000


def ticks_to_logs(ticks: DataFrame, *, tick_col: str = "id",
                  base_epoch: int = BASE_EPOCH) -> DataFrame:
    """(tick long) -> raw log rows with the reference producer's
    distributions, fully deterministic."""
    v = F.col(tick_col)
    svc_idx = (v % len(SERVICES)).cast("int")
    ts_s = F.lit(base_epoch) + v
    spike = (ts_s % 60) < 5  # deterministic spike window

    err_bp = F.element_at(F.array(*[F.lit(r) for r in ERROR_BP]), svc_idx + 1)
    err_bp = F.when(spike, err_bp * SPIKE_ERROR_X).otherwise(err_bp)
    lvl_draw = md5_long(F.concat(v.cast("string"), F.lit(":lvl"))) % 10_000
    base_lat = F.element_at(F.array(*[F.lit(b) for b in BASE_LATENCY]),
                            svc_idx + 1)
    base_lat = F.when(spike, base_lat * SPIKE_LATENCY_X).otherwise(base_lat)
    jitter = (md5_long(F.concat(v.cast("string"), F.lit(":lat"))) % 61) - 30

    return ticks.select(
        ts_s.alias("ts_s"),
        F.element_at(F.array(*[F.lit(s) for s in SERVICES]), svc_idx + 1)
            .alias("service"),
        F.concat(F.lit("node-"), ((v % 3) + 1).cast("string")).alias("host"),
        F.when(lvl_draw < err_bp, F.lit("ERROR")).otherwise(F.lit("INFO"))
            .alias("level"),
        F.greatest(F.lit(10), base_lat + jitter).cast("long")
            .alias("latency_ms"),
    )


def synthetic_log_batch(spark: SparkSession, n: int = 10_000,
                        base_epoch: int = BASE_EPOCH) -> DataFrame:
    """Deterministic batch workload: n ticks -> n log rows."""
    return ticks_to_logs(spark.range(n), base_epoch=base_epoch)


def synthetic_log_stream(spark: SparkSession, rows_per_second: int = 50,
                         num_partitions: int = 4) -> DataFrame:
    """Live stream at ~the reference's aggregate rate (4 services x
    5-20 ev/s ≈ 50/s), from the rate source — feed straight into
    streaming.jobs.error_rate_stream after adding an event-time column:
    ``withColumn("ts", F.timestamp_seconds(F.col("ts_s")))``."""
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
        .select(F.col("value").alias("id"))
    )
    return ticks_to_logs(ticks)
