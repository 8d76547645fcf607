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


#: Canned message TEMPLATES (5 ERROR + 5 INFO, mirroring the reference's
#: 5+5 canned messages, kafka/log_producer.py:27-41) — ours embed the
#: variable fields (request id, latency, host) so template mining
#: (queries/reference.q_log_templates) has real masking work to do.
N_MSGS = 5


def ticks_to_logs(ticks: DataFrame, *, tick_col: str = "id",
                  base_epoch: int = BASE_EPOCH) -> DataFrame:
    """(tick long) -> raw log rows with the reference producer's
    distributions and full schema (SURVEY §1.2a: timestamp, service,
    host, level, request_id, message, latency_ms), fully deterministic:
    every draw is md5-derived from the tick with a per-field salt, so
    the DuckDB oracle regenerates the identical stream.  request_id is
    the reference's ``req-`` + 8 hex chars (log_producer.py:71) with the
    hash replacing uuid4 — the seedable variant SURVEY §7.3#6 calls for.
    """
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

    host = F.concat(F.lit("node-"), ((v % 3) + 1).cast("string"))
    level = F.when(lvl_draw < err_bp, F.lit("ERROR")).otherwise(F.lit("INFO"))
    latency = F.greatest(F.lit(10), base_lat + jitter).cast("long")
    req = F.concat(
        F.lit("req-"),
        F.substring(F.md5(F.concat(v.cast("string"), F.lit(":req"))), 1, 8))
    lat_s = latency.cast("string")
    err_msgs = F.array(
        F.concat(F.lit("db connection timeout after "), lat_s, F.lit(" ms")),
        F.concat(F.lit("failed to process request "), req),
        F.lit("upstream dependency returned 503"),
        F.concat(F.lit("cache miss storm detected on "), host),
        F.lit("unhandled exception in worker thread"),
    )
    info_msgs = F.array(
        F.concat(F.lit("request "), req, F.lit(" completed in "), lat_s,
                 F.lit(" ms")),
        F.concat(F.lit("health check ok on "), host),
        F.lit("cache refreshed successfully"),
        F.lit("user session started"),
        F.lit("scheduled job finished"),
    )
    msg_idx = (md5_long(F.concat(v.cast("string"), F.lit(":msg")))
               % N_MSGS).cast("int")
    return ticks.select(
        ts_s.alias("ts_s"),
        F.element_at(F.array(*[F.lit(s) for s in SERVICES]), svc_idx + 1)
            .alias("service"),
        host.alias("host"),
        level.alias("level"),
        req.alias("request_id"),
        F.element_at(F.when(level == "ERROR", err_msgs).otherwise(info_msgs),
                     msg_idx + 1).alias("message"),
        latency.alias("latency_ms"),
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
