"""Runnable live demo: the reference's whole topology in one process.

    python -m realtime_log_analytics_flink_kafka_spark.demo [seconds]

Mirrors the reference's deployment (README.md "How to Run": producer +
three Flink jobs + two Spark notebooks) with Spark-native pieces:

- synthetic producer  -> rate source, deterministic md5 draws
  (kafka/log_producer.py:77-97)
- error-rate detector -> sliding-window streaming query
  (flink/error_rate_detector.py)
- latency p95 monitor -> tumbling-window streaming query
  (flink/latency_slo_monitor.py)
- alert union + 1-min metrics -> update-mode windowed aggregation
  (spark/spark_incident_alerts_metrics.ipynb)
- console output via the notebooks' skip-empty foreachBatch (S6)

Kafka hops become in-process DataFrame chains (no broker in this image —
README "Environment limits"); with a broker, insert
``sources.kafka.write_kafka_stream`` / ``read_kafka_stream`` at each hop
and the queries are unchanged.

The rate source advances event time ~rows_per_second ticks/sec, so the
producer's 60-tick spike cycle fires detectors within seconds of wall
time.  Windows/thresholds here are the reference's own (20s/10s sliding,
1-min tumbling) — event-time seconds, compressed in wall time.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from .session import get_spark
from .sources.kafka import foreach_batch_non_empty
from .sources.producer import synthetic_log_stream
from .streaming.jobs import (alert_stream_union, error_rate_stream,
                             latency_p95_stream)


def main(duration_s: int = 20, rows_per_second: int = 400) -> int:
    spark = get_spark("loglytics-demo")
    spark.sparkContext.setLogLevel("ERROR")
    # streaming stateful ops at the default 200 shuffle partitions run
    # 200 state-store tasks per micro-batch — pointless on one machine.
    # getOrCreate may hand back a shared session (tests), so restore.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    logs = synthetic_log_stream(
        spark, rows_per_second=rows_per_second
    ).withColumn("ts", F.timestamp_seconds(F.col("ts_s"))) \
     .withColumn("is_error", (F.col("level") == "ERROR").cast("int"))

    rate_alerts = error_rate_stream(logs, min_support=20, threshold=0.05)
    p95s = latency_p95_stream(logs)
    slo_alerts = p95s.select(
        "service",
        F.col("window_start").alias("ws"),
        F.col("p95_latency"),
    ).filter(F.col("p95_latency") > 100)

    alerts = alert_stream_union(
        rate_alerts.select("service", "incident_id", "error_rate"),
        slo_alerts.select("service", "p95_latency"),
    )

    seen = {"batches": 0, "rows": 0}

    @foreach_batch_non_empty
    def show(batch_df, epoch_id):
        seen["batches"] += 1
        seen["rows"] += batch_df.count()
        print(f"=== alert batch {epoch_id} ===")
        batch_df.show(20, truncate=False)

    # processing-time trigger (the notebooks' W13 cadence, compressed):
    # besides parity, the idle gap between triggers is what lets the
    # shutdown below stop WITHOUT interrupting a Python callback
    q = (alerts.writeStream.outputMode("append")
         .trigger(processingTime="2 seconds")
         .foreachBatch(show).start())
    deadline = time.time() + duration_s
    while time.time() < deadline:
        time.sleep(0.5)
    # stop between triggers: interrupting a py4j foreachBatch call
    # mid-flight feeds Spark's interrupt-classifier regex a huge
    # traceback string (catastrophic backtracking -> cosmetic
    # StackOverflowError in the stream thread)
    for _ in range(40):
        if not q.status.get("isTriggerActive", False):
            break
        time.sleep(0.25)
    q.stop()
    q.awaitTermination(30)
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    print(f"demo done: {seen['batches']} non-empty batches, "
          f"{seen['rows']} alert rows in {duration_s}s")
    return 0 if seen["rows"] > 0 else 1


if __name__ == "__main__":
    secs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    raise SystemExit(main(secs))
