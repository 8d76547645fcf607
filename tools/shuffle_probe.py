"""Measure total shuffle write bytes + records for one registry query.

Runs the named query in a fresh local session with the Spark event log
enabled, then sums ``Shuffle Bytes Written`` / ``Shuffle Records Written``
across all SparkListenerTaskEnd events.  Used for before/after evidence
when a rewrite claims a shuffle-volume reduction (VERDICT r7 #2:
embedding_effective_rank).

Usage: python tools/shuffle_probe.py <query_name> [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    evdir = tempfile.mkdtemp(prefix="spark-events-")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
             .appName(f"shuffle-probe-{name}")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", evdir)
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled",
                     os.environ.get("PROBE_AQE", "true"))
             .config("spark.sql.files.maxPartitionBytes",
                     os.environ.get("PROBE_MPB", "134217728"))
             .getOrCreate())
    from realtime_log_analytics_flink_kafka_spark.queries import all_queries
    spec = all_queries()[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    app_id = spark.sparkContext.applicationId
    spark.stop()

    sh_bytes = sh_recs = 0
    per_stage = {}
    # Spark 4 rolls event logs into an eventlog_v2_<appId>/ directory.
    import glob
    paths = (glob.glob(os.path.join(evdir, app_id + "*"))
             + glob.glob(os.path.join(evdir, f"eventlog_v2_{app_id}", "events_*")))
    paths = [p for p in paths if os.path.isfile(p)]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                ev = json.loads(line)
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                m = ((ev.get("Task Metrics") or {})
                     .get("Shuffle Write Metrics") or {})
                sh_bytes += m.get("Shuffle Bytes Written", 0)
                sh_recs += m.get("Shuffle Records Written", 0)
                sid = ev.get("Stage ID")
                b, r = per_stage.get(sid, (0, 0))
                per_stage[sid] = (b + m.get("Shuffle Bytes Written", 0),
                                  r + m.get("Shuffle Records Written", 0))
    print(json.dumps({"query": name, "sf_dir": sf_dir, "rows": n,
                      "shuffle_bytes_written": sh_bytes,
                      "shuffle_records_written": sh_recs,
                      "per_stage": {str(k): v for k, v in
                                    sorted(per_stage.items())}}))


if __name__ == "__main__":
    main()
