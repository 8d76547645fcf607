"""Round-11 drift adjudication: isolated re-measure of the r10 driver-tail
queries (VERDICT r10 next-round #2), replicating bench.py's protocol
(untimed warmup, clearCache + GC per run, median) in a fresh quiet
session WITHOUT touching BENCH_DETAIL.json.
"""
import gc
import json
import statistics
import sys
import time

from realtime_log_analytics_flink_kafka_spark.queries import all_queries
from realtime_log_analytics_flink_kafka_spark.session import get_spark

#: Default: the r10 driver-tail drift set.  Pass query names as argv to
#: measure any other set under the same protocol (e.g. the
#: declared-in-advance cost of a round's new queries).
TAIL = sys.argv[1:] or [
    "embedding_outliers", "token_entropy", "fk_integrity_audit",
    "leakage_safe_split", "blocklist_filter", "dedup_token_loss"]
RUNS = 5
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("isolate-r11")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    out = {}
    for name in TAIL:
        fn = registry[name].fn
        spark.catalog.clearCache()
        fn(spark, SF_DIR).count()  # warmup, untimed
        samples = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            samples.append(time.perf_counter() - t0)
        out[name] = {
            "min": round(min(samples), 3),
            "median": round(statistics.median(samples), 3),
            "max": round(max(samples), 3),
            "samples": [round(s, 3) for s in samples],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("ISOLATE-DONE " + json.dumps(out))


if __name__ == "__main__":
    main()
