"""Batch sinks: partitioned parquet and bucketed tables.

The reference's only sink is Kafka (SURVEY.md §2.1 S5-S7 —
flink/error_rate_detector.py:175-189 et al.; sources/kafka.py ports
those).  A batch engine at 100 TB additionally needs its outputs laid
out for the NEXT query:

- **partitioned parquet** (``partitionBy``): coarse, low-cardinality keys
  (date, event_type) become directories — downstream filters on them
  prune whole files before any IO (Catalyst PartitionFilters).
- **bucketed tables** (``bucketBy``): high-cardinality join/agg keys are
  hash-bucketed at write time; two tables bucketed the same way join
  with NO Exchange on either side — the shuffle is paid once at write,
  amortized over every subsequent join (the batch analogue of Kafka
  keyed-topic partitioning, kafka/log_producer.py:88).

Guardrails encoded here: partition columns must be low-cardinality
(every distinct value is a directory + files); bucket counts should be
a multiple of cluster parallelism; ``maxRecordsPerFile`` caps file size
under skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: list[str], *,
                      mode: str = "overwrite",
                      max_records_per_file: int | None = 5_000_000) -> None:
    """Write parquet partitioned by the given (low-cardinality) columns.

    ``maxRecordsPerFile`` bounds single-file size when one partition
    value dominates (skew) — complements AQE, which balances tasks but
    not output files.
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*partition_by).parquet(path)


def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_by: list[str], num_buckets: int, *,
                   sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write an external bucketed table (data at ``path``, metadata in
    the session catalog — bucketing lives in table metadata, so readers
    must go through ``spark.table``/:func:`read_bucketed`).

    ``sort_by`` additionally sorts within buckets, upgrading later
    merge-joins on the same key to sort-free.
    """
    w = (df.write.mode(mode).option("path", path)
         .bucketBy(num_buckets, *bucket_by))
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves bucketing metadata (a plain
    ``spark.read.parquet(path)`` on the same files would lose it and
    reintroduce the shuffle)."""
    return spark.table(table)


def idempotent_parquet_sink(path: str):
    """foreachBatch sink with exactly-once OUTPUT: each micro-batch
    overwrites its own epoch-addressed directory, so a replayed epoch
    (failure after write, before checkpoint commit) rewrites the same
    files instead of appending duplicates.

    Structured Streaming's end-to-end exactly-once guarantee is a triad
    — replayable source + checkpointed offsets + IDEMPOTENT sink; the
    first two alone are at-least-once into the sink.  The reference has
    no idempotent sink anywhere (its Kafka producer appends, and its
    uncheckpointed third job, SURVEY §2.1 S7, both loses state and
    duplicates output on restart) — this is the batch-output half it is
    missing.  Read the result back with ``spark.read.parquet(path)``:
    ``epoch`` surfaces as a partition column and prunes like any other.
    """
    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")
    return _write
