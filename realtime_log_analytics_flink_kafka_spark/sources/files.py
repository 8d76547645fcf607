"""JSON-lines, CSV, and ORC batch sources/sinks.

The reference's only wire format is JSON strings on Kafka topics
(kafka/log_producer.py:86-92); landed on storage that is JSONL, and CSV
is the interchange format users reach for next.  Both readers take an
EXPLICIT schema: schema inference reads the data once just to guess
types (a full extra pass at 100 TB) and silently drifts when a batch
happens to contain only a subtype (all-null column -> string, integral
floats -> long).  With a declared schema, malformed values become nulls
under the default PERMISSIVE mode instead of failing the job — the same
posture as the Kafka JSON decode layer (sources/kafka.py).

Parquet remains the engine-native format (columnar, statistics,
pushdown); these exist for ingest/export interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType | str) -> DataFrame:
    """One JSON object per line -> typed rows (PERMISSIVE: bad records
    null out, never poison the scan)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_csv(spark: SparkSession, path: str,
             schema: T.StructType | str) -> DataFrame:
    """Header-carrying CSV with a declared schema; column order is taken
    from the header, types from the schema."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch source — the other columnar format Spark ships a native
    vectorized reader for (no extra jar, unlike Avro).  Schema rides in
    the file footer like parquet, and the same pushdown/pruning
    machinery applies (predicate pushdown into ORC stripe/row-group
    statistics), so ORC-landed data queries with parquet-equivalent
    plans."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
