"""PySpark-native analytics engine with the query/data-processing
capabilities of ``Osama-285/realtime-log-analytics-flink-kafka``.

The reference is a real-time log-analytics & incident-detection pipeline
(Kafka JSON topics -> PyFlink windowed detectors -> Spark Structured
Streaming metrics).  This package re-expresses every operator Spark-first:

- ``schemas``     typed StructTypes for the three event shapes (SURVEY §1.2)
- ``sources``     parquet batch readers + Kafka stream source/sink wrappers
- ``functions``   scalar expression library (guarded div, epoch casts,
                  deterministic md5-hashing, exact nearest-rank percentile)
- ``operators``   batch/stream-polymorphic DataFrame -> DataFrame operators:
                  detectors, escalation, metrics, relational extensions,
                  dedup, similarity search, text analysis, multimodal
- ``streaming``   Structured Streaming ports of the three Flink jobs
                  (stateful logic via applyInPandasWithState)
- ``registry``    the query registry consumed by ``__spark_entry__``

Design stance (SURVEY §7.0): every operator is a function over DataFrames,
declarative (Catalyst-optimizable), no RDDs, no driver-side collects in any
transform, Pandas UDFs only where built-ins genuinely cannot express the
semantics (keyed state, opaque binary decode).
"""

__version__ = "0.1.0"
