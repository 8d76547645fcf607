"""Batch sink layout tests: the write-time layouts that pay for
themselves in later plans — bucketed joins with no Exchange, partition
pruning from directory layout.  These are the 100 TB join/scan stories,
asserted on real plans rather than claimed in docstrings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_log_analytics_flink_kafka_spark.plans import formatted_plan
from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table
from realtime_log_analytics_flink_kafka_spark.sources.sinks import (
    idempotent_parquet_sink, read_bucketed, write_bucketed,
    write_partitioned)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_auto_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_auto_broadcast):
    """Two tables bucketed the same way on the join key sort-merge-join
    with ZERO Exchange nodes: the shuffle is paid once at write time and
    amortized over every later join — the batch analogue of the
    reference keying its Kafka topics by service
    (kafka/log_producer.py:86-91) so Flink's keyed operators never
    re-partition.  The co-located join is THE at-scale join strategy for
    fact-fact joins where neither side broadcasts."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice")
    try:
        write_bucketed(li, "li_bkt", str(tmp_path / "li"),
                       ["l_orderkey"], 8, sort_by=["l_orderkey"])
        write_bucketed(orders, "ord_bkt", str(tmp_path / "ord"),
                       ["o_orderkey"], 8, sort_by=["o_orderkey"])
        j = (read_bucketed(spark, "li_bkt")
             .join(read_bucketed(spark, "ord_bkt"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("qty")))
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_section, (
            "bucketed join should not shuffle either side:\n" + join_section)

        # same files read WITHOUT catalog metadata must re-shuffle —
        # proves the no-Exchange plan came from bucketing, not fixture
        # smallness
        li_raw = spark.read.parquet(str(tmp_path / "li"))
        ord_raw = spark.read.parquet(str(tmp_path / "ord"))
        raw_plan = formatted_plan(
            li_raw.join(ord_raw,
                        F.col("l_orderkey") == F.col("o_orderkey")))
        assert "Exchange" in raw_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bucketed_join_results_match_plain_join(spark, tmp_path,
                                                no_auto_broadcast):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice")
    expected = li.join(orders,
                       F.col("l_orderkey") == F.col("o_orderkey")).count()
    try:
        write_bucketed(li, "li_bkt2", str(tmp_path / "li"), ["l_orderkey"], 8)
        write_bucketed(orders, "ord_bkt2", str(tmp_path / "ord"),
                       ["o_orderkey"], 8)
        got = (read_bucketed(spark, "li_bkt2")
               .join(read_bucketed(spark, "ord_bkt2"),
                     F.col("l_orderkey") == F.col("o_orderkey")).count())
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt2")
        spark.sql("DROP TABLE IF EXISTS ord_bkt2")


def test_ivf_index_persists_as_bucketed_table(spark, tmp_path,
                                              no_auto_broadcast):
    """The ANN serving path at scale: cluster assignment (the expensive
    all-centroids scoring pass) runs ONCE at index-build time and
    persists as a table bucketed by centroid id; at query time the
    candidate equi-join on cluster id reads the bucketed corpus with no
    Exchange on the corpus side — queries broadcast, the 100 TB side
    never re-shuffles or re-scores."""
    from realtime_log_analytics_flink_kafka_spark.operators import similarity
    from realtime_log_analytics_flink_kafka_spark.sources.batch import (
        load_table as lt)

    embs = lt(spark, SF_SMOKE, "embeddings")
    centroids = embs.filter(F.col("vec_id") % 97 == 0)
    assigned = similarity.assign_clusters(embs, centroids)
    try:
        write_bucketed(assigned, "ivf_idx", str(tmp_path / "idx"),
                       ["centroid_id"], 8)
        idx = read_bucketed(spark, "ivf_idx")
        queries = (idx.filter(F.col("vec_id") < 5)
                   .select(F.col("vec_id").alias("query_id"),
                           F.col("centroid_id").alias("q_cluster")))
        cand = idx.join(F.broadcast(queries),
                        F.col("centroid_id") == F.col("q_cluster"))
        plan = formatted_plan(cand)
        assert "BroadcastHashJoin" in plan, plan
        # the bucketed corpus side must not shuffle for the probe join
        assert "Exchange hashpartitioning(centroid_id" not in plan, plan
        assert cand.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_idx")


def test_idempotent_sink_replayed_epoch_no_duplicates(spark, tmp_path):
    """The exactly-once property under replay, simulated exactly as
    Structured Streaming replays it: the same (batch, epoch_id) pair
    re-invoked after a failure-before-checkpoint-commit.  An appending
    sink doubles epoch 0; the epoch-overwrite sink must not."""
    sink = idempotent_parquet_sink(str(tmp_path / "out"))
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    sink(b0, 0)
    sink(b0, 0)  # replayed epoch — crash after write, before commit
    sink(b1, 1)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert sorted((r.id, r.v, r.epoch) for r in back.collect()) == [
        (1, "a", 0), (2, "b", 0), (3, "c", 1)]


def test_idempotent_sink_end_to_end_stream(spark, tmp_path):
    """Driven by a real streaming query: file source -> foreachBatch
    epoch-overwrite sink; output equals the batch answer and carries
    one epoch directory per micro-batch."""
    src = tmp_path / "src"
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type").limit(20)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = (spark.readStream.schema("event_id long, event_type string")
              .parquet(str(src)))
    q = (stream.writeStream
         .foreachBatch(idempotent_parquet_sink(str(tmp_path / "out")))
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.drop("epoch").count() == 20
    assert set(back.columns) == {"event_id", "event_type", "epoch"}


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """A filter on the partition column must prune directories before
    IO (PartitionFilters in the scan), not filter rows after reading."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value")
    write_partitioned(ev, str(tmp_path / "ev"), ["event_type"])
    back = spark.read.parquet(str(tmp_path / "ev"))
    filtered = back.filter(F.col("event_type") == "error")
    plan = formatted_plan(filtered)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    n_error = filtered.count()
    assert 0 < n_error < back.count()


def test_dynamic_partition_pruning_on_fact_dim_join(spark, tmp_path):
    """A fact table partitioned on the join key must be pruned by a
    FILTERED dimension at runtime (DPP): the fact scan's partition
    filter carries a dynamicpruning subquery instead of reading every
    partition and filtering after the join — at 100 TB this is the
    difference between scanning one date partition and all of them."""
    from pyspark.sql import functions as F
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table
    from realtime_log_analytics_flink_kafka_spark.sources.sinks import write_partitioned

    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd"))
    write_partitioned(ev, str(tmp_path / "fact"), ["day"])
    fact = spark.read.parquet(str(tmp_path / "fact"))

    dim = ev.select("day").distinct().withColumn(
        "is_audit_day", F.col("day") <= "2024-01-03")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # DPP inserts the pruning subquery when the build side is
        # broadcastable and the probe side is partition-keyed
        joined = (fact.join(F.broadcast(dim.filter("is_audit_day")), "day")
                  .groupBy("day").count())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_curated_corpus_export_roundtrip(spark, tmp_path):
    """The full curation story a pipeline user runs end to end: quality
    gate + exact-dedup survivor selection -> partitioned parquet export
    -> pruned read-back.  Counts must match the in-memory computation
    and the language filter must prune partitions at the scan."""
    from pyspark.sql import functions as F
    from realtime_log_analytics_flink_kafka_spark.operators import dedup, text
    from realtime_log_analytics_flink_kafka_spark.sources.batch import load_table
    from realtime_log_analytics_flink_kafka_spark.sources.sinks import write_partitioned

    docs = load_table(spark, SF_SMOKE, "documents")
    survivors = (dedup.exact_duplicates(docs)
                 .select(F.col("canonical_doc_id").alias("doc_id")))
    scored = text.quality_scores(docs).filter(F.col("quality_score") >= 0.5) \
        .select("doc_id")
    curated = docs.join(survivors, "doc_id").join(scored, "doc_id")
    expected = curated.count()
    assert 0 < expected < docs.count()

    out = str(tmp_path / "curated")
    write_partitioned(curated, out, ["lang"])
    back = spark.read.parquet(out)
    assert back.count() == expected
    # identical doc ids, not just identical counts
    assert back.select("doc_id").exceptAll(
        curated.select("doc_id")).count() == 0

    one_lang = back.filter(F.col("lang") == "en")
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
