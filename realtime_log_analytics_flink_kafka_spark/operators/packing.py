"""Sequence packing: assign documents to fixed-token-budget shards —
the batching primitive of an LLM training pipeline (each shard becomes
one training sequence / file of ~budget tokens).

A document's shard is ``floor(tokens_before_it / budget)`` in a total
order over documents — a running prefix sum.  The naive formulation is
one window over the whole table ordered by id with NO partition key:
a single task scans 100 TB.  This operator uses the same two-phase
prefix-count scheme as ``escalate_every_nth_scalable``:

1. bucket documents by a coarse id range; per bucket, a windowed
   running sum (parallelism = #buckets);
2. aggregate per-bucket token totals — a tiny table (#buckets rows) —
   prefix-sum THAT per bucket order, and broadcast the offsets back;
3. global start offset = bucket offset + within-bucket prefix; shard =
   start DIV budget.

The only serial window runs over the #buckets-row table; pick
``bucket_span`` so that stays driver-trivial (1e6 buckets of 1e6 docs
covers 1e12 documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.detmath import exact_round_div


def packed_shards(docs: DataFrame, *, budget: int = 4096,
                  id_col: str = "doc_id", tokens_col: str = "n_tokens",
                  bucket_span: int = 64) -> DataFrame:
    """(id, n_tokens) -> (id, n_tokens, shard_id) with shards filled
    greedily in id order to ``budget`` tokens.

    A document straddling a budget boundary is assigned to the shard its
    FIRST token lands in (start-offset convention — the usual
    concat-then-chunk packing).  Ids are assumed non-negative.
    """
    bucket = (F.col(id_col).cast("long") / bucket_span).cast("long")
    w_local = Window.partitionBy("_pk_bucket").orderBy(id_col)
    local = (
        docs.withColumn("_pk_bucket", bucket)
        .withColumn("_pk_cum", F.sum(tokens_col).over(w_local))
    )
    counts = local.groupBy("_pk_bucket").agg(
        F.sum(tokens_col).alias("_pk_tot"))
    w_prefix = Window.orderBy("_pk_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_pk_off", F.coalesce(F.sum("_pk_tot").over(w_prefix), F.lit(0))
    ).drop("_pk_tot")
    return (
        local.join(F.broadcast(offsets), "_pk_bucket")
        # tokens before this doc; integer DIV (prefix sums at corpus
        # scale exceed double precision), non-negative so DIV == floor
        .withColumn("_pk_start",
                    F.col("_pk_off") + F.col("_pk_cum") - F.col(tokens_col))
        .withColumn("shard_id", F.expr(f"_pk_start DIV {budget}"))
        .drop("_pk_bucket", "_pk_cum", "_pk_off", "_pk_start")
    )


def shard_efficiency(shards: DataFrame, *, budget: int,
                     tokens_col: str = "n_tokens") -> DataFrame:
    """Per-shard packing audit over ``packed_shards`` output: how many
    documents start in each shard, how many tokens they contribute, and
    the fill rate against the budget.

    Under the start-offset convention a document straddling a boundary
    counts all its tokens in the shard its first token lands in, so
    ``fill_rate`` can exceed 1.0 (the overflow spills into the next
    shard, which then shows < 1.0) and the LAST shard is the only one
    that can be genuinely underfull.  One map-side-combinable
    aggregation — #shards output rows, no window.
    """
    return (
        shards.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("tokens_started"),
        )
        .select(
            "shard_id", "n_docs", "tokens_started",
            exact_round_div(F.col("tokens_started"), F.lit(budget))
                .alias("fill_rate"),
        )
    )
