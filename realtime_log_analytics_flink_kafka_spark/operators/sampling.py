"""Deterministic sampling operators for training-data pipelines.

``stratified_sample`` keeps a per-stratum fraction of rows by hashing
the row id, never by ``rand()``: the same row always lands in (or out
of) the sample regardless of partitioning, retries, or engine — the
property that keeps a held-out split honest when upstream jobs are
re-run, and the same trick the hash-bucket train/val/test split uses
(queries/pipeline.py:q_doc_split_counts).

At 100 TB this is a stateless per-row filter: no shuffle, no
coordination, pushdown-friendly (the filter sits directly on the scan),
and the sample is reproducible from the salt alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.detmath import det_round, with_det_ln
from ..functions.hashing import md5_long

#: Salt for the sampling draw — distinct from the split salt so the
#: sample and the train/val/test assignment are independent hashes.
SAMPLE_SALT = ":sample"


def sample_draw(id_col: str = "doc_id") -> F.Column:
    """Uniform draw in [0, 10000) from the row id (basis points)."""
    return md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(SAMPLE_SALT))) % 10_000


def stratified_sample(df: DataFrame, rates_bp: dict[str, int], *,
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_bp: int = 0) -> DataFrame:
    """Keep each row with its stratum's probability (in basis points).

    E.g. ``{"en": 2000, "de": 10000}`` keeps ~20 % of English rows and
    all German ones; strata not listed fall back to ``default_bp``.
    Deterministic: row membership depends only on (id, salt).
    """
    rate = F.lit(default_bp)
    for stratum, bp in rates_bp.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(bp)).otherwise(rate)
    return df.filter(sample_draw(id_col) < rate)


#: Salt for the epoch-mixture draw — independent of both the sample and
#: split draws.
MIXTURE_SALT = ":mix"


def source_mixture(df: DataFrame, epochs_bp: dict[str, int], *,
                   source_col: str = "source", id_col: str = "doc_id",
                   default_bp: int = 10_000) -> DataFrame:
    """Epoch-weighted domain mixing: replicate every row ``floor(e)``
    times and keep one extra copy with probability ``frac(e)``, where
    ``e`` is the row's source weight in basis points (10000 = 1.0
    epochs).  ``{"wiki": 35000, "crawl": 8000}`` trains on wiki 3.5x and
    downsamples crawl to 0.8 epochs — the standard mixture step between
    curation and sharding.

    Output adds an ``epoch`` column (0-based copy index) so downstream
    sharding can spread copies across the corpus order instead of
    emitting them adjacent.

    Scale shape: a generate-style explode of ceil(e) ints per row — a
    stateless row-local fanout with no shuffle, no coordination; the
    fractional copy is the same deterministic (id, salt) hash draw as
    ``stratified_sample``, so the realized mixture is reproducible
    across retries and partitionings (an expected-fraction rand() draw
    would not be).
    """
    w = F.lit(default_bp)
    for src, bp in epochs_bp.items():
        w = F.when(F.col(source_col) == src, F.lit(bp)).otherwise(w)
    full = (w / 10_000).cast("long")       # floor: guaranteed copies
    frac = w - full * 10_000               # leftover in basis points
    draw = md5_long(
        F.concat(F.col(id_col).cast("string"), F.lit(MIXTURE_SALT))) % 10_000
    n_copies = full + (draw < frac).cast("long")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


#: Salt for the epoch-ordering shuffle — independent of the sample and
#: mixture draws.
SHUFFLE_SALT = ":shuffle"


def deterministic_shuffle(df: DataFrame, *, id_col: str = "doc_id",
                          buckets: int = 64) -> DataFrame:
    """Reproducible global pseudo-random ordering: ``position`` = rank of
    md5(id || salt) over the whole corpus — the training-epoch shuffle
    that must be identical across re-runs, partitionings, and engines
    (a ``rand()``-ordered shuffle is none of those).

    The naive formulation is ``row_number() OVER (ORDER BY h)`` — a
    global sort whose final rank pass is one task.  This is the
    range-partitioned two-phase rank instead (same scheme as
    packing.packed_shards, but range-bucketed by VALUE rather than id
    blocks): hash values are uniform in [0, 2^60), so ``h DIV (2^60/B)``
    range-buckets them in hash order; per bucket a local window ranks
    (parallelism = B); the B-row bucket-count table prefix-sums on the
    driver-trivial side and broadcasts back as offsets.  Bucket order
    equals hash order (DIV is monotonic), so offset + local rank is the
    exact global rank.  Ties impossible across buckets (equal h = same
    bucket); within a bucket the id breaks them.
    """
    span = (1 << 60) // buckets
    h = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(SHUFFLE_SALT)))
    keyed = df.select(id_col).withColumn("_sh_h", h).withColumn(
        "_sh_bkt", F.expr(f"_sh_h DIV {span}"))
    from pyspark.sql import Window
    w_local = Window.partitionBy("_sh_bkt").orderBy("_sh_h", id_col)
    local = keyed.withColumn(
        "_sh_lr", F.row_number().over(w_local).cast("long"))
    counts = keyed.groupBy("_sh_bkt").agg(F.count("*").alias("_sh_n"))
    w_prefix = Window.orderBy("_sh_bkt") \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_sh_off", F.coalesce(F.sum("_sh_n").over(w_prefix), F.lit(0))
    ).drop("_sh_n")
    return (
        local.join(F.broadcast(offsets), "_sh_bkt")
        .select(id_col,
                (F.col("_sh_off") + F.col("_sh_lr") - 1).alias("position"))
    )


#: Salt for the weighted-sample draw — independent of all other draws.
WSAMPLE_SALT = ":wsample"

#: Uniform-draw resolution (1e6 distinct values; collision just means a
#: shared u, still tie-broken deterministically by id downstream).
WSAMPLE_RES = 1_000_000


def weighted_sample(df: DataFrame, *, weight_col: str, k: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement, fully
    deterministic: each row draws a salted-hash uniform u in (0, 1] and
    scores key = ln(u) / w; the k LARGEST keys are the sample, which is
    distributed as weight-proportional sampling without replacement
    (u^(1/w) ordering, taken in log space).  Token-weighted corpus
    sampling is the canonical use: long documents proportionally more
    likely, rerun-stable, engine-independent.

    Scale shape: the top-k is orderBy + limit, which Spark executes as
    TakeOrdered (per-partition partial top-k, then a k-row merge on the
    driver) — never a global sort.  Rows with non-positive weight are
    excluded (ln(u)/w is undefined); the key is rounded before ranking
    so the float ordering is identical cross-engine, ties broken by id.
    """
    # u = un/RES as an integer ratio; ln via detmath's staged
    # deterministic ln so the ranking key is bit-identical cross-engine
    # (JVM vs libm ln differ by 1 ulp on ~7.5% of inputs — a flipped
    # round(6) here would swap sample MEMBERSHIP, not just a decimal).
    # ln(un/RES) < 0 comes out of the swap-and-negate branch.
    un = (md5_long(F.concat(F.col(id_col).cast("string"),
                            F.lit(WSAMPLE_SALT))) % WSAMPLE_RES) + 1
    keyed = with_det_ln(
        df.filter(F.col(weight_col) > 0).withColumn("_un", un),
        F.col("_un"), F.lit(WSAMPLE_RES), "_lnv")
    return (
        keyed.withColumn(
            "sample_key", det_round(F.col("_lnv") / F.col(weight_col), 6))
        .drop("_un", "_lnv")
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )
