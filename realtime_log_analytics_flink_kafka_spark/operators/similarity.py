"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set broadcasts against the corpus (queries are small by
  construction); per-pair math is higher-order array functions, JVM-side.
- ``ivf_topk``: IVF-style scale path — corpus bucketed by nearest coarse
  centroid, probes only the query's cluster.  At 100 TB the corpus is
  partitioned by cluster id, so a query touches 1/C of the data.
- ``embedding_near_dup_pairs``: near-duplicate detection by cosine.

Float determinism for the oracle: products and sums are left-folds over
the array (F.aggregate in Spark, list_reduce in DuckDB) in identical
order, so results match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product over double-cast elements."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def with_norm(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute norms once — the corpus-side norm is reused across every
    query instead of recomputed per pair."""
    return vecs.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine for each query vector.

    queries broadcast (small side); rank ties break on corpus id for
    determinism; self-matches excluded.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    sim = F.round(
        _dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm")),
        6,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def assign_clusters(corpus: DataFrame, centroids: DataFrame, *,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid assignment (the IVF build step).  Centroids
    broadcast; argmin via ranked window over the small centroid set."""
    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec"))
    scored = (
        corpus.crossJoin(F.broadcast(cent))
        .withColumn("dist2", F.aggregate(
            F.zip_with(F.col(vec_col), F.col("cent_vec"),
                       lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0), lambda acc, v: acc + v))
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("dist2"), F.asc("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "cent_vec", "dist2")
    )


def ivf_topk(corpus: DataFrame, *, k: int = 3, centroid_every: int = 97,
             n_queries: int = 5, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """IVF-lite ANN: deterministic coarse centroids (every ``centroid_every``-th
    vector), single-probe search within the query's cluster.

    Approximate by construction — recall vs cosine_topk is measured in
    tests, not assumed.
    """
    centroids = corpus.filter(F.col(id_col) % centroid_every == 0)
    assigned = assign_clusters(corpus, centroids, vec_col=vec_col, id_col=id_col)
    queries = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("centroid_id").alias("q_cluster"),
    )
    cand = (
        assigned.select(
            F.col(id_col).alias("corpus_id"),
            F.col(vec_col).alias("c_vec"),
            F.col("centroid_id").alias("c_cluster"),
        )
        .join(F.broadcast(queries), F.col("c_cluster") == F.col("q_cluster"))
        .filter(F.col("corpus_id") != F.col("query_id"))
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        cand.select("query_id", "corpus_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(vecs: DataFrame, *, threshold: float = 0.9,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """All pairs above a cosine threshold (embedding-based near-dedup).
    Brute force here; the bucketed variant composes assign_clusters first
    (pairs within a cluster) exactly like ivf_topk."""
    v = with_norm(vecs, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), F.col("_norm").alias("nrm"))
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                 F.col("nrm").alias("norm_a"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                 F.col("nrm").alias("norm_b"))
    sim = F.round(_dot(F.col("vec_a"), F.col("vec_b"))
                  / (F.col("norm_a") * F.col("norm_b")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
