"""Similarity search over embedding columns (array<float>).

  cosine_topk      — exact brute-force top-k: the baseline and the
                     oracle. Dot products via zip_with/aggregate
                     folds (JVM-side); ranking via window row_number.
  ivf_topk         — IVF-style approximate path: deterministic
                     centroid subset, assign every vector to its
                     nearest centroid (shuffle on cluster id), search
                     only the query's nprobe nearest clusters. The
                     scale path: per-query work drops from O(N) to
                     O(N * nprobe / n_clusters).

At 100 TB the corpus side would be bucketed by cluster id on disk so
a query batch touches only matching buckets — the cluster-id
partitioning here is exactly that layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # cast to double BEFORE multiplying: float32 products poison the
    # sum with ~1e-7 noise, enough to flip near-tie rankings and
    # diverge from a double-precision oracle
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for each query over the corpus
    (self-matches excluded). → (query_id, neighbor_id, score, rank).
    Deterministic tie-break: score desc, neighbor_id asc."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (small) centroid
    table, window-min per vector. → df + cluster_id."""
    c = centroids.select(
        F.col("centroid_id"), F.col(vec_col).alias("cent_v")
    )
    scored = df.crossJoin(F.broadcast(c)).withColumn(
        "sim", cosine(F.col(vec_col), F.col("cent_v"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "sim", "cent_v")
        .withColumnRenamed("centroid_id", "cluster_id")
    )


def deterministic_centroids(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", stride: int = 50
) -> DataFrame:
    """Deterministic IVF 'training': every stride-th vector is a
    centroid. (A k-means refinement slots in here unchanged — the
    interface is just a (centroid_id, vec) table.)"""
    return corpus.where((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    stride: int = 50,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k: search only the nprobe clusters nearest to
    each query. → (query_id, neighbor_id, score, rank)."""
    cents = deterministic_centroids(corpus, id_col, vec_col, stride)
    corpus_assigned = assign_clusters(corpus, cents, id_col, vec_col)

    # nprobe nearest clusters per query
    c = cents.select("centroid_id", F.col(vec_col).alias("cent_v"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(c)).withColumn(
        "sim", cosine(F.col("qv"), F.col("cent_v"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cluster_id"))
    )

    cand = probes.join(
        corpus_assigned.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cluster_id"
        ),
        "cluster_id",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
