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


def _centroid_literal_array(centroids: DataFrame, vec_col: str) -> Column:
    """Collect the (small, by construction) centroid table and embed
    it as a literal array<struct<cid, v, nrm>> with norms precomputed
    driver-side. Centroids small enough to broadcast are small enough
    to serialize as plan literals; beyond ~10^4 centroids switch to a
    broadcast-join + max_by aggregation instead."""
    import math

    rows = centroids.select("centroid_id", F.col(vec_col)).collect()
    if not rows:
        raise ValueError("empty centroid table")
    cents = []
    for r in sorted(rows, key=lambda r: r["centroid_id"]):
        v = [float(x) for x in r[vec_col]]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append(
            F.struct(
                F.lit(int(r["centroid_id"])).alias("cid"),
                F.lit(v).cast("array<double>").alias("v"),
                F.lit(nrm).alias("nrm"),
            )
        )
    return F.array(*cents)


def _centroid_rank_structs(vec: Column, cent_arr: Column) -> Column:
    """array<struct<s, neg_cid, cid>> — one entry per centroid, where
    s = dot(vec, c.v)/c.nrm ranks identically to cosine (the query
    vector's own norm is a positive per-row constant, so dividing by
    it preserves both order and ties). Struct comparison is
    lexicographic, so array_max picks (highest sim, then lowest
    centroid id) — the same tie-break as the window it replaces."""
    vd = vec.cast("array<double>")
    return F.transform(
        cent_arr,
        lambda c: F.struct(
            (_dot(vd, c["v"]) / c["nrm"]).alias("s"),
            (-c["cid"]).alias("neg_cid"),
            c["cid"].alias("cid"),
        ),
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment with NO shuffle and NO join: a JVM
    array fold over the centroid literal picks each vector's argmax
    centroid, so the plan is one narrow Project over the corpus scan.
    (The previous crossJoin + window version expanded to N×C rows and
    shuffled them all to rank per vec_id.) → df + cluster_id."""
    cent_arr = _centroid_literal_array(centroids, vec_col)
    best = F.array_max(_centroid_rank_structs(F.col(vec_col), cent_arr))
    return df.withColumn("cluster_id", best["cid"])


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
    each query. → (query_id, neighbor_id, score, rank).

    Both the corpus assignment and the per-query probe selection are
    narrow folds over the centroid literal (no shuffle); the only
    exchange left is the candidate join on cluster_id — which IS the
    IVF bucket lookup, and at rest would be partition pruning against
    a corpus bucketed by cluster_id on disk."""
    cents = deterministic_centroids(corpus, id_col, vec_col, stride)
    cent_arr = _centroid_literal_array(cents, vec_col)
    corpus_assigned = corpus.withColumn(
        "cluster_id", F.array_max(_centroid_rank_structs(F.col(vec_col), cent_arr))["cid"]
    )

    # nprobe nearest clusters per query: sort the rank structs
    # descending (reverse of the ascending lexicographic sort → sim
    # desc, centroid_id asc on ties), take nprobe, explode
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    top_probes = F.slice(
        F.reverse(F.array_sort(_centroid_rank_structs(F.col("qv"), cent_arr))),
        1,
        nprobe,
    )
    probes = q.select(
        "query_id", "qv", F.explode(top_probes.getField("cid")).alias("cluster_id")
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
