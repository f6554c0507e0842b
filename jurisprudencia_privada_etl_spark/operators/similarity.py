"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one broadcast nested-loop of the query
set against the corpus, dot products as JVM ``zip_with``/``aggregate``
expressions (no Python in the scoring loop).

Scale path: LSH-bucketed ANN — random-hyperplane sign bits put each vector
in a bucket; only same-bucket (and optionally neighboring-probe) candidates
are scored.  Hyperplanes are generated deterministically from a seed at the
driver and enter the plan as literals, so the operator is replayable.

At 100 TB the corpus side stays partitioned; only the (small) query set is
broadcast — the cross product never shuffles the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    queries: (query_id, embedding).  The query side is broadcast; scoring is
    a JVM expression; top-k is a per-query row_number window.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no numpy RNG state —
    a hash-based normal approximation keeps replayability trivial)."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            # 12-term Irwin–Hall sum ≈ normal; inputs from a splitmix-style hash
            acc = 0.0
            x = (seed * 1_000_003 + p * 10_007 + d) & 0xFFFFFFFF
            for _ in range(12):
                x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
                acc += x / 0xFFFFFFFF
            vals.append(acc - 6.0)
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes — an int in [0, 2^n)."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(vec_col, p) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's LSH bucket are
    scored.  Equi-join on the bucket id replaces the cross join — the corpus
    is scanned once and shuffled on a uniform bucket key."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_bucket", lsh_bucket(F.col("_qvec"), planes))
    scored = c.join(F.broadcast(q), "_bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Deterministic k-means centroids via Spark MLlib (seeded)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    return [
        (c.toArray().tolist() if hasattr(c, "toArray") else list(map(float, c)))
        for c in model.clusterCenters()
    ]


def _nearest_centroid_expr(vec_col: Column, centroids: list[list[float]], n: int = 1) -> Column:
    """Index array of the n nearest centroids (squared L2), as a JVM expr."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(vec_col, F.array(*[F.lit(float(v)) for v in c]),
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                ).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(dists), lambda s: s["i"]), 1, n)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: k-means partitions the corpus into n_lists inverted
    lists; each query scores only the lists of its n_probe nearest
    centroids.  Scale path: the corpus is scanned once to assign lists (a
    pure map), the probe join is an equi-join on the small list id, and the
    per-query candidate set shrinks by ~n_probe/n_lists."""
    centroids = kmeans_centroids(corpus, n_lists, vec_col, seed)
    c = corpus.withColumn(
        "_list", _nearest_centroid_expr(F.col(vec_col), centroids, 1)[0]
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_probe", F.explode(_nearest_centroid_expr(F.col("_qvec"), centroids, n_probe)))
    scored = c.join(F.broadcast(q), c["_list"] == q["_probe"]).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
