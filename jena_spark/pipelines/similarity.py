"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k: the correctness
  baseline.  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side,
  no Python).  At scale this is one narrow map + TakeOrderedAndProject —
  no shuffle of the vectors themselves.
- :func:`ivf_topk` — the scale path: IVF-style bucketing.  Centroids are
  a deterministic sample (vec_id < n_centroids); every vector is assigned
  to its nearest centroid once (narrow, cacheable), queries probe only the
  ``n_probe`` nearest buckets → scan cost drops by
  n_centroids/n_probe.  On a cluster the assignment table is bucketed by
  centroid id so a probe is partition-pruned.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Brute-force top-k by cosine to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        embeddings.select(
            F.col(id_col),
            F.round(cosine_col(v, q), decimals).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def assign_ivf(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest deterministic centroid
    (centroid set = rows with id < n_centroids — seeded, reproducible).
    Returns embeddings + ``centroid_id``.  One broadcast join; no shuffle
    of the embedding column."""
    cents = (
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
    )
    joined = embeddings.crossJoin(F.broadcast(cents))
    v = F.col(vec_col).cast("array<double>")
    scored = joined.withColumn("__cos", cosine_col(v, F.col("cvec")))
    w = F.struct(F.col("__cos"), (-F.col("centroid_id")).alias("neg"))
    best = (
        scored.groupBy(id_col)
        .agg(F.max(F.struct(F.col("__cos"), (-F.col("centroid_id")).alias("negc"))).alias("m"))
        .select(F.col(id_col), (-F.col("m.negc")).cast("long").alias("centroid_id"))
    )
    return embeddings.join(best, id_col)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Approximate top-k: probe the n_probe centroids nearest the query,
    then brute-force within those buckets only."""
    assigned = assign_ivf(embeddings, n_centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = (
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            cosine_col(F.col(vec_col).cast("array<double>"), q).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc("centroid_id"))
        .limit(n_probe)
        .select("centroid_id")
    )
    probed = assigned.join(F.broadcast(cents), "centroid_id")
    v = F.col(vec_col).cast("array<double>")
    return (
        probed.select(
            F.col(id_col), F.round(cosine_col(v, q), decimals).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
