"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k: the correctness
  baseline.  Dot products via ``F.zip_with`` + ``F.aggregate`` (JVM-side,
  no Python).  At scale this is one narrow map + TakeOrderedAndProject —
  no shuffle of the vectors themselves.
- :func:`ivf_topk` — the scale path: IVF-style bucketing.  Centroids
  start from a hash-ordered sample (md5 of the id — independent of id
  assignment order, so a skewed or sorted corpus cannot bias the picks)
  and are refined by :func:`kmeans_centroids` Lloyd iterations, all in
  DataFrame ops (assignment = broadcast crossJoin + argmax; new means =
  posexplode + per-dimension avg).  Every vector is assigned to its
  nearest centroid once (narrow, cacheable); queries probe only the
  ``n_probe`` nearest buckets → scan cost drops by n_centroids/n_probe.
  On a cluster the assignment table is bucketed by centroid id so a
  probe is partition-pruned.  Means are rounded to 6 decimals so an
  external oracle (DuckDB) reproduces assignments bit-for-bit despite
  float summation-order differences.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
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


def _py_norm(vec) -> float:
    """Driver-side mirror of :func:`_norm` on a literal vector: strict
    left-to-right IEEE-double accumulation, bit-identical to the JVM
    ``aggregate`` fold over the same literal array."""
    import math

    s = 0.0
    for x in vec:
        s += float(x) * float(x)
    return math.sqrt(s)


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


def _nearest_col(cent_rows, vec_col: str) -> F.Column:
    """Nearest-centroid assignment as ONE narrow column: the centroid
    table is ≤ n_centroids rows (driver-small by construction), so it is
    collected and inlined as literal vectors and the argmax runs over a
    struct array — no crossJoin, no groupBy shuffle of the id set (the
    round-4 form shuffled every id through a crossJoin + max agg).
    Ties → lowest centroid_id; each dot product sums left-to-right
    exactly like the former form, so assignments are bit-identical.
    (ONE nested-array literal, not per-element F.lit()s — thousands of
    scalar literal expressions measurably bloat plan compilation.)

    Round 7: the per-centroid CENTROID norm is precomputed driver-side
    (:func:`_py_norm` — the same left-to-right fold the in-plan
    ``_norm`` does over the same literal, so every cosine is
    bit-identical) and inlined as a literal, cutting the interpreted
    higher-order-function work per (row × centroid) from three dot
    products to two.  Higher-order functions do not participate in
    whole-stage codegen, so lambda-evaluation count is the direct cost
    driver of this expression — it dominated ann_topk/kmeans at sf1."""
    v = F.col(vec_col).cast("array<double>")
    cent_mat = F.lit([[float(x) for x in r["cvec"]] for r in cent_rows])
    # (-centroid_id, |centroid|) pairs, one nested literal
    meta = F.lit(
        [
            [float(-int(r["centroid_id"])), _py_norm(r["cvec"])]
            for r in cent_rows
        ]
    )
    scored = F.zip_with(
        cent_mat,
        meta,
        lambda cv, m: F.struct(
            (_dot(v, cv) / (_norm(v) * m.getItem(1))).alias("cos"),
            m.getItem(0).alias("negc"),
        ),
    )
    return (-F.array_max(scored)["negc"]).cast("long").alias("centroid_id")


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Deterministic k-means: init = the n_centroids rows first in
    md5(id) order (an order-free pseudo-random sample), then ``iters``
    Lloyd rounds (k-means‖-lite; one round already fixes the
    arbitrary-sample quality problem for probing).  Returns
    (centroid_id, cvec).  Clusters that lose every member drop out."""
    v = F.col(vec_col).cast("array<double>")
    hkey = F.md5(F.col(id_col).cast("string"))
    sample = (
        embeddings.select(F.col(id_col), v.alias("cvec"), hkey.alias("__h"))
        .orderBy("__h", id_col)
        .limit(n_centroids)
    )
    w = Window.orderBy("__h", id_col)
    cents = sample.select(
        (F.row_number().over(w) - 1).cast("long").alias("centroid_id"), "cvec"
    )
    for _ in range(iters):
        # assignment is a narrow column over literal centroids — the
        # vectors never join or shuffle; only the per-dimension partial
        # means move.  Round 7: the means are ``dim`` avg() aggregates
        # grouped by centroid_id (map-side partial aggregation → the
        # exchange carries n_centroids × dim partial sums, a few KB)
        # instead of the former posexplode into rows×dim records and a
        # (centroid_id, pos)-keyed shuffle of all of them.  avg() over
        # the identical value multiset + round(·, 6) keeps the oracle
        # contract (the rounding absorbs float summation-order
        # differences, exactly as it already did between Spark and the
        # DuckDB mirror).
        rows = cents.collect()
        if not rows:
            break
        dim = len(rows[0]["cvec"])
        assigned = embeddings.select(
            F.col(vec_col).alias("__e"), _nearest_col(rows, vec_col)
        )
        # avg inputs index the RAW vector column and cast the SCALAR
        # element (bit-identical: elementwise cast == cast-then-index) —
        # feeding getItem from an array<double>-cast alias let
        # CollapseProject inline the cast into all `dim` aggregate
        # inputs, materializing ~dim fresh arrays per row
        cents = (
            assigned.groupBy("centroid_id")
            .agg(
                *[
                    F.round(
                        F.avg(F.col("__e").getItem(i).cast("double")), decimals
                    ).alias(f"__m{i}")
                    for i in range(dim)
                ]
            )
            .select(
                "centroid_id",
                F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias("cvec"),
            )
        )
    # materialize: the centroid table is tiny and consumed by ≥2 plans
    return cents.localCheckpoint(eager=True)


def assign_ivf(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[DataFrame] = None,
    kmeans_iters: int = 1,
) -> DataFrame:
    """Assign each vector to its nearest centroid (k-means centroids by
    default; pass ``centroids`` to reuse a prebuilt (centroid_id, cvec)
    table).  Returns embeddings + ``centroid_id`` — ONE narrow
    withColumn against the literal centroid set: no join, no shuffle of
    the embedding column at any size."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(embeddings, n_centroids, kmeans_iters, id_col, vec_col)
    )
    return embeddings.withColumn(
        "centroid_id", _nearest_col(cents.collect(), vec_col)
    )


def _probe_choice(cent_rows, query_vec: Sequence[float], n_probe: int) -> list:
    """The n_probe centroid ids nearest the query, ranked driver-side
    over the collected (tiny) centroid table.  Driver-side cosine sums
    left-to-right like the column form, so the probe choice is
    IEEE-identical to the former DF computation."""

    def _pycos(a, b):
        import math

        dot = n2 = q2 = 0.0
        for x, y in zip(a, b):
            dot += x * y
            n2 += y * y
            q2 += x * x
        return (
            dot / (math.sqrt(n2) * math.sqrt(q2))
            if n2 and q2
            else float("-inf")
        )

    qf = [float(x) for x in query_vec]
    ranked = sorted(
        cent_rows,
        key=lambda r: (-_pycos(qf, [float(x) for x in r["cvec"]]),
                       int(r["centroid_id"])),
    )
    return [int(r["centroid_id"]) for r in ranked[:n_probe]]


def ivf_topk(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
    kmeans_iters: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the n_probe centroids nearest the query,
    then brute-force within those buckets only."""
    cents = kmeans_centroids(
        embeddings, n_centroids, kmeans_iters, id_col, vec_col
    )
    # the centroid table is driver-small by construction: collect ONCE
    # and do both the probe choice and the assignment against literals —
    # zero joins, zero extra jobs, and the full scan below stays narrow.
    rows = cents.collect()
    probe_ids = _probe_choice(rows, query_vec, n_probe)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    probed = embeddings.withColumn(
        "centroid_id", _nearest_col(rows, vec_col)
    ).filter(F.col("centroid_id").isin(probe_ids))
    return (
        probed.select(
            F.col(id_col), F.round(cosine_col(v, q), decimals).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def topk_brute_and_ivf(
    embeddings: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
    kmeans_iters: int = 1,
) -> DataFrame:
    """Brute-force AND IVF cosine top-k from ONE scan, method-tagged
    ('brute' rows then 'ivf' rows) — round 7.

    :func:`cosine_topk` + :func:`ivf_topk` run three full passes over
    the vectors between them (brute cosines, Lloyd assignment, probe
    assignment + cosines).  The brute cosine and the probe assignment
    are computable in the same projection, so this variant scans once
    for (id, cosine-to-query, centroid_id), pins that ~24-byte/row
    decision table (guide §8.4) with a localCheckpoint, and takes both
    top-k rankings from it.  The cosine and assignment expressions are
    the exact ones cosine_topk / ivf_topk evaluate — results identical
    row-for-row."""
    cents = kmeans_centroids(
        embeddings, n_centroids, kmeans_iters, id_col, vec_col
    )
    rows = cents.collect()
    probe_ids = _probe_choice(rows, query_vec, n_probe)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_col(v, q), decimals).alias("cosine"),
        _nearest_col(rows, vec_col),
    ).localCheckpoint(eager=True)
    brute = (
        scored.select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.lit("brute").alias("method"), F.col(id_col), F.col("cosine"))
    )
    ivf = (
        scored.filter(F.col("centroid_id").isin(probe_ids))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(F.lit("ivf").alias("method"), F.col(id_col), F.col("cosine"))
    )
    return brute.unionByName(ivf)


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (LSH-bucketed)
# ---------------------------------------------------------------------------

def hyperplane(dim: int, i: int) -> list:
    """Deterministic pseudo-random hyperplane i — integer arithmetic so a
    SQL oracle can reproduce every component exactly."""
    return [(((i * 37 + j * 13) % 21) - 10) / 10.0 for j in range(dim)]


def embedding_signatures(
    embeddings: DataFrame,
    nbits: int = 16,
    bits_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (sign-bit) LSH signatures, one ``mh_<b>`` string
    column of ``bits_per_band`` sign bits per band — the SimHash-for-
    vectors construction (Charikar), all JVM-side column expressions.
    Chunk columns are named ``mh_*`` so ``dedup.minhash_candidates``
    (rows_per_band=1) provides the capped single-join banding."""
    v = F.col(vec_col).cast("array<double>")
    bands = []
    for b in range(nbits // bits_per_band):
        bits = []
        for k in range(bits_per_band):
            h = F.array(
                *[F.lit(x) for x in hyperplane(dim, b * bits_per_band + k)]
            )
            bits.append(F.when(_dot(v, h) >= 0, F.lit("1")).otherwise(F.lit("0")))
        bands.append(F.concat(*bits).alias(f"mh_{b}"))
    return embeddings.select(F.col(id_col), *bands)


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    nbits: int = 16,
    bits_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 1000,
    log_fn=None,
) -> DataFrame:
    """Near-duplicate embedding pairs: sign-bit LSH banding → capped
    single self-join candidates → exact cosine verification (candidates
    only, never the cross product).  Returns (id_a, id_b, cosine).

    Scale: same guards as text MinHash dedup — pre-counted buckets,
    singleton pruning, over-cap buckets dropped with logged mass.
    Recall is the usual banding trade-off (raise nbits / lower
    bits_per_band for closer thresholds)."""
    from .dedup import minhash_candidates

    sigs = embedding_signatures(
        embeddings, nbits, bits_per_band, dim, id_col, vec_col
    )
    cands = minhash_candidates(
        sigs,
        id_col=id_col,
        bands=nbits // bits_per_band,
        rows_per_band=1,
        max_bucket_size=max_bucket_size,
        log_fn=log_fn,
    )
    v = F.col(vec_col).cast("array<double>")
    a = embeddings.select(F.col(id_col).alias("id_a"), v.alias("v_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"), v.alias("v_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("v_a"), F.col("v_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
