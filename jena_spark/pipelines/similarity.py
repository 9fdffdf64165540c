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
from pyspark.sql.types import LongType


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


def _np_scores(vecs, cent_mat, cent_norms, query, query_norm):
    """Vectorized mirror of the JVM scoring expressions over one numpy
    batch of equal-length vectors (n × dim float64).

    Bit-identical by construction: every dot product is
    ``np.cumsum(products, axis=-1)[..., -1]`` — the same strict
    left-to-right IEEE-double accumulation as the in-plan ``aggregate``
    fold (elementwise products are identical, additions happen in the
    same order, so every partial sum rounds identically); centroid and
    query norms come from :func:`_py_norm` (same fold); each cosine is
    dot / (norm_v * norm_other) with the multiply-then-divide order of
    the column form.  Returns (cos_to_query, centroid_slot) — slot =
    argmax over centroids of cos with ties to the FIRST (callers sort
    centroid rows by centroid_id, mirroring the (cos, -id) struct-max
    tie-break), NaN cosines ranking greatest exactly like Spark's
    double ordering."""
    import numpy as np

    norm_v = np.sqrt(np.cumsum(vecs * vecs, axis=1)[:, -1])
    dot_q = np.cumsum(vecs * query, axis=1)[:, -1]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_q = dot_q / (norm_v * query_norm)
        dots_c = np.cumsum(
            vecs[:, None, :] * cent_mat[None, :, :], axis=2
        )[:, :, -1]
        cos_c = dots_c / (norm_v[:, None] * cent_norms[None, :])
    ranked = np.where(np.isnan(cos_c), np.inf, cos_c)
    slot = np.argmax(ranked, axis=1)
    return cos_q, slot


def _scored_arrow(
    embeddings: DataFrame,
    cent_rows,
    query_vec: Sequence[float],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, cosine-to-query, centroid_id) as ONE Arrow-batched stage —
    round 7.  The column form evaluated ~16 centroids × 4 interpreted
    higher-order folds per row (HOFs do not participate in whole-stage
    codegen); this computes the same values vectorized (see
    :func:`_np_scores` for the bit-identity argument).  The final
    ``round(cosine, decimals)`` stays in the JVM so the rounding is the
    very same expression as before.

    Row edge cases mirror the column form: a null vector, or one whose
    length differs from the query's (zip_with would pad with nulls),
    yields a null cosine and the lowest centroid id (the struct-max
    over all-null cos fields falls through to the -id tie-break)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    rows = sorted(cent_rows, key=lambda r: int(r["centroid_id"]))
    cent_mat = np.array([[float(x) for x in r["cvec"]] for r in rows],
                        dtype=np.float64)
    cent_norms = np.array([_py_norm(r["cvec"]) for r in rows],
                          dtype=np.float64)
    cent_ids = np.array([int(r["centroid_id"]) for r in rows],
                        dtype=np.int64)
    query = np.array([float(x) for x in query_vec], dtype=np.float64)
    qnorm = _py_norm(query_vec)
    dim = len(query)
    null_cid = int(cent_ids.min()) if len(cent_ids) else None

    id_field = embeddings.schema[id_col]
    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType, True),
            StructField("cosine", DoubleType(), True),
            StructField("centroid_id", LongType(), True),
        ]
    )

    def score(batches):
        for pdf in batches:
            vec_list = pdf[vec_col].tolist()
            n = len(vec_list)
            cos = np.full(n, np.nan)
            cos_null = np.zeros(n, dtype=bool)
            cid = np.full(n, null_cid if null_cid is not None else 0,
                          dtype=np.int64)
            ok_idx = [
                i for i, v in enumerate(vec_list)
                if v is not None and len(v) == dim
            ]
            if ok_idx:
                E = np.array([vec_list[i] for i in ok_idx], dtype=np.float64)
                cq, slot = _np_scores(E, cent_mat, cent_norms, query, qnorm)
                ok = np.array(ok_idx)
                cos[ok] = cq
                cid[ok] = cent_ids[slot]
            bad = np.ones(n, dtype=bool)
            bad[ok_idx] = False
            cos_null |= bad
            # masked Float64: a plain float column would coerce the
            # null-row marker to NaN, which Spark orders GREATER than
            # every number — the column form yields SQL NULL there.
            # (explicit mask, not pd.array(), so a legitimately-NaN
            # cosine computed from NaN inputs stays NaN, not NA)
            cos_ser = pd.arrays.FloatingArray(cos, cos_null)
            yield pd.DataFrame(
                {
                    id_field.name: pdf[id_col],
                    "cosine": cos_ser,
                    "centroid_id": cid,
                }
            )

    return embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema
    )


def _assign_partial_sums(
    embeddings: DataFrame,
    cent_rows,
    vec_col: str,
) -> DataFrame:
    """Per-batch (centroid_id, per-dimension count, per-dimension sum)
    partial aggregates for one Lloyd round — round 7.  Replaces the
    interpreted-HOF assignment column + ``dim`` avg() aggregates whose
    inputs indexed the vector per dimension; the exchange now carries a
    few hundred 129-column rows instead of per-row assignment output.
    Assignment is :func:`_np_scores`' argmax (bit-identical to the
    struct-max column form); the means the caller derives as
    round(sum/count, 6) equal the former round(avg, 6) modulo float
    summation order, which the 1e-6 rounding absorbs — the exact
    tolerance the DuckDB oracle mirror already relies on.

    Column-form edge parity: a vector whose length differs from the
    centroid dimension is assigned the lowest centroid id (all-null
    cosines fall through to the -id tie-break) and contributes the
    elements it does have (getItem past the end is null, which avg
    skips); a null vector contributes nothing but still lands in the
    lowest-id group."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    rows = sorted(cent_rows, key=lambda r: int(r["centroid_id"]))
    cent_mat = np.array([[float(x) for x in r["cvec"]] for r in rows],
                        dtype=np.float64)
    cent_norms = np.array([_py_norm(r["cvec"]) for r in rows],
                          dtype=np.float64)
    cent_ids = np.array([int(r["centroid_id"]) for r in rows],
                        dtype=np.int64)
    dim = cent_mat.shape[1]
    null_cid = int(cent_ids.min())

    schema = StructType(
        [StructField("centroid_id", LongType(), True)]
        + [StructField(f"__n{i}", LongType(), True) for i in range(dim)]
        + [StructField(f"__s{i}", DoubleType(), True) for i in range(dim)]
    )

    def partial(batches):
        for pdf in batches:
            vec_list = pdf[vec_col].tolist()
            ok_idx = [
                i for i, v in enumerate(vec_list)
                if v is not None and len(v) == dim
            ]
            sums: dict = {}
            cnts: dict = {}
            if ok_idx:
                E = np.array([vec_list[i] for i in ok_idx], dtype=np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    norm_v = np.sqrt(np.cumsum(E * E, axis=1)[:, -1])
                    dots_c = np.cumsum(
                        E[:, None, :] * cent_mat[None, :, :], axis=2
                    )[:, :, -1]
                    cos_c = dots_c / (norm_v[:, None] * cent_norms[None, :])
                slot = np.argmax(
                    np.where(np.isnan(cos_c), np.inf, cos_c), axis=1
                )
                for s in np.unique(slot):
                    grp = E[slot == s]
                    cid = int(cent_ids[s])
                    sums[cid] = np.add.reduce(grp, axis=0)
                    cnts[cid] = np.full(dim, len(grp), dtype=np.int64)
            ok_set = set(ok_idx)
            for i, v in enumerate(vec_list):
                if i in ok_set:
                    continue
                if null_cid not in sums:
                    sums[null_cid] = np.zeros(dim)
                    cnts[null_cid] = np.zeros(dim, dtype=np.int64)
                if v is not None:
                    m = min(len(v), dim)
                    sums[null_cid][:m] += np.asarray(v[:m], dtype=np.float64)
                    cnts[null_cid][:m] += 1
            cids = sorted(sums)
            data = {"centroid_id": pd.Series(cids, dtype="int64")}
            for i in range(dim):
                data[f"__n{i}"] = [int(cnts[c][i]) for c in cids]
            for i in range(dim):
                data[f"__s{i}"] = [float(sums[c][i]) for c in cids]
            yield pd.DataFrame(data)

    return embeddings.select(F.col(vec_col)).mapInPandas(partial, schema)


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
        # Round 7: assignment + per-dimension partial sums run as ONE
        # Arrow-batched stage (:func:`_assign_partial_sums`) — the
        # former literal-centroid struct-max column was ~16 centroids ×
        # 2 interpreted higher-order folds per row (HOFs do not
        # whole-stage-codegen) and the dim avg() aggregates indexed the
        # vector 64×/row.  The exchange now carries only a few hundred
        # partial-aggregate rows; means = round(sum/count, 6) equal the
        # former round(avg, 6) modulo float summation order, absorbed
        # by the 1e-6 rounding exactly as the DuckDB oracle mirror
        # already relies on.
        rows = cents.collect()
        if not rows:
            break
        dim = len(rows[0]["cvec"])
        partial = _assign_partial_sums(embeddings, rows, vec_col)
        agg = partial.groupBy("centroid_id").agg(
            *[F.sum(f"__n{i}").alias(f"__n{i}") for i in range(dim)],
            *[F.sum(f"__s{i}").alias(f"__s{i}") for i in range(dim)],
        )
        cents = agg.select(
            "centroid_id",
            F.array(
                *[
                    F.when(
                        F.col(f"__n{i}") > 0,
                        F.round(
                            F.col(f"__s{i}") / F.col(f"__n{i}"), decimals
                        ),
                    )
                    for i in range(dim)
                ]
            ).alias("cvec"),
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
    # round 7: the (cosine, centroid) decision columns come from the
    # Arrow-batched _scored_arrow stage instead of the interpreted-HOF
    # column expressions — same values (cumsum fold bit-identity; the
    # round() below is the identical JVM expression as before)
    scored = (
        _scored_arrow(embeddings, rows, query_vec, id_col, vec_col)
        .select(
            F.col(id_col),
            F.round(F.col("cosine"), decimals).alias("cosine"),
            "centroid_id",
        )
        .localCheckpoint(eager=True)
    )
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
