"""Entity linking: MinHash-LSH candidate generation + vectorized scoring.

The reference's nearest analog is jena-text's Lucene entity index
(jena-text/.../TextIndexLucene.java — literals tokenized into an index
keyed by subject URI; SURVEY.md §2.10); the LSH+scoring semantics here
are specified by BASELINE.json, not Jena.

Pipeline:
1. normalize code identifiers (lower-case, strip ``_``/``-`` — so
   ``HttpClient`` / ``http_client`` / ``HTTPCLIENT`` collide);
2. MinHash over character 3-grams of the normalized form, LSH banding →
   candidate (mention, entity) pairs — never the cross product;
3. scoring on candidates only: Levenshtein (Spark built-in, JVM-side)
   and shingle Jaccard; accept by threshold.

Scale (100 TB design point, same guards as ``pipelines.dedup``):
ONE mention×entity join on (band_idx, band_key) covers every band — no
per-band join loop.  Buckets are pre-counted per side; buckets present
on only one side are pruned (they can't produce a pair), and buckets
whose side exceeds ``max_bucket_size`` are DROPPED with their mass
logged — a hot code identifier (``get``, ``set``, ``data``) with 10^6
mentions against 10^3 same-bucket entities would emit 10^9 pairs and
kill the job; AQE spreads a merely-large bucket's shuffle, but only
the cap shrinks the quadratic *output*.
"""

from __future__ import annotations

import random
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipelines.dedup import minhash_signatures, _shingles, _band_structs


def normalized(col) -> F.Column:
    return F.lower(F.regexp_replace(col, r"[_\-]", ""))


def lsh_candidates(
    mentions: DataFrame,
    entities: DataFrame,
    mention_col: str = "mention",
    entity_col: str = "entity_name",
    k: int = 3,
    num_perm: int = 8,
    bands: int = 4,
    max_bucket_size: int = 1000,
    log_fn=None,
) -> DataFrame:
    """(mention, entity_iri) candidate pairs via shared LSH band buckets.

    One capped mention×entity join on (band_idx, band_key) — the
    two-sided form of ``pipelines.dedup.minhash_candidates`` (same band
    keys via ``_band_structs``).  Buckets with no partner side are
    pruned before the join; buckets where either side exceeds
    ``max_bucket_size`` are dropped (``log_fn`` gets one line with the
    dropped bucket count and pair mass so truncation is never silent).
    """
    rows = num_perm // bands
    m = mentions.select(
        F.col(mention_col).alias("mention"), normalized(F.col(mention_col)).alias("norm")
    ).distinct()
    e = entities.select(
        F.col("entity_iri"),
        F.col(entity_col).alias("entity_name"),
        normalized(F.col(entity_col)).alias("norm"),
    ).distinct()

    def signatures(df: DataFrame) -> DataFrame:
        sigs = minhash_signatures(
            df.withColumn("__txt", F.col("norm")),
            text_col="__txt",
            id_col="norm",
            k=k,
            num_perm=num_perm,
        ).dropDuplicates(["norm"])
        return df.join(sigs, "norm")

    sig_cols = [f"mh_{i}" for i in range(num_perm)]
    bs = _band_structs(sig_cols, bands, rows)
    m_long = (
        signatures(m)
        .select("mention", F.col("norm").alias("m_norm"), F.explode(bs).alias("bk"))
        .select("mention", "m_norm", "bk.band_idx", "bk.band_key")
        .persist()
    )
    e_long = (
        signatures(e)
        .select(
            "entity_iri",
            "entity_name",
            F.col("norm").alias("e_norm"),
            F.explode(bs).alias("bk"),
        )
        .select("entity_iri", "entity_name", "e_norm", "bk.band_idx", "bk.band_key")
        .persist()
    )
    keys = ["band_idx", "band_key"]
    # inner join of the per-side counts prunes one-sided buckets for free
    counts = (
        m_long.groupBy(*keys).agg(F.count("*").alias("m_cnt"))
        .join(e_long.groupBy(*keys).agg(F.count("*").alias("e_cnt")), keys)
    )
    if log_fn is not None:
        dropped = (
            counts.filter(
                (F.col("m_cnt") > max_bucket_size) | (F.col("e_cnt") > max_bucket_size)
            )
            .agg(
                F.count("*").alias("n_buckets"),
                F.coalesce(F.sum(F.col("m_cnt") * F.col("e_cnt")), F.lit(0)).alias(
                    "n_pairs"
                ),
            )
            .collect()[0]
        )
        if dropped["n_buckets"]:
            log_fn(
                f"lsh_candidates: dropped {dropped['n_buckets']} over-cap "
                f"buckets (side > {max_bucket_size}) covering "
                f"{dropped['n_pairs']} candidate pairs"
            )
    eligible = counts.filter(
        (F.col("m_cnt") <= max_bucket_size) & (F.col("e_cnt") <= max_bucket_size)
    ).select(*keys)
    mf = m_long.join(eligible, keys, "left_semi")
    ef = e_long.join(eligible, keys, "left_semi")
    out = (
        mf.join(ef, keys)
        .select("mention", "m_norm", "entity_iri", "entity_name", "e_norm")
        .distinct()
        # pin the (capped) candidates, then release the banded tables —
        # cache hygiene for long-lived sessions (see dedup.py twin)
        .localCheckpoint(eager=True)
    )
    m_long.unpersist(blocking=True)
    e_long.unpersist(blocking=True)
    return out


def score_candidates(
    candidates: DataFrame,
    max_edit_distance: int = 2,
    min_jaccard: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Vectorized scoring of candidate pairs: Levenshtein on the
    normalized forms (JVM built-in) + char-shingle Jaccard; the accept
    rule is (edit ≤ max) OR (jaccard ≥ min)."""
    a = _shingles("m_norm", k)
    b = _shingles("e_norm", k)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    scored = candidates.withColumn(
        "edit", F.levenshtein(F.col("m_norm"), F.col("e_norm"))
    ).withColumn(
        "jaccard",
        F.when(union > 0, F.round(inter / union, 6)).otherwise(F.lit(0.0)),
    )
    return scored.withColumn(
        "linked",
        (F.col("edit") <= max_edit_distance) | (F.col("jaccard") >= min_jaccard),
    )


def link_entities(
    mentions: DataFrame,
    entities: DataFrame,
    **kwargs,
) -> DataFrame:
    """Full pipeline → (mention, entity_iri, edit, jaccard) accepted links,
    best (lowest edit, then highest jaccard) entity per mention."""
    cands = lsh_candidates(mentions, entities)
    scored = score_candidates(cands, **kwargs).filter(F.col("linked"))
    best = scored.groupBy("mention").agg(
        F.min(F.struct(F.col("edit"), (-F.col("jaccard")).alias("nj"), F.col("entity_iri"))).alias("m")
    )
    return best.select(
        "mention",
        F.col("m.entity_iri").alias("entity_iri"),
        F.col("m.edit").alias("edit"),
        (-F.col("m.nj")).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Deterministic linking fixtures (FIXTURES.md §6): ~1k mentions over ~200
# entities, true pairs (case/underscore variants, edit ≤ 2) + hard negatives.
# ---------------------------------------------------------------------------

_WORDS = [
    "http", "client", "server", "parser", "token", "graph", "node", "index",
    "query", "stream", "batch", "cache", "store", "table", "shard", "merge",
    "hash", "link", "scan", "sort",
]


def linking_fixtures(spark: SparkSession, n_entities: int = 200, seed: int = 42):
    rng = random.Random(seed)
    entities: List[Tuple[str, str]] = []
    for i in range(n_entities):
        w1, w2 = rng.choice(_WORDS), rng.choice(_WORDS)
        name = w1.capitalize() + w2.capitalize() + (str(i % 7) if i % 3 == 0 else "")
        entities.append((f"http://example.org/entity/{i}", name))
    mentions: List[Tuple[str, str, bool]] = []
    for iri, name in entities:
        mentions.append((name, iri, True))  # exact
        mentions.append((name.lower(), iri, True))  # case variant
        # snake_case variant
        snake = "".join(
            ("_" + c.lower()) if c.isupper() else c for c in name
        ).lstrip("_")
        mentions.append((snake, iri, True))
        if rng.random() < 0.5:  # typo variant, edit distance 1
            pos = rng.randrange(len(name))
            mentions.append((name[:pos] + "x" + name[pos + 1 :], iri, True))
        if rng.random() < 0.4:  # hard negative: different entity, similar shape
            w = rng.choice(_WORDS)
            mentions.append((w.capitalize() + "Zzz" + str(rng.randrange(100)), iri, False))
    edf = spark.createDataFrame(entities, ["entity_iri", "entity_name"])
    mdf = spark.createDataFrame(mentions, ["mention", "gold_iri", "should_link"])
    return mdf, edf
