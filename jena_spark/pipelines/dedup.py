"""Deduplication operators: exact, MinHash(+LSH), SimHash, n-gram Jaccard.

Every operator here is pure ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs in the hot path.  The hash
primitives are md5-string-based so a DuckDB oracle can reproduce values
bit-for-bit (md5 is the one hash both engines share).

Scale notes (100 TB design point):
- exact dedup: one hash-shuffle on md5(text) — never on raw text
  (shuffle payload is 32 bytes/row + keys);
- MinHash: shingling + per-seed minima are narrow (no shuffle until the
  band groupBy); candidate pairs come from a band-bucket self-join whose
  key cardinality grows with corpus size → hash-partition naturally;
  skewed buckets (boilerplate docs) are handled by AQE skew-join;
- pairwise verification (Jaccard) joins only candidate pairs, never the
  full cross product.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Representative (min id) per distinct content hash."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

def _shingles(text_col: str, k: int) -> F.Column:
    """Character k-shingles as an array column, all JVM-side:
    positions 1..len-k+1 → substr.  Deduplicated (set semantics)."""
    c = F.col(text_col)
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(0))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k)))
    )


_MERSENNE = 2147483647  # 2^31 - 1


def perm_consts(num_perm: int):
    """Deterministic affine coefficients for the MinHash permutations:
    a_i ∈ [1, P-1], b_i ∈ [0, P-1], derived from md5("a<i>")/md5("b<i>")
    so the DuckDB oracles can inline the SAME literals (the formula is
    the contract, not the numbers)."""
    import hashlib

    out = []
    for i in range(num_perm):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:8], 16) \
            % (_MERSENNE - 1) + 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16) % _MERSENNE
        out.append((a, b))
    return out


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_perm: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature, textbook affine-permutation form:
    each shingle hashes ONCE (md5 → 60-bit int → mod P, P = 2^31-1),
    then permutation i is min over shingles of (a_i·h + b_i) mod P —
    one strong hash per shingle instead of ``num_perm`` of them (the
    hashing dominated signature cost; this is ~5× cheaper at 8 perms).
    Columns: id, mh_0..mh_{num_perm-1} (BIGINT)."""
    df = docs.withColumn("__sh", _shingles(text_col, k)).filter(F.size("__sh") > 0)
    hashed = df.withColumn(
        "__h",
        F.transform(
            F.col("__sh"),
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10)
            .cast("long") % _MERSENNE,
        ),
    )

    def perm(a: int, b: int):
        # NB: a 2-arg lambda would be treated by F.transform as
        # (element, index) — bind the constants via closure, one arg.
        return lambda h: (F.lit(a) * h + F.lit(b)) % _MERSENNE

    sigs = [
        F.array_min(F.transform(F.col("__h"), perm(a, b))).alias(f"mh_{i}")
        for i, (a, b) in enumerate(perm_consts(num_perm))
    ]
    return hashed.select(F.col(id_col), *sigs)


def _band_structs(sig_cols, bands: int, rows_per_band: int) -> F.Column:
    """array<struct<band_idx, band_key>> — band key = md5 of the band's
    concatenated minima.  Shared by dedup and entity linking so both go
    through the same single-join banding machinery."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(c)
                            for c in sig_cols[
                                b * rows_per_band : (b + 1) * rows_per_band
                            ]
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def minhash_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket_size: int = 1000,
    log_fn=None,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs
    (id_a < id_b).  Band key = md5 of the band's concatenated minima.

    Scale guards (the 100 TB design point):
    - ONE self-join on (band_idx, band_key) covers every band — no
      per-band join loop, no N-legged union;
    - buckets are pre-counted; singleton buckets (count 1) are pruned
      before the join, and buckets larger than ``max_bucket_size`` are
      DROPPED — one license-header bucket with 10^6 members would emit
      ~10^12 pairs and kill the job; standard MinHashLSH practice is to
      cap and report.  AQE skew-join spreads a merely-large bucket's
      shuffle, but only the cap shrinks the quadratic *output*.
    - ``log_fn`` (e.g. ``print``/logger) receives one line with the
      number of dropped buckets and their member mass, so truncation is
      never silent.
    """
    sig_cols = [c for c in signatures.columns if c.startswith("mh_")]
    assert len(sig_cols) >= bands * rows_per_band
    band_structs = _band_structs(sig_cols, bands, rows_per_band)
    long = (
        signatures.select(F.col(id_col), F.explode(band_structs).alias("bk"))
        .select(F.col(id_col), F.col("bk.band_idx"), F.col("bk.band_key"))
        .persist()
    )
    counts = long.groupBy("band_idx", "band_key").count()
    if log_fn is not None:
        dropped = (
            counts.filter(F.col("count") > max_bucket_size)
            .agg(
                F.count("*").alias("n_buckets"),
                F.coalesce(F.sum("count"), F.lit(0)).alias("n_members"),
            )
            .collect()[0]
        )
        if dropped["n_buckets"]:
            log_fn(
                f"minhash_candidates: dropped {dropped['n_buckets']} "
                f"over-cap buckets (> {max_bucket_size}) covering "
                f"{dropped['n_members']} doc slots"
            )
    eligible = counts.filter(
        (F.col("count") >= 2) & (F.col("count") <= max_bucket_size)
    ).select("band_idx", "band_key")
    filtered = long.join(eligible, ["band_idx", "band_key"], "left_semi")
    left = filtered.withColumnRenamed(id_col, "id_a")
    right = filtered.withColumnRenamed(id_col, "id_b")
    pairs = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        # pin the (capped, small) candidate set so the banded long table
        # can be unpersisted NOW — without this the cache entry outlives
        # the call and leaks across a long-lived session
        .localCheckpoint(eager=True)
    )
    long.unpersist(blocking=True)
    return pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------

def jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only.

    Joins each candidate pair to the two docs' (distinct) shingle arrays
    and computes |A∩B| with ``array_intersect`` — two joins total and no
    exploded shingle shuffle (an explode-join was ~10× slower at 5k docs:
    the candidate set grows quadratically inside near-dup clusters).

    Round 6: each shingle is hashed to a 64-bit long (``xxhash64``, pure
    JVM) INSIDE the array before the join — set Jaccard is invariant
    under an injective hash, so the value (and the DuckDB oracle, which
    keeps computing on raw shingle strings) is unchanged while the join
    ships 8 bytes per shingle instead of a k-char string (~5× less
    payload on k=5; this was the single most expensive bench query).
    A 64-bit collision inside one pair's union would need ~2^32 shingles
    per doc — not a realistic document.
    Returns (id_a, id_b, jaccard)."""
    sets = docs.select(
        F.col(id_col).alias("id"),
        # NB: one-arg lambda — F.xxhash64 itself is variadic and
        # F.transform would feed it (element, index)
        F.transform(_shingles(text_col, k), lambda x: F.xxhash64(x)).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = joined.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbits: int = 16,
) -> DataFrame:
    """nbits-bit SimHash over whitespace tokens.  Bit i of a token's
    fingerprint = parity of the i-th hex digit of md5(token) — a formula
    both Spark and an ANSI-SQL oracle can evaluate identically.
    simhash bit i = 1 iff sum over tokens of (+1/-1) > 0."""
    assert nbits <= 32
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        # project md5(tok) ONCE before the groupBy — don't rely on Catalyst
        # subexpression elimination across the 16 aggregate expressions
        .select("id", F.md5(F.col("tok")).alias("__h"))
    )
    h = F.col("__h")
    bit_sums = [
        F.sum(
            F.when(
                F.instr(F.lit("13579bdf"), F.substring(h, i + 1, 1)) > 0, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    fp = None
    for i in range(nbits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = bit * F.lit(2 ** i)
        fp = term if fp is None else fp + term
    return agg.select(F.col("id").alias(id_col), fp.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# connected-components clustering (pairs → dedup groups)
# ---------------------------------------------------------------------------

def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Near-duplicate CLUSTERS from candidate/verified pairs: connected
    components by iterative min-label propagation → (doc_id, cluster_id)
    where cluster_id = the smallest doc id in the component (the
    canonical representative; docs with no pair are their own cluster).

    Scale shape (the 100 TB design point): each round is ONE
    edges⋈labels join + a min-aggregate, all hash-partitioned on the
    node id; the frontier label table is checkpointed per round so the
    plan stays flat, and the loop stops the first round nothing changes.
    Round count is bounded by the component diameter — near-dup clusters
    are shallow (pairs come from shared LSH buckets), so a handful of
    rounds covers real corpora; ``max_iter`` guards the pathological
    chain and raises rather than looping forever.
    """
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = (
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        docs.select(F.col(id_col).alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            nb = (
                edges.join(
                    labels.select(
                        F.col("node").alias("b"), F.col("lbl")
                    ),
                    "b",
                )
                .groupBy("a")
                .agg(F.min("lbl").alias("nlbl"))
                .withColumnRenamed("a", "node")
            )
            new = (
                labels.join(nb, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("lbl"),
                        F.coalesce(F.col("nlbl"), F.col("lbl")),
                    ).alias("lbl"),
                )
                .localCheckpoint(eager=True)
            )
            changed = not new.join(
                labels, ["node", "lbl"], "left_anti"
            ).isEmpty()
            labels = new
            if not changed:
                break
        else:
            raise RuntimeError(
                f"dedup_clusters did not converge in {max_iter} rounds "
                "(component diameter exceeds the bound)"
            )
    finally:
        edges.unpersist(blocking=True)
    return labels.select(
        F.col("node").alias(id_col), F.col("lbl").alias("cluster_id")
    )
