"""Dictionary-encoded node table — the TDB2 NodeTable re-expressed.

Reference behavior (tdb2/store/nodetable/NodeTableNative.java:42-170):
a synchronized two-way map term↔64-bit id; ids are NOT dense — they are
byte offsets into the term file, and small numerics are value-inlined
into the id (tdb2/store/NodeIdInline.java:44-58) so they never touch the
dictionary.

Spark design:
- **hash ids (default)**: ``node_id = xxhash64(term)`` — deterministic,
  mintable with ZERO shuffles (any partition of any run mints the same
  id), which is what makes the pipeline checkpoint-resumable and lets
  encode run as pure joins.  Faithful to the reference in spirit (ids
  are opaque 64-bit keys, not ranks).  Collision odds at 10^9 distinct
  terms ≈ 2.7e-2 cumulative birthday bound — below risk appetite at
  10^12-file scale, so ``id_bits=128`` switches to the md5 pair
  (collision-free for any realistic vocabulary); a uniqueness audit is
  one groupBy away (:func:`assert_ids_unique`).
- **dense ids (optional)**: rank-based 0..N-1 ids via bucketed window —
  needed only when downstream wants array-indexable ids;
  costs one extra shuffle of the distinct-term set.
- triples encode by three joins (subj/pred/obj → id).  The node table is
  **broadcast when small**, **sort-merge/shuffle joined when large**
  (north-star rule); AQE makes the final call from runtime stats unless
  the ``broadcast`` knob forces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_INLINE_RE = r'^"[+-]?\d{1,18}"\^\^<http://www\.w3\.org/2001/XMLSchema#(integer|int|long|short|byte)>$'


def distinct_terms(triples: DataFrame, inline_numeric: bool = False) -> DataFrame:
    """Distinct terms over (subj, pred, obj [, graph]) — single pass via
    explode (one scan of the input, one hash-distinct shuffle)."""
    cols = ["subj", "pred", "obj"]
    if "graph" in triples.columns:
        terms = triples.select(
            F.explode(F.array("subj", "pred", "obj", "graph")).alias("term")
        ).filter(F.col("term").isNotNull())
    else:
        terms = triples.select(F.explode(F.array(*cols)).alias("term"))
    terms = terms.distinct()
    if inline_numeric:
        # value-inlinable numerics skip the dictionary (NodeIdInline parity)
        terms = terms.filter(~F.col("term").rlike(_INLINE_RE))
    return terms


def term_id(col, id_bits: int = 64):
    if id_bits == 64:
        return F.xxhash64(col)
    # 128-bit: md5 split into two longs, kept as a struct
    h = F.md5(col)
    return F.struct(
        F.conv(F.substring(h, 1, 16), 16, 10).cast("decimal(20,0)").alias("hi"),
        F.conv(F.substring(h, 17, 16), 16, 10).cast("decimal(20,0)").alias("lo"),
    )


def build_node_table(
    triples: DataFrame,
    inline_numeric: bool = False,
    dense: bool = False,
    id_bits: int = 64,
) -> DataFrame:
    """(term, node_id) dictionary.  Default: shuffle-free hash ids.
    ``dense=True``: deterministic 0..N-1 ids (rank by term within hash
    buckets + bucket offsets) — one extra shuffle + a tiny broadcast."""
    terms = distinct_terms(triples, inline_numeric)
    if not dense:
        return terms.select("term", term_id(F.col("term"), id_bits).alias("node_id"))

    nbuckets = 1024
    bucketed = terms.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(nbuckets)))
    w = Window.partitionBy("bucket").orderBy("term")
    local = bucketed.withColumn("local_id", F.row_number().over(w) - 1)
    sizes = (
        local.groupBy("bucket").agg(F.count("*").alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    return (
        local.join(F.broadcast(sizes), "bucket")
        .select("term", (F.col("offset") + F.col("local_id")).alias("node_id"))
    )


def assert_ids_unique(node_table: DataFrame) -> None:
    """Collision audit for hash ids (cheap: one agg over the dictionary)."""
    dup = (
        node_table.groupBy("node_id").count().filter(F.col("count") > 1).limit(1)
    )
    rows = dup.collect()
    if rows:
        raise RuntimeError(f"node_id collision detected: {rows[0]}")


def encode_triples(
    triples: DataFrame,
    node_table: DataFrame | None = None,
    broadcast: bool | None = None,
    id_bits: int = 64,
) -> DataFrame:
    """triples(strings) → triples(ids).

    With hash ids (node_table=None or default table) NO join is needed at
    all — ids are computed inline per column (zero shuffle).  A node_table
    argument forces the join path (dense ids / dictionary verification):
    ``broadcast=True`` broadcasts it, ``False`` forces sort-merge, ``None``
    lets Catalyst+AQE pick from stats.
    """
    if node_table is None:
        keep = [c for c in triples.columns if c not in ("subj", "pred", "obj")]
        return triples.select(
            *keep,
            term_id(F.col("subj"), id_bits).alias("s_id"),
            term_id(F.col("pred"), id_bits).alias("p_id"),
            term_id(F.col("obj"), id_bits).alias("o_id"),
        )

    nt = node_table
    if broadcast is True:
        nt = F.broadcast(nt)
    elif broadcast is False:
        nt = nt.hint("merge")

    out = triples
    for col, idc in (("subj", "s_id"), ("pred", "p_id"), ("obj", "o_id")):
        n = nt.withColumnRenamed("term", col).withColumnRenamed("node_id", idc)
        out = out.join(n, col, "left")
    keep = [c for c in out.columns if c not in ("subj", "pred", "obj")]
    return out.select(*keep)


def decode_triples(encoded: DataFrame, node_table: DataFrame) -> DataFrame:
    """Late materialization: ids → lexical terms only at the sink
    (reference: BindingNodeId → Node conversion at result time,
    tdb2/solver/BindingNodeId.java:34-40)."""
    out = encoded
    for idc, col in (("s_id", "subj"), ("p_id", "pred"), ("o_id", "obj")):
        n = node_table.withColumnRenamed("node_id", idc).withColumnRenamed("term", col)
        out = out.join(n, idc, "left").drop(idc)
    return out
