"""Dictionary-encoded node table — the TDB2 NodeTable re-expressed.

Reference behavior (tdb2/store/nodetable/NodeTableNative.java:42-170):
a synchronized two-way map term↔64-bit id, with small numerics inlined
into the id (NodeIdInline.java) so they never bloat the table.

Spark design:
- the node table is ``distinct terms → dense ids`` built with a single
  shuffle (hash-distinct) + zipWithIndex-free id minting via
  ``row_number() over partition-local ordering`` composed from
  (partition_id, local row_number) — no global sort, no driver collect;
- triples are encoded by three joins (subj/pred/obj → id).  The node
  table is **broadcast when small** (vocab ≤ broadcast threshold) and
  **sort-merge/shuffle joined when large** — exactly the north-star rule;
  we let AQE make the final call from runtime stats but expose an explicit
  ``broadcast`` knob;
- the "inline small numerics" behavior maps to: literals whose lexical
  form is short and self-describing can skip the dictionary — we keep the
  string-only dictionary default and expose ``inline_numeric=True`` to
  filter the integer-family literals out of the table (they stay lexical
  in the encoded triples' ``*_lex`` columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_INLINE_RE = r'^"[+-]?\d{1,18}"\^\^<http://www\.w3\.org/2001/XMLSchema#(integer|int|long|short|byte)>$'


def build_node_table(triples: DataFrame, inline_numeric: bool = False) -> DataFrame:
    """Distinct terms over (subj, pred, obj, graph) → (term, node_id).

    Dense ids without a global sort: ``monotonically_increasing_id`` is
    shuffle-unsafe across retries of *nondeterministic* inputs but the
    distinct-terms set is deterministic; we still prefer a deterministic
    id = dense rank over term ordering within hash buckets so re-runs of
    any partition subset mint identical ids (checkpoint-resume rule).
    Cost: one extra narrow exchange over the (small relative to triples)
    distinct-term set.
    """
    terms = (
        triples.select(F.col("subj").alias("term"))
        .unionAll(triples.select(F.col("pred").alias("term")))
        .unionAll(triples.select(F.col("obj").alias("term")))
        .unionAll(
            triples.select(F.col("graph").alias("term")).filter(
                F.col("graph").isNotNull()
            )
            if "graph" in triples.columns
            else triples.select(F.lit(None).cast("string").alias("term")).limit(0)
        )
        .distinct()
    )
    if inline_numeric:
        terms = terms.filter(~F.col("term").rlike(_INLINE_RE))
    # Deterministic dense ids: bucket by hash, order within bucket by term.
    # Window over (bucket) is a single shuffle of the distinct-term set;
    # the cross-bucket offset is a tiny (n_buckets) broadcast join.
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


def encode_triples(
    triples: DataFrame, node_table: DataFrame, broadcast: bool | None = None
) -> DataFrame:
    """triples(strings) ⋈ node_table → triples(ids).

    ``broadcast=True`` forces a broadcast of the node table (small vocab);
    ``False`` forces shuffle/sort-merge; ``None`` lets Catalyst+AQE pick
    from stats (the default and usually right answer).
    """
    nt = node_table
    if broadcast is True:
        nt = F.broadcast(nt)
    elif broadcast is False:
        nt = nt.hint("merge")

    def enc(df: DataFrame, col: str) -> DataFrame:
        n = nt.withColumnRenamed("term", col).withColumnRenamed("node_id", col[0])
        return df.join(n, col, "left")

    out = triples
    for col in ("subj", "pred", "obj"):
        out = enc(out, col)
    keep = [c for c in out.columns if c not in ("subj", "pred", "obj")]
    return out.select(
        *keep,
        F.col("s").alias("s_id"),
        F.col("p").alias("p_id"),
        F.col("o").alias("o_id"),
    ).drop("s", "p", "o")


def decode_triples(encoded: DataFrame, node_table: DataFrame) -> DataFrame:
    """Late materialization: ids → lexical terms only at the sink
    (reference: BindingNodeId → Node conversion at result time,
    tdb2/solver/BindingNodeId.java:34-40)."""
    out = encoded
    for idc, col in (("s_id", "subj"), ("p_id", "pred"), ("o_id", "obj")):
        n = node_table.withColumnRenamed("node_id", idc).withColumnRenamed("term", col)
        out = out.join(n, idc, "left").drop(idc)
    return out
