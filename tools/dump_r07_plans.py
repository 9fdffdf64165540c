"""Dump plans/r07/<query>_after.txt for the round-7 optimization round.

Mirrors the `_before` dumps (same queries, same sf0.01 corpus, same
`.explain("formatted")`).  For queries whose declared DataFrame ends in
an eager ``localCheckpoint`` (the plan collapses to ``Scan
ExistingRDD``), a PRE-CHECKPOINT section re-builds the same operator
chain with the checkpoint elided so the join/exchange tree the
checkpoint hides is on record — the round-6 verdict's plan-audit blind
spot.

Usage: python tools/dump_r07_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "ann_topk",
    "dedup_clusters",
    "dedup_embedding_pairs",
    "dedup_jaccard",
    "dedup_minhash_pairs",
    "dedup_minhash_sigs",
    "kg_extract_triples",
    "mm_metadata",
    "text_profile",
]


def _explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from jena_spark.session import get_spark
    from jena_spark.pipelines import dedup as dd

    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r07",
    )
    os.makedirs(out_dir, exist_ok=True)

    qs = em.queries()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        text = _explain(df)
        if name in ("dedup_minhash_pairs", "dedup_jaccard"):
            # the declared plan ends at (or consumes) an eager
            # localCheckpoint; also record the operator chain the
            # checkpoint hides: sigs → banding window → self-join →
            # distinct (the capped single-join banding)
            docs = em._spread(em._read(spark, sf_dir, "documents"))
            sigs = dd.minhash_signatures(docs, k=5, num_perm=8)
            from pyspark.sql import Window

            sig_cols = [c for c in sigs.columns if c.startswith("mh_")]
            band_structs = dd._band_structs(sig_cols, 2, 4)
            long = (
                sigs.select(F.col("doc_id"), F.explode(band_structs).alias("bk"))
                .select("doc_id", F.col("bk.band_idx"), F.col("bk.band_key"))
            )
            w = Window.partitionBy("band_idx", "band_key")
            counted = long.withColumn("__cnt", F.count("*").over(w))
            filtered = counted.filter(
                (F.col("__cnt") >= 2) & (F.col("__cnt") <= 1000)
            ).select("doc_id", "band_idx", "band_key")
            left = filtered.withColumnRenamed("doc_id", "id_a")
            right = filtered.withColumnRenamed("doc_id", "id_b")
            pairs = (
                left.join(right, ["band_idx", "band_key"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
            )
            text += (
                "\n\n== PRE-CHECKPOINT banding plan (the chain the eager "
                "localCheckpoint in minhash_candidates truncates above) ==\n"
                + _explain(pairs)
            )
        with open(os.path.join(out_dir, f"{name}_after.txt"), "w") as f:
            f.write(text)
        print(name, "->", f"{name}_after.txt")
    spark.stop()


if __name__ == "__main__":
    main()
