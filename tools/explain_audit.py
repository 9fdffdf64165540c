"""Plan audit: dump `.explain("formatted")` for the headline queries and
grep for scale red flags (missing pushdown, row-at-a-time Python,
cartesian products).  Output: BENCH/plans/<query>.txt + a summary table.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "kg_extract_triples",
    "kg_pred_counts",
    "alg_group_agg",
    "alg_join",
    "alg_topn_slice",
    "dedup_minhash_pairs",
    "dedup_embedding_pairs",
    "ann_topk",
    "text_profile",
    "text_chunks",
    "kg_sparql_update",
    "kg_sparql_describe",
    # round 4
    "cdt_fold_unfold",
    "rdf_patch_apply",
    "path_distinct_2hop",
    # round 6: the remaining bench heavy-hitters
    "dedup_jaccard",
    "dedup_simhash",
    "mm_metadata",
    "alg_window_rank",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from jena_spark.session import get_spark

    spark = get_spark(master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "plans")
    os.makedirs(out_dir, exist_ok=True)

    qs = em.queries()
    hdr = ("query", "exchg", "arrowUDF", "rowUDF", "bcast", "SMJ", "cartesian")
    print(f"{hdr[0]:28s} {hdr[1]:>6s} {hdr[2]:>8s} {hdr[3]:>7s} {hdr[4]:>6s} {hdr[5]:>4s} {hdr[6]:>9s}")
    flagged = []
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        row_udf = plan.count("BatchEvalPython")  # row-at-a-time Python: bad
        cart = plan.count("CartesianProduct")
        print(
            f"{name:28s} {plan.count('Exchange'):6d} "
            f"{plan.count('MapInPandas') + plan.count('ArrowEvalPython'):8d} "
            f"{row_udf:7d} "
            f"{plan.count('BroadcastHashJoin'):6d} "
            f"{plan.count('SortMergeJoin'):4d} "
            f"{cart:9d}"
        )
        if row_udf:
            flagged.append(f"{name}: row-at-a-time Python UDF in plan")
        if cart:
            flagged.append(f"{name}: cartesian product in plan")
    spark.stop()
    if flagged:
        print("\nRED FLAGS:")
        for fline in flagged:
            print(" ", fline)
        raise SystemExit(1)
    print("\nno red flags (no row-Python, no cartesian products)")


if __name__ == "__main__":
    main()
