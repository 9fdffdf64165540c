"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints:

    {"metric": "pipeline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The headline set covers the full KG-construction pipeline (synthesize →
detect → parse → node table → SPO/POS/OSP materialize) plus the heavy
analytics operators (minhash dedup, jaccard verify, ANN, BGP join,
transitive path, group-agg).  Scaling-efficiency runs (N vs 4N cores, the
north rule) live in tools/scaling.py and BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # local test parquet is tiny — keep scans splittable so every stage
    # parallelizes (cluster default stays 128m; see session.py)
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST", "262144")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    from pyspark.sql import functions as F

    from jena_spark.session import get_spark
    from jena_spark.sources import synth_source_files
    from jena_spark.extract import run_extraction
    from jena_spark.nodetable import build_node_table, encode_triples
    from jena_spark.materialize import materialize_encoded
    import __spark_entry__ as em

    spark = get_spark(app="jena_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # JMH-style warmup: the first Python-UDF job of a session pays the
    # one-time Python-daemon/Arrow startup for every core (~6s at 32
    # cores here) — a fixed per-executor cost, not a per-byte cost, so it
    # amortizes to nothing on a real corpus.  Run one tiny mapInPandas
    # round so the timed stages measure steady-state throughput; the
    # warmup cost itself is reported in extras, not hidden.
    def _warmup():
        import pandas as pd  # noqa: F401

        df = spark.range(0, cpus * 4, numPartitions=cpus)
        df.mapInPandas(lambda it: it, "id long").count()

    t0 = time.perf_counter()
    _warmup()
    extras["warmup_sec"] = round(time.perf_counter() - t0, 3)

    # --- KG pipeline at corpus scale proportional to sf ---
    n_files = max(2000, int(200_000 * sf))
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="jena_spark_bench_", dir=shm)
    state: dict = {}

    def kg_extract():
        files = synth_source_files(spark, n_files)
        tri = run_extraction(files).select("graph", "subj", "pred", "obj")
        tri.persist()
        state["n_triples"] = tri.count()
        state["tri"] = tri

    def kg_nodetable():
        nt = build_node_table(state["tri"])  # hash ids: one distinct shuffle
        state["n_terms"] = nt.count()

    def kg_encode():
        enc = encode_triples(state["tri"].select("subj", "pred", "obj"))
        enc.write.format("noop").mode("overwrite").save()

    def kg_materialize():
        # scale path: late-materialized NodeId tables + nodes dictionary
        materialize_encoded(state["tri"], os.path.join(work, "mat"),
                            n_partitions=max(cpus, 16))

    timed("kg_extract", kg_extract)
    timed("kg_nodetable", kg_nodetable)
    timed("kg_encode", kg_encode)
    timed("kg_materialize", kg_materialize)
    extras["n_files"] = n_files
    extras["n_triples"] = state["n_triples"]
    extras["n_terms"] = state["n_terms"]
    extras["triples_per_sec_extract"] = round(
        state["n_triples"] / timings["kg_extract"], 1
    )
    state["tri"].unpersist()

    # --- headline analytics queries from the driver contract ---
    qs = em.queries()
    headline = [
        "kg_extract_triples",
        "alg_group_agg",
        "alg_join",
        "alg_window_rank",
        "path_transitive_plus",
        "dedup_minhash_pairs",
        "dedup_jaccard",
        "dedup_simhash",
        "text_profile",
        "ann_topk",
        "mm_metadata",
    ]
    for name in headline:
        fn = qs[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).write.format("noop")
              .mode("overwrite").save())

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }))


if __name__ == "__main__":
    main()
