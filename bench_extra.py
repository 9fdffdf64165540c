"""Round-7 measurement sidecar (guide §1.4): per-stage noop-sink timing.

bench.py is FROZEN for the driver's measurement; this file exists so the
optimization round can isolate WHERE each headline query spends time
(e.g. minhash signatures vs banding vs the jaccard verify join) without
touching the frozen harness.  Usage:

    SPARK_GRAFT_SF_DIR=/root/sf1_local python bench_extra.py [stage ...]

Stages default to the full list.  Prints one JSON line per stage with
min/median over $SPARK_GRAFT_BENCH_REPS (default 3) reps.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST", "262144")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")

    from pyspark.sql import functions as F

    from jena_spark.session import get_spark
    from jena_spark.pipelines import dedup as dd
    from jena_spark.pipelines import similarity as sim
    import __spark_entry__ as em

    spark = get_spark(app="jena_spark_bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(0, cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long").count()

    def docs():
        df = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return df.repartition(spark.sparkContext.defaultParallelism)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # --- sub-stage isolations ---
    def st_minhash_sigs():
        noop(dd.minhash_signatures(docs(), k=5, num_perm=8))

    def st_minhash_pairs_only():
        # pairs stage with sigs precomputed+pinned: isolates the banding
        sigs = dd.minhash_signatures(docs(), k=5, num_perm=8).localCheckpoint()
        t0 = time.perf_counter()
        noop(dd.minhash_candidates(sigs, bands=2, rows_per_band=4))
        return time.perf_counter() - t0

    def st_jaccard_only():
        d = docs().localCheckpoint()
        sigs = dd.minhash_signatures(d, k=5, num_perm=8)
        cands = dd.minhash_candidates(sigs, bands=2, rows_per_band=4)
        t0 = time.perf_counter()
        noop(dd.jaccard_pairs(d, cands, k=5))
        return time.perf_counter() - t0

    def st_shingle_hash_scan():
        # raw cost of computing hashed shingle arrays for every doc
        d = docs()
        sets = d.select(
            F.col("doc_id"),
            F.transform(dd._shingles("text", 5), lambda x: F.xxhash64(x)).alias("sh"),
        )
        noop(sets)

    def st_kmeans_centroids():
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        sim.kmeans_centroids(emb, 16, 1).count()

    # --- full headline queries via the declared entry points ---
    qs = em.queries()
    headline = [
        "kg_extract_triples", "alg_group_agg", "alg_join", "alg_window_rank",
        "path_transitive_plus", "dedup_minhash_pairs", "dedup_jaccard",
        "dedup_simhash", "text_profile", "ann_topk", "mm_metadata",
    ]
    stages: dict = {
        "minhash_sigs": st_minhash_sigs,
        "minhash_pairs_only": st_minhash_pairs_only,
        "jaccard_only": st_jaccard_only,
        "shingle_hash_scan": st_shingle_hash_scan,
        "kmeans_centroids": st_kmeans_centroids,
    }
    for name in headline:
        stages[name] = (lambda fn=qs[name]: noop(fn(spark, sf_dir)))

    wanted = sys.argv[1:] or list(stages)
    out = {}
    for name in wanted:
        fn = stages[name]
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            inner = fn()
            dt = time.perf_counter() - t0
            ts.append(round(inner if isinstance(inner, float) else dt, 3))
        out[name] = {"min": min(ts), "med": statistics.median(ts), "all": ts}
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "stages": out}))


if __name__ == "__main__":
    main()
