"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints:

    {"metric": "pipeline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, ...extras}

Noise robustness (round 6): every stage/query runs ``$SPARK_GRAFT_BENCH_REPS``
times (default 3) inside the one warm session and ``queries`` reports the
per-query MINIMUM — a min-of-K is robust to transient co-tenant CPU spikes
that a single pass is not (the round-5 record printed a phantom 2.4x
"regression" that an interleaved A/B later proved to be box noise).  A
``noise`` sidecar records the evidence needed to adjudicate any future
anomaly without re-running: loadavg before/after, a single-core md5
throughput probe, a 2-vs-8-process raw scaling ceiling, and the per-query
max/min spread across reps (spread >> 1.15 on several queries = contended
box, not a code change).

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


def _md5_rate(seconds: float = 1.0) -> float:
    """Single-core md5 hash chain throughput (Mops/s) — a contention probe.

    On a quiet box this is stable to a few percent; a co-tenant burning CPU
    depresses it visibly even when loadavg (which misses host-level
    co-tenancy) looks clean.
    """
    import hashlib

    h = b"x"
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for _ in range(20_000):
            h = hashlib.md5(h).digest()
        n += 20_000
    return round(n / (time.perf_counter() - t0) / 1e6, 4)


def _burn(n: int) -> int:
    # module-level: mp.Pool pickles the callable by qualified name
    import hashlib

    h = b"x"
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def _scaling_ceiling() -> float:
    """Raw 2-vs-8-process md5 scaling ceiling (quiet box: >= 0.87 here).

    Same probe tools/scaling_campaign.sh gates on, sized to ~2s.  Must run
    while no Spark JVM is live in this process (fork safety), so bench calls
    it strictly before get_spark() and after spark.stop().
    """
    import multiprocessing as mp

    def rate(procs: int, n: int = 150_000) -> float:
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_burn, [n] * procs * 2)
            dt = time.perf_counter() - t0
        return procs * 2 * n / dt

    r2 = rate(2)
    r8 = rate(8)
    return round(r8 / (4 * r2), 3)


def _noise_probe(with_ceiling: bool) -> dict:
    probe = {
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "md5_1core_mops": _md5_rate(),
    }
    if with_ceiling:
        probe["ceiling_2v8"] = _scaling_ceiling()
    return probe


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # local test parquet is tiny — keep scans splittable so every stage
    # parallelizes (cluster default stays 128m; see session.py)
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m")
    os.environ.setdefault("SPARK_GRAFT_OPEN_COST", "262144")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    noise: dict = {"reps": reps}
    noise["before"] = _noise_probe(with_ceiling=True)

    from jena_spark.session import get_spark
    from jena_spark.sources import synth_source_files
    from jena_spark.extract import run_extraction
    from jena_spark.nodetable import build_node_table, encode_triples
    from jena_spark.materialize import materialize_encoded
    import __spark_entry__ as em

    spark = get_spark(app="jena_spark_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # all observed rep times, per stage/query — minima become the record,
    # the full lists feed the spread sidecar
    samples: dict[str, list[float]] = {}
    extras: dict = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        samples.setdefault(name, []).append(
            round(time.perf_counter() - t0, 3))

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

    # the pipeline stages carry state (tri feeds nodetable/encode/
    # materialize), so repeat the whole sequence; each rep unpersists and
    # rebuilds so no rep free-rides on a prior rep's cache
    for _ in range(reps):
        timed("kg_extract", kg_extract)
        timed("kg_nodetable", kg_nodetable)
        timed("kg_encode", kg_encode)
        timed("kg_materialize", kg_materialize)
        state["tri"].unpersist()
    extras["n_files"] = n_files
    extras["n_triples"] = state["n_triples"]
    extras["n_terms"] = state["n_terms"]

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
    for _ in range(reps):
        for name in headline:
            fn = qs[name]
            timed(name, lambda fn=fn: fn(spark, sf_dir).write.format("noop")
                  .mode("overwrite").save())

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()

    noise["after"] = _noise_probe(with_ceiling=True)
    noise["spread_max_over_min"] = {
        k: round(max(v) / max(min(v), 1e-9), 3) for k, v in samples.items()
    }
    noise["samples"] = samples

    timings = {k: min(v) for k, v in samples.items()}
    extras["triples_per_sec_extract"] = round(
        state["n_triples"] / timings["kg_extract"], 1
    )
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "pipeline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        **extras,
        "noise": noise,
    }))


if __name__ == "__main__":
    main()
