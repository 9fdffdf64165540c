"""spark-submit driver for the KG-construction pipeline.

The north-rule deployment shape: the package ships as a zip via
``--py-files`` (build it with tools/build_pyfiles.py), the master /
executor topology comes from spark-submit, and this file is the job
script — it never calls ``.master()`` so the SAME invocation runs on
``local[N]``, YARN, or Kubernetes:

    /opt/spark/bin/spark-submit \
        --master local[8] \
        --py-files dist/jena_spark.zip \
        tools/submit_job.py --sf-dir /root/testdata/sf0.001 --job extract

Jobs (each prints ONE JSON metrics line on stdout):

- ``extract``      files → detect → parse → triples (+ per-partition
                   lineage rollup: files/triples/errors by shard)
- ``materialize``  triples → encoded SPO/POS/OSP store at --out
- ``query``        SPARQL (--sparql, or a default predicate-count) over
                   the extracted triples
- ``dedup``        MinHash-LSH candidate pairs over the documents table

The input table shape is the hint's (repo, path, commit, lang,
content); ``--files-parquet`` reads a real parquet of that schema,
otherwise the documents-derived deterministic corpus under --sf-dir is
used (same generator the bench and the driver correctness gate use).
"""

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--job",
        default="extract",
        choices=("extract", "materialize", "query", "dedup"),
    )
    ap.add_argument(
        "--files-parquet",
        default=None,
        help="optional parquet of (repo, path, commit, lang, content) "
        "source files; defaults to the documents-derived corpus",
    )
    ap.add_argument(
        "--synth-files",
        type=int,
        default=None,
        help="use the deterministic synthetic corpus with N files "
        "instead (the scaling-protocol input; identical rows at any "
        "parallelism)",
    )
    ap.add_argument("--doc-scale", type=int, default=1)
    ap.add_argument(
        "--reps",
        type=int,
        default=1,
        help="run the job N times in this session and report per-rep "
        "seconds plus the best (first rep is the JIT/Arrow warm-up; "
        "the scaling protocol measures warm throughput)",
    )
    ap.add_argument("--sparql", default=None, help="query for --job query")
    ap.add_argument("--out", default=None, help="store dir for materialize")
    ap.add_argument(
        "--shuffle-partitions", type=int, default=None,
        help="override spark.sql.shuffle.partitions (defaults to "
        "spark.default.parallelism)",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = (
        SparkSession.builder.appName(f"jena-spark-{args.job}")
        .config("spark.sql.adaptive.enabled", "true")
    )
    spark = builder.getOrCreate()
    parallelism = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(args.shuffle_partitions or parallelism),
    )

    from jena_spark.extract import (
        detect,
        extract_triples,
        lineage,
        run_extraction,
    )
    from jena_spark.sources import source_files_from_documents

    def files_df():
        if args.files_parquet:
            return spark.read.parquet(args.files_parquet)
        if args.synth_files:
            from jena_spark.sources import synth_source_files

            return synth_source_files(
                spark,
                args.synth_files,
                partitions=4 * parallelism,
                doc_scale=args.doc_scale,
            )
        return source_files_from_documents(spark, args.sf_dir)

    t0 = time.time()
    metrics = {"job": args.job, "sf_dir": args.sf_dir,
               "parallelism": parallelism}

    if args.job == "extract":
        rep_secs = []
        for _ in range(max(1, args.reps)):
            r0 = time.time()
            files = files_df()
            tri = extract_triples(detect(files))
            # per-partition lineage/metrics: one row per document with
            # its triple count, parse error, and content sha256 (the
            # per-row invariant vs the reference)
            lin = lineage(files, tri)
            rollup = lin.agg(
                F.count("*").alias("files"),
                F.sum(F.coalesce("triples_out", F.lit(0))).alias("triples"),
                F.sum(
                    F.when(F.col("error").isNotNull(), 1).otherwise(0)
                ).alias("errors"),
            ).collect()[0]
            rep_secs.append(round(time.time() - r0, 3))
        metrics.update(
            files=int(rollup["files"]),
            triples=int(rollup["triples"]),
            errors=int(rollup["errors"]),
        )
        if len(rep_secs) > 1:
            metrics["rep_sec"] = rep_secs
        metrics["triples_per_sec"] = round(
            metrics["triples"] / min(rep_secs), 1
        )
    elif args.job == "materialize":
        from jena_spark.materialize import materialize_encoded

        out = args.out or "/tmp/jena_spark_store"
        tri = run_extraction(files_df()).select("subj", "pred", "obj")
        info = materialize_encoded(tri, out)
        metrics.update(out=out, **{
            k: v for k, v in (info or {}).items()
            if isinstance(v, (int, float, str))
        })
    elif args.job == "query":
        from jena_spark.ops.sparql import sparql_select

        tri = run_extraction(files_df()).select("subj", "pred", "obj")
        q = args.sparql or (
            "SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o } "
            "GROUP BY ?p ORDER BY DESC(?n) ?p"
        )
        rows = sparql_select(tri, q).collect()
        metrics.update(query_rows=len(rows))
    else:  # dedup
        import os

        from jena_spark.pipelines import dedup as dd

        docs = spark.read.parquet(
            os.path.join(args.sf_dir, "documents.parquet")
        ).repartition(parallelism)
        sigs = dd.minhash_signatures(docs, k=5, num_perm=8)
        cands = dd.minhash_candidates(sigs, bands=2, rows_per_band=4)
        metrics.update(candidate_pairs=cands.count())

    metrics["sec"] = round(time.time() - t0, 3)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
