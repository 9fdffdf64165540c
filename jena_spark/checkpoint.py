"""Checkpoint / resume bookkeeping.

North-rule requirement: the pipeline is resumable from checkpoint with
per-partition lineage + metrics.  Design (SURVEY.md §7.7):

- the unit of work is the *document* (repo, path, commit) — all parser
  state is document-local, so any subset of documents can be re-run and
  will reproduce byte-identical triples (skolem labels are seeded by the
  document key, node ids are content-deterministic);
- completed work is recorded as a ``lineage`` parquet table of
  per-document rows (triples_out, error, content_sha256);
- resume = **anti-join** the input files against the done-markers —
  a single shuffle-free broadcast anti-join when the done set is small,
  shuffle anti-join otherwise (Catalyst/AQE picks).

The reference analog is the TDB2 loader's phased, replayable dataflow
(tdb2/loader/main/LoaderMain.java:49-100) — our phases are idempotent
Spark jobs over immutable inputs instead of threads over queues.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import detect, extract_triples, lineage

DOC_KEY = ["repo", "path", "commit"]


class CheckpointedExtraction:
    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        self.triples_dir = os.path.join(work_dir, "triples")
        self.lineage_dir = os.path.join(work_dir, "lineage")

    def done_markers(self) -> Optional[DataFrame]:
        try:
            return self.spark.read.parquet(self.lineage_dir).select(*DOC_KEY)
        except Exception:
            return None

    def remaining(self, files: DataFrame) -> DataFrame:
        done = self.done_markers()
        if done is None:
            return files
        return files.join(done, DOC_KEY, "left_anti")

    def run(self, files: DataFrame) -> int:
        """Extract triples for not-yet-done documents, appending to the
        triples and lineage tables.  Returns number of documents processed
        this invocation (0 = nothing left: fully resumed)."""
        todo = self.remaining(files)
        n_docs = todo.count()
        if n_docs == 0:
            return 0
        detected = detect(todo)
        triples_err = extract_triples(detected)
        triples_err.persist()
        try:
            (
                triples_err.filter(F.col("error").isNull())
                .drop("error")
                .write.mode("append")
                .parquet(self.triples_dir)
            )
            lin = lineage(todo, triples_err).withColumn(
                "stage", F.lit("parse")
            ).withColumn("partition_id", F.spark_partition_id())
            lin.write.mode("append").parquet(self.lineage_dir)
        finally:
            triples_err.unpersist()
        return n_docs

    def triples(self) -> DataFrame:
        return self.spark.read.parquet(self.triples_dir)

    def lineage_table(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_dir)
