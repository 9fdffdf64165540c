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
  shuffle anti-join otherwise (Catalyst/AQE picks);
- each ``run()`` invocation writes its triples AND lineage under a
  ``run=<id>`` subdirectory and then creates a commit marker file as the
  single atomic commit point.  Readers only see committed runs, so a
  crash anywhere mid-batch leaves orphan files that are ignored (and
  re-extracted by the next run) instead of duplicate triples or lineage
  rows without data.  Marker listing/creation goes through the Hadoop
  FileSystem API (``Path.getFileSystem``), so the protocol works on any
  scheme Spark can write to — local, HDFS, S3A — where the marker create
  is a single-object PUT: the same O(1)-commit idea as the TDB2 loader's
  journal.

The reference analog is the TDB2 loader's phased, replayable dataflow
(tdb2/loader/main/LoaderMain.java:49-100) — our phases are idempotent
Spark jobs over immutable inputs instead of threads over queues.
"""

from __future__ import annotations

import os
import uuid
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
        self.commits_dir = os.path.join(work_dir, "commits")

    def _fs_path(self, p: str):
        """(Hadoop FileSystem, Path) for any scheme Spark can reach —
        file://, hdfs://, s3a:// — so commit listing and marker creation
        are not driver-local-filesystem-only."""
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(p)
        return path.getFileSystem(hconf), path

    def _committed(self) -> list[str]:
        fs, path = self._fs_path(self.commits_dir)
        if not fs.exists(path):
            return []
        return sorted(st.getPath().getName() for st in fs.listStatus(path))

    def _read_runs(self, base: str) -> Optional[DataFrame]:
        paths = []
        for r in self._committed():
            p = os.path.join(base, f"run={r}")
            fs, path = self._fs_path(p)
            if fs.exists(path):
                paths.append(p)
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def done_markers(self) -> Optional[DataFrame]:
        lin = self._read_runs(self.lineage_dir)
        return lin.select(*DOC_KEY) if lin is not None else None

    def remaining(self, files: DataFrame) -> DataFrame:
        done = self.done_markers()
        if done is None:
            return files
        return files.join(done, DOC_KEY, "left_anti")

    def run(self, files: DataFrame) -> int:
        """Extract triples for not-yet-done documents, writing this batch's
        triples and lineage under a fresh run directory and committing both
        with one marker file.  Returns number of documents processed this
        invocation (0 = nothing left: fully resumed)."""
        todo = self.remaining(files)
        n_docs = todo.count()
        if n_docs == 0:
            return 0
        run_id = f"{len(self._committed()):06d}-{uuid.uuid4().hex[:8]}"
        detected = detect(todo)
        triples_err = extract_triples(detected)
        triples_err.persist()
        try:
            (
                triples_err.filter(F.col("error").isNull())
                .drop("error")
                .write.mode("overwrite")
                .parquet(os.path.join(self.triples_dir, f"run={run_id}"))
            )
            lin = lineage(todo, triples_err).withColumn(
                "stage", F.lit("parse")
            ).withColumn("partition_id", F.spark_partition_id())
            lin.write.mode("overwrite").parquet(
                os.path.join(self.lineage_dir, f"run={run_id}")
            )
        finally:
            triples_err.unpersist()
        # atomic commit point: both tables for this run become visible
        # (Hadoop FS create = single-object PUT on object stores)
        fs, cdir = self._fs_path(self.commits_dir)
        fs.mkdirs(cdir)
        marker_fs, marker = self._fs_path(os.path.join(self.commits_dir, run_id))
        out = marker_fs.create(marker, False)
        try:
            out.write(bytearray(str(n_docs), "utf-8"))
        finally:
            out.close()
        return n_docs

    def triples(self) -> DataFrame:
        df = self._read_runs(self.triples_dir)
        if df is None:
            raise FileNotFoundError(f"no committed runs under {self.triples_dir}")
        return df

    def lineage_table(self) -> DataFrame:
        df = self._read_runs(self.lineage_dir)
        if df is None:
            raise FileNotFoundError(f"no committed runs under {self.lineage_dir}")
        return df
