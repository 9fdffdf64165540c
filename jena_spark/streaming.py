"""Structured Streaming surface.

The reference is pull/push streaming with NO event-time semantics
(SURVEY.md §2.9): StreamRDF push pipelines, AsyncParser (parser thread +
bounded queue, riot/system/AsyncParser.java:293-346) and the RDF Patch
change stream (jena-rdfpatch/.../RDFChanges.java).  The Spark-native
equivalents:

- :func:`stream_extract` — ``readStream`` over arriving source-file
  batches → the same Arrow parse UDF → ``writeStream`` of triples.
  AsyncParser's bounded-queue backpressure is Structured Streaming's
  micro-batch admission control (``maxFilesPerTrigger``).
- :func:`stream_predicate_counts` — incremental aggregation (counts per
  predicate) with a processing-time watermark — the "load monitor"
  analog of the reference's ProgressMonitorOutput ticks.
- :func:`patch_ops_stream` + :func:`apply_patch_batch` — RDF Patch
  documents stream in, parse to ordered (op, quad) rows (rdfpatch.py,
  aborted transactions dropped), and fold into a parquet-backed store
  with the same delta-shaped set operations as SPARQL Update.
- :func:`stream_dedup_stateful` — cross-micro-batch exact dedup as a
  custom stateful operator (``applyInPandasWithState``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import TRIPLES_SCHEMA, extract_triples, detect
from .sources import SOURCE_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Streaming triples DF from a directory of arriving parquet source
    files (same schema as the batch input table)."""
    files = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return extract_triples(detect(files)).filter(F.col("error").isNull()).drop("error")


def stream_predicate_counts(triples_stream: DataFrame) -> DataFrame:
    """Incremental predicate histogram with an ingest-time watermark —
    demonstrates watermark + windowed aggregation over the triple stream."""
    with_ts = triples_stream.withColumn("ingest_ts", F.current_timestamp())
    return (
        with_ts.withWatermark("ingest_ts", "10 seconds")
        .groupBy(F.window("ingest_ts", "10 seconds").start.alias("win"), "pred")
        .agg(F.count("*").alias("n_triples"))
    )


def run_stream_to_parquet(
    triples_stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain all currently-available input (Trigger.AvailableNow) into a
    parquet sink with exactly-once checkpointing, then stop."""
    q = (
        triples_stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def patch_ops_stream(patches: DataFrame, text_col: str = "patch") -> DataFrame:
    """RDF Patch DOCUMENTS (one text per row) → their committed A/D quad
    ops, in order: (op, graph, subj, pred, obj).  The streaming bridge
    between jena-rdfpatch change logs and the quad-store appliers below
    (rdfpatch.parse_patch handles TX/TC/TA — aborted transactions
    contribute nothing).  Arrow-batched; works on static and streaming
    DataFrames alike."""
    schema = "op string, graph string, subj string, pred string, obj string"

    def expand(batches):
        import pandas as pd

        from .rdfpatch import parse_patch

        for pdf in batches:
            rows = []
            for text in pdf[text_col]:
                for code, (g, s, p, o) in parse_patch(text).ops:
                    rows.append((code, g, s, p, o))
            yield pd.DataFrame(
                rows, columns=["op", "graph", "subj", "pred", "obj"]
            )

    return patches.mapInPandas(expand, schema)


def apply_patch_batch(target_dir: str):
    """foreachBatch function applying an RDF-Patch-style (op, graph, subj,
    pred, obj) micro-batch to a parquet table: 'A' rows appended, 'D'
    rows anti-joined away.  (RDFChanges.add/delete parity; txn markers
    map to micro-batch boundaries, which are atomic per sink commit.)

    Delta-shaped like SPARQL Update: deletes are a null-safe anti-join
    of the store against the (small) delta, adds go through the
    broadcast semi/anti insert — the store is never re-shuffled (the
    old per-batch full-store ``dropDuplicates`` is gone).  The parquet
    rewrite itself stands in for an Iceberg MERGE with positional
    deletes at real scale."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        from .ops.update import _minus, _union

        spark = batch.sparkSession
        adds = batch.filter(F.col("op") == "A").drop("op").dropDuplicates()
        dels = batch.filter(F.col("op") == "D").drop("op")
        try:
            cur = spark.read.parquet(target_dir)
        except Exception:
            cur = spark.createDataFrame([], adds.schema)
        nxt = _union(
            _minus(cur, dels), adds, known_small=True, pre_deduped=True
        )
        nxt.write.mode("overwrite").parquet(target_dir + "_next")
        spark.read.parquet(target_dir + "_next").write.mode(
            "overwrite"
        ).parquet(target_dir)

    return apply


def stream_dedup_stateful(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-micro-batch exact deduplication as a CUSTOM STATEFUL
    operator (``applyInPandasWithState``): the state per content hash is
    a seen-marker, so only the FIRST document with a given content ever
    reaches the sink — across triggers and across restarts (state lives
    in the checkpoint).

    This is the streaming analog of ``pipelines.dedup.dedup_exact`` and
    the Spark-native replacement for a reference-style stateful
    StreamRDF wrapper (riot/system/StreamRDFCountingBase.java keeps
    running state the same way).  Scale: state is hash-partitioned by
    key (RocksDB/HDFS state store on a cluster); per-key state is one
    boolean, so the store grows with DISTINCT content only."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = docs_stream.select(
        F.md5(F.col(text_col)).alias("content_md5"),
        F.col(id_col).cast("long").alias("keep_id"),
        F.col(text_col).alias("text"),
    )

    out_type = "content_md5 string, keep_id long, text string"
    state_type = "seen int"

    def first_only(key, pdfs, state):
        import pandas as pd

        if state.exists:
            return  # content already emitted in an earlier batch
        # one key's micro-batch may arrive as SEVERAL pandas chunks —
        # track the running minimum across ALL of them so the emitted
        # representative matches the batch analog (min id per hash)
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            row = pdf.nsmallest(1, "keep_id")[["content_md5", "keep_id", "text"]]
            if best is None or row["keep_id"].iloc[0] < best["keep_id"].iloc[0]:
                best = row
        if best is not None:
            state.update((1,))
            yield best

    return keyed.groupBy("content_md5").applyInPandasWithState(
        first_only,
        outputStructType=out_type,
        stateStructType=state_type,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
