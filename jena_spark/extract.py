"""Stage 1–2 of the pipeline: detection + vectorized triple extraction.

Spark shape (SURVEY.md §3.1): ``files DF → filter(isRDF) →
mapInPandas(parse_document) → triples DF``.  All reference-side parser
state (prefix map, base IRI, blank-node scope) is per-document, so the
parse stage is embarrassingly parallel; the only boundaries are executor
fan-out and the downstream dictionary/materialize shuffles.

Scale notes:
- detection is pure Catalyst column work (no Python) so non-RDF rows are
  dropped before the Arrow exchange;
- the parse UDF is ``mapInPandas`` (Arrow batches, zero per-row Python
  round trips);
- per-document lineage (repo, path, commit, sha256, triple count, error)
  comes out of the same pass — no second parse.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .parsers.registry import EXT_TO_LANG, parse_document

TRIPLES_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("graph", StringType(), True),   # null = default graph
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj", StringType(), True),
        StructField("error", StringType(), True),   # set on doc-level failure rows
    ]
)


def lang_column(path: Column, lang_hint: Column) -> Column:
    """Detected RDF language, or NULL — pure Catalyst expression
    (extension registry of riot/RDFLanguages.java:69-161)."""
    ext = F.lower(F.regexp_extract(path, r"\.([A-Za-z]+)$", 1))
    mapping = F.create_map(
        *[x for k, v in EXT_TO_LANG.items() for x in (F.lit(k), F.lit(v))]
    )
    by_ext = mapping[ext]
    known = F.lit(sorted(set(EXT_TO_LANG.values())))
    return F.when(F.array_contains(known, lang_hint), lang_hint).otherwise(by_ext)


def detect(files: DataFrame) -> DataFrame:
    """Adds ``rdf_lang`` and keeps plausible RDF rows only (cheap column
    predicates + content sniff — SURVEY.md §2.1 'Detection')."""
    df = files.withColumn("rdf_lang", lang_column(F.col("path"), F.col("lang")))
    head = F.substring(F.col("content"), 1, 4096)
    sniff_ok = (
        F.when(F.col("rdf_lang").isin("rdfxml", "trix"), head.contains("<"))
        .when(
            F.col("rdf_lang").isin("jsonld", "rdfjson"),
            F.ltrim(head).startswith("{") | F.ltrim(head).startswith("["),
        )
        .otherwise(F.lit(True))
    )
    return df.filter(F.col("rdf_lang").isNotNull() & sniff_ok)


def extract_triples(detected: DataFrame) -> DataFrame:
    """Parse each detected document into canonical-N-Triples-encoded rows.
    Documents that fail to parse contribute exactly one row with
    ``error`` set and null terms (zero triples — negative-syntax parity)."""

    cols = ["repo", "path", "commit", "rdf_lang", "content"]

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("repo", "path", "commit", "graph", "subj", "pred", "obj", "error")}
            for repo, path, commit, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["rdf_lang"], pdf["content"]
            ):
                quads, err = parse_document(repo, path, commit, lang, content)
                if err is not None:
                    out["repo"].append(repo); out["path"].append(path)
                    out["commit"].append(commit); out["graph"].append(None)
                    out["subj"].append(None); out["pred"].append(None)
                    out["obj"].append(None); out["error"].append(err)
                    continue
                for g, s, p, o in quads:
                    out["repo"].append(repo); out["path"].append(path)
                    out["commit"].append(commit); out["graph"].append(g)
                    out["subj"].append(s); out["pred"].append(p)
                    out["obj"].append(o); out["error"].append(None)
            yield pd.DataFrame(out)

    return detected.select(*cols).mapInPandas(parse_batch, TRIPLES_SCHEMA)


def run_extraction(files: DataFrame) -> DataFrame:
    """files → triples (error rows filtered out; distinct by set semantics
    is NOT applied here — graphs are sets but documents may legitimately
    repeat a triple across documents; dedup happens at materialization)."""
    return (
        extract_triples(detect(files))
        .filter(F.col("error").isNull())
        .drop("error")
    )


def lineage(files: DataFrame, triples_with_errors: DataFrame) -> DataFrame:
    """Per-document lineage/metrics table (FIXTURES.md §4): triple counts,
    error, content sha256 — the per-row invariant vs the reference."""
    counts = triples_with_errors.groupBy("repo", "path", "commit").agg(
        F.count(F.col("subj")).alias("triples_out"),
        F.max("error").alias("error"),
    )
    shas = files.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("content_sha256")
    )
    return shas.join(counts, ["repo", "path", "commit"], "left")
