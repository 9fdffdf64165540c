"""Code-level entity mentions (north-star axis B).

Extracts identifier mentions from source-code file contents with pure
``pyspark.sql.functions`` column work (split/explode/filter — JVM-side,
whole-stage codegen; no per-row Python), normalizes them the same way the
linker does (lower-case, underscore/camel-hump folding), and feeds
``linking.link_entities`` for MinHash-LSH + scoring.

Reference analog: jena-text's entity document producer
(jena-text/.../TextDocProducerTriples.java tokenizes literals into an
index keyed by subject URI); here the "literals" are code identifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# identifier-ish tokens: letters/digits/_ starting with a letter or _
_IDENT_SPLIT = r"[^A-Za-z0-9_]+"
_IDENT_OK = r"^[A-Za-z_][A-Za-z0-9_]{2,63}$"

# words too common in code to be entity mentions
STOPWORDS = (
    "the and for not import from def class return self this var let const "
    "function if else elif while do true false none null new int str len "
    "void public private static final"
).split()


def extract_mentions(
    files: DataFrame,
    content_col: str = "content",
    min_count: int = 1,
) -> DataFrame:
    """files(repo, path, commit, content) → (repo, path, mention, n_occurrences).

    Token pipeline: split on non-identifier chars → keep identifier-shaped
    tokens ≥3 chars → drop code stopwords → per-file counts.  All narrow
    (no shuffle until the count aggregation)."""
    toks = files.select(
        "repo",
        "path",
        F.explode(F.split(F.col(content_col), _IDENT_SPLIT)).alias("mention"),
    ).filter(F.col("mention").rlike(_IDENT_OK))
    toks = toks.filter(~F.lower(F.col("mention")).isin(STOPWORDS))
    out = toks.groupBy("repo", "path", "mention").agg(
        F.count("*").alias("n_occurrences")
    )
    if min_count > 1:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out


def camel_split(col) -> F.Column:
    """CamelCase → space-separated humps (JVM regexp)."""
    return F.regexp_replace(
        F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2"),
        r"[_\-]+",
        " ",
    )


def mention_entities(
    files: DataFrame,
    entities: DataFrame,
    **link_kwargs,
) -> DataFrame:
    """End-to-end: extract mentions → MinHash-LSH candidates → scored
    links against an entity table (entity_iri, entity_name)."""
    from .linking import link_entities

    mentions = extract_mentions(files).select("mention").distinct()
    return link_entities(mentions, entities, **link_kwargs)
