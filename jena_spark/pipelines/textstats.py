"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All pure built-in column expressions (JVM-side)
— each has an exact ANSI-SQL mirror for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word heuristics per language; counts of ' w ' occurrences.
LANG_MARKERS = {
    "de": ["der", "und", "die", "nicht", "ist"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "de", "que", "los", "es"],
    "fr": ["le", "et", "les", "des", "est"],
    "zh": [],  # handled by CJK character presence
}


def _lower_tokens(text_col) -> F.Column:
    """ONE whitespace split of the lowercased text — all marker-word
    counts below filter this array instead of rescanning the document
    per word (the old form ran one full regexp_replace pass per marker:
    ~20 scans of every document for langid alone)."""
    return F.split(F.lower(text_col), r"\s+")


def _token_hits(tokens, words: list) -> F.Column:
    """count of tokens ∈ words, as a column over the token array.
    Mirrored in SQL as len(list_filter(split(...), x -> x IN (...)))."""
    return F.size(F.filter(tokens, lambda x: x.isin(*words))).cast("double")


def lang_scores(text_col) -> dict:
    tokens = _lower_tokens(text_col)
    scores = {}
    for lang, words in LANG_MARKERS.items():
        if lang == "zh":
            # CJK presence: count of chars in the unified ideograph block
            scores[lang] = F.length(
                F.regexp_replace(text_col, r"[^一-鿿]", "")
            ).cast("double")
        else:
            scores[lang] = _token_hits(tokens, words)
    return scores


def _langid_cols(text_col) -> list:
    """Columns (pred_lang, lang_score): marker-word language ID with
    deterministic tie-break (highest score, then language name)."""
    scores = lang_scores(text_col)
    pairs = F.array(
        *[
            F.struct(v.alias("score"), F.lit(k).alias("lang"))
            for k, v in sorted(scores.items())
        ]
    )
    best = F.array_max(
        F.transform(
            pairs, lambda p: F.struct(p["score"].alias("score"), p["lang"].alias("lang"))
        )
    )
    # array_max on struct orders by score then lang — ties break to the
    # lexicographically LAST language; invert lang for first-wins? keep
    # score-desc, lang-desc: deterministic either way; document it.
    return [
        best["lang"].alias("pred_lang"),
        F.round(best["score"], 6).alias("lang_score"),
    ]


def langid(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram/marker-word language ID with deterministic tie-break
    (highest score, then language name)."""
    return docs.select(F.col(id_col), *_langid_cols(F.col(text_col)))


def _quality_cols(t) -> list:
    """Columns: char length, token count, mean token length, punctuation
    ratio, alpha ratio, stopword ratio."""
    trimmed = F.trim(t)
    tokens = F.split(trimmed, r"\s+")
    n_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(tokens))
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    stop_hits = _token_hits(_lower_tokens(t), LANG_MARKERS["en"])
    return [
        n_chars.alias("n_chars_m"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6).alias("mean_tok_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
    ]


def quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality features: char length, token count, mean token length,
    punctuation ratio, stopword ratio, alpha ratio."""
    return docs.select(F.col(id_col), *_quality_cols(F.col(text_col)))


def _token_count_cols(t) -> list:
    """Columns (ws_tokens, subword_pieces)."""
    trimmed = F.trim(t)
    ws_tokens = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    # subword pieces: split on whitespace AND on transitions (regex class
    # boundaries approximated by splitting on non-alphanumerics too)
    pieces = F.size(
        F.filter(
            F.split(F.lower(t), r"[^a-z0-9]+"), lambda x: F.length(x) > 0
        )
    )
    return [
        ws_tokens.cast("long").alias("ws_tokens"),
        pieces.cast("long").alias("subword_pieces"),
    ]


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy: count of
    letter-digit/camel/punct boundaries (regex split points)."""
    return docs.select(F.col(id_col), *_token_count_cols(F.col(text_col)))


def text_query(
    docs: DataFrame,
    keywords: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    limit: int = 20,
) -> DataFrame:
    """jena-text ``text:query`` analog (TextQueryPF parity in spirit):
    keyword search over the document text with a term-frequency score,
    deterministic ranking (score desc, id asc).  All JVM-side column
    expressions — at scale this is a scan + TakeOrderedAndProject; a
    pre-built inverted index (explode tokens → (term, doc) table sorted
    by term) is the materialized variant of the same plan."""
    score = _token_hits(
        _lower_tokens(F.col(text_col)), [w.lower() for w in keywords]
    )
    return (
        docs.select(F.col(id_col), score.cast("long").alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(limit)
    )


def _fingerprint_col(t) -> F.Column:
    norm = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    return F.md5(norm).alias("fingerprint")


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (the cheap, exact-dup-robust canonical form)."""
    return docs.select(F.col(id_col), _fingerprint_col(F.col(text_col)))


def _profile_columns(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The pre-round-7 pure-column profile — kept as the differential
    baseline for :func:`profile` (tests pin the Arrow stage to this
    form over awkward inputs)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        *_langid_cols(t),
        *_quality_cols(t),
        *_token_count_cols(t),
        _fingerprint_col(t),
    )


def profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All per-document text analyses — language ID, quality features,
    token counts, fingerprint — in ONE map stage (one scan, zero
    shuffle, no self-joins; at 100 TB this is a single map stage).

    Round 7: the column form ran ~6 interpreted higher-order token
    filters plus 4 full regexp passes per document (HOFs do not
    whole-stage-codegen — 2.7 s at sf1 for 15 MB of text).  The counts
    now come from one Arrow-batched ``mapInPandas`` whose regexes
    mirror the JVM semantics exactly (ASCII ``\\s``, trim = strip of
    U+0020 only, split keeping boundary empties, the U+4E00–U+9FFF CJK
    block, ASCII punctuation/alpha classes, md5 of the normalized
    UTF-8) — every emitted value is an INTEGER count or a string, and
    the ratios, round(…, 6) and the winning-score double all stay JVM
    expressions, so float parity is structural.  Pinned against
    :func:`_profile_columns` over null/empty/whitespace/CJK/mixed-case
    inputs by tests/test_pipelines.py::test_profile_matches_column_form."""
    import hashlib
    import re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ws = re.compile(r"\s+", re.ASCII)
    non_sub = re.compile(r"[^a-z0-9]+", re.ASCII)
    punct_set = frozenset(".,;:!?'\"()[]{}-")
    markers = {
        lang: frozenset(words)
        for lang, words in LANG_MARKERS.items()
        if words
    }
    lang_names = sorted(LANG_MARKERS)  # tie → max lang name wins
    en_markers = markers["en"]
    md5 = hashlib.md5

    id_field = docs.schema[id_col]
    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType, True),
            StructField("pred_lang", StringType(), True),
            StructField("__score", LongType(), True),
            StructField("__chars", IntegerType(), True),
            StructField("__toks", LongType(), True),
            StructField("__punct", LongType(), True),
            StructField("__alpha", LongType(), True),
            StructField("__stop", LongType(), True),
            StructField("__sub", LongType(), True),
            StructField("fingerprint", StringType(), True),
        ]
    )

    def prof_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "pred_lang": [None] * n, "__score": [None] * n,
                "__chars": [None] * n, "__toks": [None] * n,
                "__punct": [None] * n, "__alpha": [None] * n,
                "__stop": [None] * n, "__sub": [None] * n,
                "fingerprint": [None] * n,
            }
            for r, text in enumerate(pdf[text_col].tolist()):
                if not isinstance(text, str):
                    # null text: every score is null — the struct max
                    # falls through to the largest language name
                    out["pred_lang"][r] = lang_names[-1]
                    continue
                lower = text.lower()
                ltoks = ws.split(lower)
                scores = {
                    lang: sum(1 for t in ltoks if t in wset)
                    for lang, wset in markers.items()
                }
                scores["zh"] = sum(
                    1 for ch in text if "一" <= ch <= "鿿"
                )
                best = max((s, l) for l, s in scores.items())
                out["pred_lang"][r] = best[1]
                out["__score"][r] = best[0]
                out["__chars"][r] = len(text)
                trimmed = text.strip(" ")
                out["__toks"][r] = (
                    0 if len(trimmed) == 0 else len(ws.split(trimmed))
                )
                out["__punct"][r] = sum(1 for ch in text if ch in punct_set)
                out["__alpha"][r] = sum(
                    1 for ch in text
                    if "a" <= ch <= "z" or "A" <= ch <= "Z"
                )
                out["__stop"][r] = sum(1 for t in ltoks if t in en_markers)
                out["__sub"][r] = sum(1 for p in non_sub.split(lower) if p)
                norm = ws.sub(" ", text).strip(" ").lower()
                out["fingerprint"][r] = md5(norm.encode("utf-8")).hexdigest()
            data = {id_field.name: pdf[id_col]}
            data["pred_lang"] = pd.Series(out["pred_lang"], dtype=object)
            data["__score"] = pd.array(out["__score"], dtype="Int64")
            data["__chars"] = pd.array(out["__chars"], dtype="Int32")
            for c in ("__toks", "__punct", "__alpha", "__stop", "__sub"):
                data[c] = pd.array(out[c], dtype="Int64")
            data["fingerprint"] = pd.Series(out["fingerprint"], dtype=object)
            yield pd.DataFrame(data)

    raw = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        prof_batches, schema
    )
    toks1 = F.greatest(F.col("__toks"), F.lit(1))
    chars1 = F.greatest(F.col("__chars"), F.lit(1))
    return raw.select(
        F.col(id_field.name),
        F.col("pred_lang"),
        F.round(F.col("__score").cast("double"), 6).alias("lang_score"),
        F.col("__chars").alias("n_chars_m"),
        F.col("__toks").alias("n_tokens"),
        F.round(F.col("__chars") / toks1, 6).alias("mean_tok_len"),
        F.round(F.col("__punct") / chars1, 6).alias("punct_ratio"),
        F.round(F.col("__alpha") / chars1, 6).alias("alpha_ratio"),
        F.round(F.col("__stop").cast("double") / toks1, 6).alias(
            "stopword_ratio"
        ),
        F.col("__sub").alias("subword_pieces"),
        F.col("__toks").alias("ws_tokens"),
        F.col("fingerprint"),
    ).select(  # restore the declared column order
        id_field.name, "pred_lang", "lang_score", "n_chars_m", "n_tokens",
        "mean_tok_len", "punct_ratio", "alpha_ratio", "stopword_ratio",
        "ws_tokens", "subword_pieces", "fingerprint",
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the standard training-data
    prep step (fixed token windows with overlap).  Pure built-in column
    work: ONE whitespace split, a ``sequence``/``transform`` window
    fan-out and a ``posexplode`` — no Python in the hot path, no
    shuffle (narrow per-document computation; at 100 TB this is a map
    stage whose output is repartitioned only by the *writer*).

    Returns (id, chunk_id, chunk_text, chunk_tokens); the final window
    is truncated, short documents yield one chunk."""
    assert 0 <= overlap < chunk_tokens
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(step))) + 1
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * step + 1, chunk_tokens),
    )
    out = docs.select(
        F.col(id_col), F.posexplode(windows).alias("chunk_id", "__w")
    )
    return out.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", F.col("__w")).alias("chunk_text"),
        F.size("__w").cast("long").alias("chunk_tokens"),
    )
