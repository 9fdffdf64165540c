"""SPARQL result-set and triple serializers (sinks).

Reference surface: jena-arq result writers
(sparql/resultset/ResultsWriter + riot/resultset/rw/ResultSetWriterCSV /
-TSV / -JSON / -XML) and the N-Triples stream writer
(riot/out/...).  Formats per SPARQL 1.1 Query Results CSV/TSV, JSON and
XML recommendations.

Scale design: CSV/TSV/N-Triples are **row-wise** formats, produced as a
one-string-column DataFrame (``.write.text`` streams them out of every
executor in parallel; headers written by the caller or via the
``header`` helper).  JSON/XML result sets are single-document formats by
definition, so those builders collect — use them for answer-sized
results, not exports (the reference has the same constraint: one
OutputStream).
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .terms import decode_term, RDF_LANGSTRING, RDFSyntaxError

XSD = "http://www.w3.org/2001/XMLSchema#"


def _term_parts(enc: str) -> Tuple[str, str, Optional[str], Optional[str]]:
    """encoded term → (kind, value, lang, datatype) for JSON/XML writers;
    native Python values from aggregate outputs are typed literals."""
    if enc.startswith("<<("):
        # RDF 1.2 triple term: serialized in its NT form (writers for
        # the full nested JSON "triple" value can build on _term_parts)
        return "literal", enc, None, None
    t = decode_term(enc)
    if t.kind == "iri":
        return "uri", t.lex, None, None
    if t.kind == "bnode":
        return "bnode", t.lex, None, None
    lang = t.lang
    dt = t.datatype if t.datatype not in (None, XSD + "string") else None
    if dt == RDF_LANGSTRING:
        dt = None
    return "literal", t.lex, lang, dt


def _encode_cell(v) -> Optional[str]:
    if v is None:
        return None
    if isinstance(v, bool):
        return f'"{"true" if v else "false"}"^^<{XSD}boolean>'
    if isinstance(v, int):
        return f'"{v}"^^<{XSD}integer>'
    if isinstance(v, float):
        return f'"{v!r}"^^<{XSD}double>'
    s = str(v)
    if s.startswith(("<", "_:", '"')):
        return s
    return json.dumps(s)  # plain string → quoted literal


def results_to_json(df: DataFrame, limit: Optional[int] = None) -> str:
    """SPARQL 1.1 Query Results JSON — collects (single-document format).
    Set ``limit`` as a safety valve for accidentally huge results."""
    rows = df.limit(limit).collect() if limit else df.collect()
    out = {"head": {"vars": list(df.columns)}, "results": {"bindings": []}}
    for r in rows:
        b = {}
        for k, v in r.asDict().items():
            enc = _encode_cell(v)
            if enc is None:
                continue
            kind, val, lang, dt = _term_parts(enc)
            cell = {"type": kind, "value": val}
            if lang:
                if "--" in lang:
                    lang, _, d = lang.partition("--")
                    cell["its:dir"] = d
                cell["xml:lang"] = lang
            if dt:
                cell["datatype"] = dt
            b[k] = cell
        out["results"]["bindings"].append(b)
    return json.dumps(out, ensure_ascii=False)


def results_to_xml(df: DataFrame, limit: Optional[int] = None) -> str:
    """SPARQL Query Results XML — collects (single-document format)."""
    from xml.sax.saxutils import escape, quoteattr

    rows = df.limit(limit).collect() if limit else df.collect()
    parts = [
        '<?xml version="1.0"?>',
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
        "<head>",
    ]
    for c in df.columns:
        parts.append(f"<variable name={quoteattr(c)}/>")
    parts.append("</head><results>")
    for r in rows:
        parts.append("<result>")
        for k, v in r.asDict().items():
            enc = _encode_cell(v)
            if enc is None:
                continue
            kind, val, lang, dt = _term_parts(enc)
            if kind == "uri":
                body = f"<uri>{escape(val)}</uri>"
            elif kind == "bnode":
                body = f"<bnode>{escape(val)}</bnode>"
            elif lang:
                body = f'<literal xml:lang={quoteattr(lang)}>{escape(val)}</literal>'
            elif dt:
                body = f"<literal datatype={quoteattr(dt)}>{escape(val)}</literal>"
            else:
                body = f"<literal>{escape(val)}</literal>"
            parts.append(f"<binding name={quoteattr(k)}>{body}</binding>")
        parts.append("</result>")
    parts.append("</results></sparql>")
    return "".join(parts)


def _csv_plain(col: F.Column) -> F.Column:
    """CSV cell: the plain value (lexical form / IRI string / _:label)."""
    c = col.cast("string")
    lex = (
        F.when(c.startswith("<"), F.regexp_extract(c, r"^<(.*)>$", 1))
        .when(
            c.startswith('"'),
            F.regexp_extract(c, r'^"((?s:.*))"(?:@[^"]*|\^\^<[^>]*>)?$', 1),
        )
        .otherwise(c)
    )
    needs_quote = (
        lex.contains(",") | lex.contains('"') | lex.contains("\n")
        | lex.contains("\r")
    )
    return F.when(
        needs_quote,
        F.concat(F.lit('"'), F.regexp_replace(lex, '"', '""'), F.lit('"')),
    ).otherwise(lex)


def results_to_csv(df: DataFrame) -> DataFrame:
    """SPARQL 1.1 Results CSV as a one-string-column DataFrame of data
    rows (header = ','.join(df.columns); write with ``.write.text``).
    Fully distributed — no collect."""
    cells = [F.coalesce(_csv_plain(F.col(c)), F.lit("")) for c in df.columns]
    return df.select(F.concat_ws(",", *cells).alias("value"))


def results_to_tsv(df: DataFrame) -> DataFrame:
    """SPARQL 1.1 Results TSV: cells are encoded terms (Turtle-ish) —
    exactly our canonical encoding.  Distributed, no collect."""
    def cell(c):
        col = F.col(c)
        s = col.cast("string")
        enc = (
            F.when(s.rlike(r"^[<_\"].*"), s)
            .otherwise(F.concat(F.lit('"'), s, F.lit('"')))
        )
        return F.coalesce(enc, F.lit(""))

    return df.select(F.concat_ws("\t", *[cell(c) for c in df.columns]).alias("value"))


def triples_to_ntriples(triples: DataFrame) -> DataFrame:
    """Canonical N-Triples lines (one-string-column DataFrame) — columns
    subj/pred/obj are already canonical encodings, so the writer is a
    concat (the reference's StreamRDFWriter fast path)."""
    return triples.select(
        F.concat_ws(" ", "subj", "pred", "obj").alias("value")
    ).select(F.concat(F.col("value"), F.lit(" .")).alias("value"))


def quads_to_nquads(quads: DataFrame) -> DataFrame:
    g = F.when(F.col("graph").isNotNull(), F.concat(F.lit(" "), F.col("graph"))).otherwise(F.lit(""))
    return quads.select(
        F.concat(
            F.concat_ws(" ", "subj", "pred", "obj"), g, F.lit(" .")
        ).alias("value")
    )
