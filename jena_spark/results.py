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
import re
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .terms import decode_term, unescape_string, RDF_LANGSTRING, RDFSyntaxError

XSD = "http://www.w3.org/2001/XMLSchema#"

# RDF 1.2 triple-term component split: inner subject/predicate are
# IRIs/bnodes (space-free), so the first two space splits are exact even
# with a nested object (same decomposition as ops/sparql TermDecomp).
_TT_RE = re.compile(r"^<<\((\S+) (\S+) ((?s:.*))\)>>$")


def _term_parts(enc: str) -> Tuple[str, str, Optional[str], Optional[str]]:
    """encoded term → (kind, value, lang, datatype) for JSON/XML writers;
    native Python values from aggregate outputs are typed literals.
    RDF 1.2 triple terms return kind ``"triple"`` with the raw encoding
    as value — callers recurse via ``_TT_RE`` (SPARQL 1.2 results)."""
    if enc.startswith("<<("):
        return "triple", enc, None, None
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


def _json_term(enc: str) -> dict:
    """Encoded term → SPARQL 1.1/1.2 JSON results term object (recursive
    for RDF 1.2 triple terms: {"type":"triple","value":{subject,…}})."""
    kind, val, lang, dt = _term_parts(enc)
    if kind == "triple":
        m = _TT_RE.match(val)
        if not m:
            raise RDFSyntaxError(f"malformed triple term: {val[:80]}")
        return {
            "type": "triple",
            "value": {
                "subject": _json_term(m.group(1)),
                "predicate": _json_term(m.group(2)),
                "object": _json_term(m.group(3)),
            },
        }
    cell = {"type": kind, "value": val}
    if lang:
        if "--" in lang:
            lang, _, d = lang.partition("--")
            cell["its:dir"] = d
        cell["xml:lang"] = lang
    if dt:
        cell["datatype"] = dt
    return cell


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
            b[k] = _json_term(enc)
        out["results"]["bindings"].append(b)
    return json.dumps(out, ensure_ascii=False)


def boolean_to_json(value: bool) -> str:
    """SPARQL 1.1 Query Results JSON for an ASK result."""
    return json.dumps({"head": {}, "boolean": bool(value)})


def boolean_to_xml(value: bool) -> str:
    """SPARQL Query Results XML for an ASK result."""
    return (
        '<?xml version="1.0"?>'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        "<head></head>"
        f"<boolean>{'true' if value else 'false'}</boolean></sparql>"
    )


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
    def term_xml(enc: str) -> str:
        kind, val, lang, dt = _term_parts(enc)
        if kind == "triple":
            m = _TT_RE.match(val)
            if not m:
                raise RDFSyntaxError(f"malformed triple term: {val[:80]}")
            return (
                "<triple>"
                f"<subject>{term_xml(m.group(1))}</subject>"
                f"<predicate>{term_xml(m.group(2))}</predicate>"
                f"<object>{term_xml(m.group(3))}</object>"
                "</triple>"
            )
        if kind == "uri":
            return f"<uri>{escape(val)}</uri>"
        if kind == "bnode":
            return f"<bnode>{escape(val)}</bnode>"
        if lang:
            return f"<literal xml:lang={quoteattr(lang)}>{escape(val)}</literal>"
        if dt:
            return f"<literal datatype={quoteattr(dt)}>{escape(val)}</literal>"
        return f"<literal>{escape(val)}</literal>"

    for r in rows:
        parts.append("<result>")
        for k, v in r.asDict().items():
            enc = _encode_cell(v)
            if enc is None:
                continue
            parts.append(f"<binding name={quoteattr(k)}>{term_xml(enc)}</binding>")
        parts.append("</result>")
    parts.append("</results></sparql>")
    return "".join(parts)


def _unescape_col(lex: F.Column) -> F.Column:
    """Decode NT/Turtle escape sequences (\\n \\" \\\\ \\uXXXX …) in a
    lexical-form column.  The hot path stays JVM-side: only cells that
    actually contain a backslash cross the Arrow boundary (Pandas UDF
    mirroring terms.unescape_string); everything else passes through."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _un(s):
        def one(v):
            if v is None or "\\" not in v:
                return v
            try:
                return unescape_string(v)
            except RDFSyntaxError:
                return v  # not an escape-bearing RDF lexical: verbatim
        return s.map(one)

    return F.when(~lex.contains("\\"), lex).otherwise(_un(lex))


def _csv_plain(col: F.Column) -> F.Column:
    """CSV cell: the plain value (lexical form / IRI string / _:label).
    Escape sequences in the encoded lexical form are decoded to raw
    characters (SPARQL 1.1 CSV carries raw strings) and the RFC 4180
    quoting decision is made on the decoded text."""
    c = col.cast("string")
    lex = (
        F.when(c.startswith("<"), F.regexp_extract(c, r"^<(.*)>$", 1))
        .when(
            c.startswith('"'),
            _unescape_col(
                F.regexp_extract(c, r'^"((?s:.*))"(?:@[^"]*|\^\^<[^>]*>)?$', 1)
            ),
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


def results_to_thrift(df: DataFrame, limit: Optional[int] = None,
                      encode_values: bool = False) -> bytes:
    """Binary SPARQL results (thrift RDF_VarTuple + RDF_DataTuple rows,
    riot/thrift/Binding2Thrift.java) — collects, like the JSON/XML
    single-document writers; unbound cells travel as RDF_UNDEF."""
    from .parsers.binrdf import write_result_tuples_thrift

    rows = df.limit(limit).collect() if limit else df.collect()
    cols = list(df.columns)
    return write_result_tuples_thrift(
        cols, ([_encode_cell(v) for v in r] for r in rows), encode_values
    )


def results_to_protobuf(df: DataFrame, limit: Optional[int] = None,
                        encode_values: bool = False) -> bytes:
    """Binary SPARQL results, protobuf framing
    (riot/protobuf/Binding2Protobuf.java delimited messages)."""
    from .parsers.binrdf import write_result_tuples_protobuf

    rows = df.limit(limit).collect() if limit else df.collect()
    cols = list(df.columns)
    return write_result_tuples_protobuf(
        cols, ([_encode_cell(v) for v in r] for r in rows), encode_values
    )
