"""Distributed Turtle / TriG writers (RIOT writer parity, Spark-first).

Re-expresses the reference's block writers
(riot/writer/TurtleWriterBase.java, TurtleShell.java — subject grouping
with ``;``/``,`` lists, prefix compaction, numeric/boolean
abbreviation; TriG adds GRAPH blocks) as a distributed sink: rows are
hash-partitioned by subject (by graph+subject for TriG) and sorted
within partitions, each partition emits a SELF-CONTAINED Turtle/TriG
document chunk (its own ``@prefix`` header — re-declaration is legal
Turtle, so the concatenation of part files is one valid document).  No
driver-side collection at any size.

Terms arrive in the engine's canonical N-Triples encoding, which is
already valid Turtle; the writer only *compacts*: prefixed names where
the local part is PN_LOCAL-safe, bare numeric/boolean literals where
the lexical form matches the token grammar, and ``a`` for rdf:type.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
XSD = "http://www.w3.org/2001/XMLSchema#"

# conservative PN_LOCAL subset: no escapes needed, no leading/trailing
# dot trouble (the reference's PN_LOCAL is wider via %-escapes; anything
# outside this subset just stays a full IRI — always legal)
_PN_LOCAL_SAFE = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_\-]*$")
_INT_LEX = re.compile(r"^[+-]?\d+$")
_DEC_LEX = re.compile(r"^[+-]?\d*\.\d+$")
_DBL_LEX = re.compile(
    r"^[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+)$"
)

DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": XSD,
}


def _term_writer(prefixes: Dict[str, str]):
    """→ term-formatting closure; prefixes maps prefix → namespace."""
    ns_sorted = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def fmt(t: str, is_pred: bool = False) -> str:
        if is_pred and t == RDF_TYPE:
            return "a"
        if t.startswith("<"):
            iri = t[1:-1]
            for pfx, ns in ns_sorted:
                if iri.startswith(ns):
                    local = iri[len(ns):]
                    if _PN_LOCAL_SAFE.match(local) or local == "":
                        return f"{pfx}:{local}"
            return t
        if t.startswith('"'):
            # literal: abbreviate the numeric/boolean datatypes when the
            # lexical form is a valid bare token (TurtleShell numeric
            # abbreviation rules); otherwise the canonical encoding is
            # already valid Turtle
            m = re.match(r'^"((?:[^"\\]|\\.)*)"\^\^<([^>]*)>$', t)
            if m:
                lex, dt = m.group(1), m.group(2)
                if dt == XSD + "integer" and _INT_LEX.match(lex):
                    return lex
                if dt == XSD + "decimal" and _DEC_LEX.match(lex):
                    return lex
                if dt == XSD + "double" and _DBL_LEX.match(lex):
                    return lex
                if dt == XSD + "boolean" and lex in ("true", "false"):
                    return lex
                # compact the datatype IRI too
                return f'"{lex}"^^{fmt("<" + dt + ">")}'
        return t  # bnode / lang literal / plain / triple term

    return fmt


def _header(prefixes: Dict[str, str]) -> str:
    return "".join(
        f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(prefixes.items())
    )


def _subject_block(fmt, subj: str, pos: list) -> str:
    """One subject's predicateObjectList with ';' / ',' grouping."""
    parts = []
    by_pred: dict = {}
    order = []
    for p, o in pos:
        if p not in by_pred:
            by_pred[p] = []
            order.append(p)
        by_pred[p].append(o)
    for p in order:
        objs = ", ".join(fmt(o) for o in by_pred[p])
        parts.append(f"{fmt(p, is_pred=True)} {objs}")
    body = " ;\n        ".join(parts)
    return f"{fmt(subj)} {body} .\n"


def turtle_lines(
    triples: DataFrame, prefixes: Optional[Dict[str, str]] = None
) -> DataFrame:
    """Triples DF → one-column DF of Turtle text blocks (one per
    partition header + one per subject), ready for ``.write.text``."""
    pfx = dict(DEFAULT_PREFIXES)
    if prefixes:
        pfx.update(prefixes)
    arranged = (
        triples.select("subj", "pred", "obj")
        .repartition(F.col("subj"))
        .sortWithinPartitions("subj", "pred", "obj")
    )

    def emit(rows) -> Iterator:
        fmt = _term_writer(pfx)
        first = True
        cur = None
        pos: list = []
        for r in rows:
            if first:
                yield (_header(pfx),)
                first = False
            if r.subj != cur:
                if cur is not None:
                    yield (_subject_block(fmt, cur, pos),)
                cur = r.subj
                pos = []
            pos.append((r.pred, r.obj))
        if cur is not None:
            yield (_subject_block(fmt, cur, pos),)

    return triples.sparkSession.createDataFrame(
        arranged.rdd.mapPartitions(emit), "value string"
    )


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> None:
    turtle_lines(triples, prefixes).write.mode("overwrite").text(path)


def trig_lines(
    quads: DataFrame, prefixes: Optional[Dict[str, str]] = None
) -> DataFrame:
    """Quads DF → TriG text blocks: default-graph triples bare, named
    graphs as ``<g> { … }`` blocks.  Partitioned by (graph, subject) so
    a graph's block may span part files — legal TriG: a graph name may
    introduce blocks repeatedly and the union is the graph."""
    pfx = dict(DEFAULT_PREFIXES)
    if prefixes:
        pfx.update(prefixes)
    arranged = (
        quads.select("graph", "subj", "pred", "obj")
        .repartition(F.col("graph"), F.col("subj"))
        .sortWithinPartitions(
            F.col("graph").asc_nulls_first(), "subj", "pred", "obj"
        )
    )

    def emit(rows) -> Iterator:
        fmt = _term_writer(pfx)
        first = True
        cur = None  # (graph, subj)
        pos: list = []

        def flush():
            g, s = cur
            block = _subject_block(fmt, s, pos)
            if g is None:
                return block
            indented = "    " + block.rstrip("\n").replace("\n", "\n    ")
            return f"{fmt(g)} {{\n{indented}\n}}\n"

        for r in rows:
            if first:
                yield (_header(pfx),)
                first = False
            key = (r.graph, r.subj)
            if key != cur:
                if cur is not None:
                    yield (flush(),)
                cur = key
                pos = []
            pos.append((r.pred, r.obj))
        if cur is not None:
            yield (flush(),)

    return quads.sparkSession.createDataFrame(
        arranged.rdd.mapPartitions(emit), "value string"
    )


def write_trig(
    quads: DataFrame,
    path: str,
    prefixes: Optional[Dict[str, str]] = None,
) -> None:
    trig_lines(quads, prefixes).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# JSON-LD (flattened form) — riot/writer/JsonLDWriter.java's flattened
# output shape: one node object per subject with full IRIs (no context
# compaction — the expanded/flattened form round-trips without a
# context document, which is the right shape for a distributed sink)
# ---------------------------------------------------------------------------

_XSD_STRING = XSD + "string"


def _jsonld_value(o: str):
    """Encoded object term → JSON-LD value object / node reference."""
    if o.startswith("<"):
        return {"@id": o[1:-1]}
    if o.startswith("_:"):
        return {"@id": o}
    # literal
    from .terms import decode_term

    t = decode_term(o)
    if t.lang is not None:
        return {"@value": t.lex, "@language": t.lang}
    if t.datatype is None or t.datatype == _XSD_STRING:
        return {"@value": t.lex}
    return {"@value": t.lex, "@type": t.datatype}


def jsonld_lines(triples: DataFrame) -> DataFrame:
    """Triples DF → one-column DF where each row is ONE flattened
    JSON-LD node object (NDJSON style).  The concatenation wrapped in a
    ``@graph`` array — or any subset of lines — parses back to the
    corresponding triples; each line alone is a valid JSON-LD document.
    Same distribution shape as the Turtle writer: partition by subject,
    no driver collection."""
    import json

    arranged = (
        triples.select("subj", "pred", "obj")
        .repartition(F.col("subj"))
        .sortWithinPartitions("subj", "pred", "obj")
    )

    def emit(rows) -> Iterator:
        cur = None
        node: dict = {}

        def flush():
            return (json.dumps(node, ensure_ascii=False, sort_keys=True),)

        for r in rows:
            if r.subj != cur:
                if cur is not None:
                    yield flush()
                cur = r.subj
                node = {"@id": cur[1:-1] if cur.startswith("<") else cur}
            if r.pred == RDF_TYPE and r.obj.startswith("<"):
                node.setdefault("@type", []).append(r.obj[1:-1])
            else:
                p = r.pred[1:-1]
                node.setdefault(p, []).append(_jsonld_value(r.obj))
        if cur is not None:
            yield flush()

    return triples.sparkSession.createDataFrame(
        arranged.rdd.mapPartitions(emit), "value string"
    )


def write_jsonld(triples: DataFrame, path: str) -> None:
    jsonld_lines(triples).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# RDF/XML — the reference's plain writer
# (jena-core rdfxml/xmloutput/impl/RDFXML_Basic.java: rdf:Description
# blocks with property elements; BaseXMLWriter.java:585 splits property
# IRIs at the longest NCName suffix and refuses unsplittable predicates).
# Distributed shape: XML has ONE root element, so unlike Turtle the part
# files cannot concatenate into a single document — instead EVERY
# PARTITION emits a complete, self-contained <rdf:RDF> document and the
# graph is the union of the part files (the same union-of-files contract
# as the NDJSON JSON-LD sink above).
# ---------------------------------------------------------------------------

_NCNAME_SUFFIX = re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*$")


# XML 1.0 cannot represent most control characters AT ALL (not even as
# character references): only #x9 #xA #xD below #x20, and #xFFFE/#xFFFF
# are excluded.  A literal containing one is unserializable as RDF/XML —
# raise, like the unsplittable-predicate rule (Jena's writer emits the
# raw byte and produces non-well-formed output; failing loudly is the
# honest distributed-sink contract).
_XML_ILLEGAL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f￾￿]")


def _xml_esc(s: str) -> str:
    if _XML_ILLEGAL.search(s):
        raise ValueError(
            "cannot serialize control character in RDF/XML (XML 1.0 has no "
            f"representation): {s!r}"
        )
    # \r must go out as a character reference: expat (and every XML
    # parser) performs end-of-line normalization on literal CR
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\r", "&#xD;")
    )


def _xml_attr_esc(s: str) -> str:
    return _xml_esc(s).replace('"', "&quot;")


def _split_pred(iri: str):
    """Predicate IRI → (namespace, NCName local) at the longest valid
    NCName suffix; raises like BaseXMLWriter when no split exists."""
    m = _NCNAME_SUFFIX.search(iri)
    if not m or m.start() == 0:
        raise ValueError(
            f"cannot serialize predicate as RDF/XML (no NCName split): {iri}"
        )
    return iri[: m.start()], iri[m.start():]


def rdfxml_lines(
    triples: DataFrame, prefixes: Optional[Dict[str, str]] = None
) -> DataFrame:
    """Triples DF → one-column DF of RDF/XML text fragments.  Each
    partition yields a full document: XML declaration + <rdf:RDF> root
    (declaring the known prefixes), one <rdf:Description> per subject,
    closing tag.  Property namespaces outside the prefix map are
    declared inline on the property element (always legal, no
    partition-wide namespace scan needed)."""
    pfx = dict(DEFAULT_PREFIXES)
    if prefixes:
        pfx.update(prefixes)
    ns_to_pfx = {ns: p for p, ns in pfx.items()}

    arranged = (
        triples.select("subj", "pred", "obj")
        .repartition(F.col("subj"))
        .sortWithinPartitions("subj", "pred", "obj")
    )

    def prop_elem(pred: str, obj: str) -> str:
        from .terms import decode_term

        ns, local = _split_pred(pred[1:-1])
        known = ns_to_pfx.get(ns)
        if known is not None:
            tag, nsdecl = f"{known}:{local}", ""
        else:
            tag, nsdecl = f"n:{local}", f' xmlns:n="{_xml_attr_esc(ns)}"'
        if obj.startswith("<"):
            return f'    <{tag}{nsdecl} rdf:resource="{_xml_attr_esc(obj[1:-1])}"/>\n'
        if obj.startswith("_:"):
            return f'    <{tag}{nsdecl} rdf:nodeID="{obj[2:]}"/>\n'
        if obj.startswith("<<("):
            raise ValueError("RDF/XML cannot serialize triple terms (RDF 1.2)")
        t = decode_term(obj)
        attrs = nsdecl
        if t.lang is not None:
            if "--" in t.lang:
                # RDF 1.2 base-direction literal: RDF/XML has no syntax
                # for it, and emitting the raw tag would round-trip to a
                # DIFFERENT literal (plain langString with a bogus BCP47
                # tag) — refuse like triple terms above
                raise ValueError(
                    "RDF/XML cannot serialize directional language "
                    f"literals (RDF 1.2): @{t.lang}"
                )
            attrs += f' xml:lang="{t.lang}"'
        elif t.datatype is not None and t.datatype != _XSD_STRING:
            attrs += f' rdf:datatype="{_xml_attr_esc(t.datatype)}"'
        return f"    <{tag}{attrs}>{_xml_esc(t.lex)}</{tag}>\n"

    def emit(rows) -> Iterator:
        header = '<?xml version="1.0" encoding="utf-8"?>\n<rdf:RDF' + "".join(
            f'\n    xmlns:{p}="{_xml_attr_esc(ns)}"'
            for p, ns in sorted(pfx.items())
        ) + ">\n"
        opened = False
        cur = None
        buf: list = []

        def flush() -> str:
            buf.append("  </rdf:Description>\n")
            return "".join(buf)

        for r in rows:
            if not opened:
                yield (header,)
                opened = True
            if r.subj != cur:
                if cur is not None:
                    yield (flush(),)
                cur = r.subj
                if cur.startswith("_:"):
                    about = f'rdf:nodeID="{cur[2:]}"'
                else:
                    about = f'rdf:about="{_xml_attr_esc(cur[1:-1])}"'
                buf = [f"  <rdf:Description {about}>\n"]
            buf.append(prop_elem(r.pred, r.obj))
        if cur is not None:
            yield (flush(),)
        if opened:
            yield ("</rdf:RDF>\n",)

    return triples.sparkSession.createDataFrame(
        arranged.rdd.mapPartitions(emit), "value string"
    )


def write_rdfxml(
    triples: DataFrame, path: str, prefixes: Optional[Dict[str, str]] = None
) -> None:
    rdfxml_lines(triples, prefixes).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# Binary RDF sinks (RDF-Thrift / RDF-Protobuf)
# ---------------------------------------------------------------------------

def binary_chunks(
    quads: DataFrame,
    fmt: str = "thrift",
    encode_values: bool = False,
    prefixes: Optional[Dict[str, str]] = None,
    rows_per_chunk: int = 10_000,
) -> DataFrame:
    """Distributed binary RDF encode → DataFrame of ``value: binary``
    chunks.  Both wire formats are self-delimiting row streams
    (riot/thrift/IteratorThriftRDF.java; ProtobufRDF.java:129), so the
    byte-concatenation of the chunks in any order is ONE valid stream —
    the binary analog of the partition-local Turtle documents above.
    Each chunk re-declares the prefix map (like the per-partition
    ``@prefix`` headers), so chunks stay independently decodable.

    Input: quads (graph/subj/pred/obj) or triples (subj/pred/obj).
    The encode — the CPU-heavy part — runs fully distributed; chunks cap
    memory at ``rows_per_chunk`` quads per emitted row.
    """
    from .parsers.binrdf import write_rdf_protobuf, write_rdf_thrift

    write = {"thrift": write_rdf_thrift, "protobuf": write_rdf_protobuf}[fmt]
    has_graph = "graph" in quads.columns
    cols = (["graph"] if has_graph else []) + ["subj", "pred", "obj"]
    arranged = quads.select(*cols)

    def emit(rows) -> Iterator[tuple]:
        batch = []
        for r in rows:
            if has_graph:
                batch.append((r[0], r[1], r[2], r[3]))
            else:
                batch.append((None, r[0], r[1], r[2]))
            if len(batch) >= rows_per_chunk:
                yield (bytearray(write(batch, encode_values, prefixes)),)
                batch = []
        if batch:
            yield (bytearray(write(batch, encode_values, prefixes)),)

    return quads.sparkSession.createDataFrame(
        arranged.rdd.mapPartitions(emit), "value binary"
    )


def write_binary_rdf(
    quads: DataFrame,
    path: str,
    fmt: str = "thrift",
    encode_values: bool = False,
    prefixes: Optional[Dict[str, str]] = None,
) -> None:
    """Assemble the distributed chunks into one ``.trdf`` / ``.rpb``
    file.  Chunks stream through the driver one at a time
    (``toLocalIterator`` — bounded memory); on a cluster deployment the
    same chunks DataFrame can instead be persisted to any distributed
    store and concatenated by the consumer."""
    chunks = binary_chunks(quads, fmt, encode_values, prefixes)
    with open(path, "wb") as out:
        for row in chunks.toLocalIterator():
            out.write(row[0])
