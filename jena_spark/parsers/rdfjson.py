"""RDF/JSON (legacy "RDF in JSON" resource-centric format) and TriX.

Reference: riot/lang/LangRDFJSON.java (RDF/JSON) and
riot/lang/ReaderTriX.java (TriX) — both low-priority legacy formats,
implemented here with the same per-document UDF pattern so the engine's
format matrix matches the reference registry (riot/RDFLanguages.java).

RDF/JSON shape::

    { "http://s": { "http://p": [ {"type": "uri|literal|bnode",
        "value": "...", "lang": "...", "datatype": "..."} ] } }

TriX shape::

    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph><uri>g</uri>
        <triple><uri>s</uri><uri>p</uri>
          <plainLiteral xml:lang="en">text</plainLiteral></triple>
      </graph>
    </TriX>
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import List, Optional, Tuple

from ..skolem import BNodeAllocator
from ..terms import RDFSyntaxError, mk_bnode, mk_iri, mk_literal

Quad = Tuple[Optional[str], str, str, str]
Triple = Tuple[str, str, str]


def _rdfjson_term(obj: dict, alloc: BNodeAllocator):
    t = obj.get("type")
    v = obj.get("value")
    if not isinstance(v, str):
        raise RDFSyntaxError("RDF/JSON object missing string 'value'")
    if t == "uri":
        return mk_iri(v)
    if t == "bnode":
        return mk_bnode(alloc.get(v[2:] if v.startswith("_:") else v))
    if t == "literal":
        lang = obj.get("lang")
        dt = obj.get("datatype")
        if lang:
            return mk_literal(v, lang=lang)
        return mk_literal(v, datatype=dt)
    raise RDFSyntaxError(f"RDF/JSON bad term type {t!r}")


def parse_rdfjson(text: str, base: Optional[str], alloc: BNodeAllocator) -> List[Triple]:
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise RDFSyntaxError(f"bad JSON: {e}") from None
    if not isinstance(doc, dict):
        raise RDFSyntaxError("RDF/JSON root must be an object")
    out: List[Triple] = []
    for s, preds in doc.items():
        if s.startswith("_:"):
            subj = mk_bnode(alloc.get(s[2:]))
        else:
            subj = mk_iri(s)
        if not isinstance(preds, dict):
            raise RDFSyntaxError("RDF/JSON subject value must be an object")
        for p, objs in preds.items():
            pred = mk_iri(p)
            if not isinstance(objs, list):
                raise RDFSyntaxError("RDF/JSON objects must be an array")
            for ob in objs:
                out.append((subj.nt(), pred.nt(), _rdfjson_term(ob, alloc).nt()))
    return out


TRIX_NS = "{http://www.w3.org/2004/03/trix/trix-1/}"
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def _trix_term(el, alloc: BNodeAllocator):
    tag = el.tag.removeprefix(TRIX_NS)
    text = el.text or ""
    if tag == "uri":
        return mk_iri(text)
    if tag == "id":
        return mk_bnode(alloc.get(text))
    if tag == "plainLiteral":
        return mk_literal(text, lang=el.get(XML_LANG))
    if tag == "typedLiteral":
        dt = el.get("datatype")
        if dt is None:
            raise RDFSyntaxError("typedLiteral without datatype")
        return mk_literal(text, datatype=dt)
    raise RDFSyntaxError(f"TriX: bad term element {tag!r}")


def parse_trix(text: str, base: Optional[str], alloc: BNodeAllocator) -> List[Quad]:
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RDFSyntaxError(f"TriX XML error: {e}") from None
    if root.tag != TRIX_NS + "TriX":
        raise RDFSyntaxError("root element must be trix:TriX")
    out: List[Quad] = []
    for graph in root:
        if graph.tag != TRIX_NS + "graph":
            raise RDFSyntaxError("TriX: expected <graph>")
        children = list(graph)
        gname: Optional[str] = None
        start = 0
        if children and children[0].tag == TRIX_NS + "uri":
            gname = mk_iri(children[0].text or "").nt()
            start = 1
        for triple in children[start:]:
            if triple.tag != TRIX_NS + "triple":
                raise RDFSyntaxError("TriX: expected <triple>")
            terms = [_trix_term(t, alloc) for t in triple]
            if len(terms) != 3:
                raise RDFSyntaxError("TriX: triple must have 3 terms")
            s, p, o = terms
            if s.kind == "literal":
                raise RDFSyntaxError("TriX: literal subject")
            if p.kind != "iri":
                raise RDFSyntaxError("TriX: predicate must be IRI")
            out.append((gname, s.nt(), p.nt(), o.nt()))
    return out
