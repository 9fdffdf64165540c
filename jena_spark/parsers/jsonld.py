"""JSON-LD → triples, expanded-form subset.

The reference delegates JSON-LD 1.1 to the Titanium library
(riot/lang/LangJSONLD11.java:30-32,117-123 — `JsonLd.toRdf`); a
dependency-free Python re-implementation of the full 1.1 algorithm is out
of scope, so per SURVEY.md §2.1 we support the *expanded-form subset*
plus a minimal inline ``@context`` of simple term→IRI mappings:

- node objects with ``@id`` / ``@type`` / property → value arrays;
- value objects ``{"@value", "@language", "@type"}``;
- ``{"@id": ...}`` references, nested node objects (fresh bnodes when no
  ``@id``), ``@graph`` arrays, ``_:`` blank-node ids;
- ``@context``: string-valued term definitions and ``@vocab``.

Anything outside the subset raises RDFSyntaxError (document yields zero
triples) rather than mis-parsing.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

from ..skolem import BNodeAllocator
from ..terms import (
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    RDFSyntaxError,
    Term,
    mk_bnode,
    mk_iri,
    mk_literal,
)

Quad = Tuple[Optional[str], str, str, str]

_KEYWORDS = {"@id", "@type", "@value", "@language", "@graph", "@context", "@list"}


class _JsonLdParser:
    def __init__(self, alloc: BNodeAllocator):
        self.alloc = alloc
        self.out: List[Quad] = []
        self.vocab: Optional[str] = None
        self.terms: Dict[str, str] = {}

    def _ctx(self, ctx: Any) -> None:
        if ctx is None:
            return
        if not isinstance(ctx, dict):
            raise RDFSyntaxError("unsupported @context form (subset parser)")
        for k, v in ctx.items():
            if k == "@vocab":
                if not isinstance(v, str):
                    raise RDFSyntaxError("@vocab must be a string")
                self.vocab = v
            elif isinstance(v, str):
                self.terms[k] = v
            else:
                raise RDFSyntaxError(f"unsupported @context entry for {k!r}")

    def _expand_iri(self, s: str, vocab_ok: bool = False) -> str:
        if s.startswith("_:"):
            return s
        if s in self.terms:
            return self.terms[s]
        if ":" in s:
            pfx, rest = s.split(":", 1)
            if pfx in self.terms and not rest.startswith("//"):
                return self.terms[pfx] + rest
            return s
        if vocab_ok and self.vocab:
            return self.vocab + s
        raise RDFSyntaxError(f"cannot expand {s!r} (no @vocab / not an IRI)")

    def _subject(self, node: dict) -> Term:
        sid = node.get("@id")
        if sid is None:
            return mk_bnode(self.alloc.fresh())
        if not isinstance(sid, str):
            raise RDFSyntaxError("@id must be a string")
        if sid.startswith("_:"):
            return mk_bnode(self.alloc.get(sid[2:]))
        return mk_iri(self._expand_iri(sid))

    def _value_term(self, v: Any) -> Term:
        if isinstance(v, dict):
            if "@value" in v:
                val = v["@value"]
                lang = v.get("@language")
                dt = v.get("@type")
                # a @type on a native value is a term/compact IRI too —
                # expand it exactly like the string-value branch does
                xdt = self._expand_iri(dt) if dt is not None else None
                if isinstance(val, bool):
                    return mk_literal("true" if val else "false", datatype=xdt or XSD_BOOLEAN)
                if isinstance(val, int):
                    return mk_literal(str(val), datatype=xdt or XSD_INTEGER)
                if isinstance(val, float):
                    return mk_literal(_canonical_double(val), datatype=xdt or XSD_DOUBLE)
                if not isinstance(val, str):
                    raise RDFSyntaxError("unsupported @value type")
                if lang is not None:
                    return mk_literal(val, lang=lang)
                if dt is not None:
                    return mk_literal(val, datatype=xdt)
                return mk_literal(val)
            if "@list" in v:
                raise RDFSyntaxError("@list not supported (subset parser)")
            # node object (reference or nested)
            term = self._subject(v)
            self._node(v, term)
            return term
        if isinstance(v, bool):
            return mk_literal("true" if v else "false", datatype=XSD_BOOLEAN)
        if isinstance(v, int):
            return mk_literal(str(v), datatype=XSD_INTEGER)
        if isinstance(v, float):
            return mk_literal(_canonical_double(v), datatype=XSD_DOUBLE)
        if isinstance(v, str):
            return mk_literal(v)
        raise RDFSyntaxError(f"unsupported value {type(v).__name__}")

    def _node(self, node: dict, subj: Optional[Term] = None, graph: Optional[str] = None) -> None:
        if "@context" in node:
            self._ctx(node["@context"])
        if subj is None:
            subj = self._subject(node)
        types = node.get("@type", [])
        if isinstance(types, str):
            types = [types]
        for t in types:
            self.out.append(
                (graph, subj.nt(), mk_iri(RDF_TYPE).nt(), mk_iri(self._expand_iri(t, True)).nt())
            )
        for k, v in node.items():
            if k in _KEYWORDS or k == "@context":
                continue
            pred = mk_iri(self._expand_iri(k, vocab_ok=True))
            vals = v if isinstance(v, list) else [v]
            for item in vals:
                obj = self._value_term(item)
                self.out.append((graph, subj.nt(), pred.nt(), obj.nt()))
        if "@graph" in node:
            gname = subj.nt() if ("@id" in node or graph is None) else graph
            inner = node["@graph"]
            if not isinstance(inner, list):
                inner = [inner]
            g = subj.nt() if "@id" in node else None
            for n in inner:
                if not isinstance(n, dict):
                    raise RDFSyntaxError("@graph entries must be node objects")
                self._node(n, graph=g)

    def parse(self, text: str) -> List[Quad]:
        try:
            doc = json.loads(text)
        except json.JSONDecodeError as e:
            raise RDFSyntaxError(f"bad JSON: {e}") from None
        nodes = doc if isinstance(doc, list) else [doc]
        for n in nodes:
            if not isinstance(n, dict):
                raise RDFSyntaxError("top-level entries must be node objects")
            self._node(n)
        return self.out


def _canonical_double(v: float) -> str:
    # xsd:double canonical-ish lexical form, e.g. 1.5E0
    s = repr(v)
    if "e" in s or "E" in s:
        mant, exp = s.lower().split("e")
        if "." not in mant:
            mant += ".0"
        return f"{mant}E{int(exp)}"
    if "." not in s:
        s += ".0"
    return f"{s}E0"


def parse_jsonld(text: str, base: Optional[str], alloc: BNodeAllocator) -> List[Quad]:
    return _JsonLdParser(alloc).parse(text)
