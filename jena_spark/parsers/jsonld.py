"""JSON-LD → triples, a broad JSON-LD 1.1 subset.

The reference delegates JSON-LD 1.1 to the Titanium library
(riot/lang/LangJSONLD11.java:30-32,117-123 — ``JsonLd.toRdf``); this is a
dependency-free re-implementation of the parts of the 1.1
expansion/deserialization algorithms that cover common documents:

- node objects with ``@id`` / ``@type`` / property → value arrays;
- value objects ``{"@value", "@language", "@type"}``;
- ``{"@id": …}`` references, nested node objects (fresh bnodes when no
  ``@id``), ``@graph`` arrays, ``_:`` blank-node ids;
- ``@list`` values → rdf:first/rdf:rest/rdf:nil chains (both the
  ``{"@list": …}`` value form and ``"@container": "@list"`` coercion);
- ``@reverse`` — both the node-object keyword and term definitions with
  ``{"@reverse": iri}``;
- ``@context``: term→IRI strings, expanded term definitions with
  ``@id`` / ``@type`` (incl. ``"@type": "@id"``/``"@vocab"`` coercion and
  ``"@type": "@json"``) / ``@container`` (``@list``/``@set``/``@index``) /
  ``@language`` / ``@direction`` / ``@reverse``; ``@vocab``, ``@base``,
  default ``@language`` and default ``@direction``; arrays of contexts
  applied in order; ``null`` context reset; keyword aliases
  (``"id": "@id"`` etc.); compact IRIs (``prefix:suffix``);
- **remote contexts by injection**: a string ``@context`` is looked up
  in the ``context_documents`` mapping (IRI → parsed context document)
  passed by the caller — the reference's injectable DocumentLoader
  (Titanium ``DocumentLoader``; LangJSONLD11.java) without network;
- ``@json`` literals (``rdf:JSON`` datatype; lexical = sorted-key
  minimal-separator serialization, an RFC 8785 subset — integral floats
  keep their ``.0``, a documented divergence);
- ``@direction`` (context default / term def / value object): language +
  direction → RDF 1.2 dir-lang literal (``"x"@en--rtl``); a direction
  with no language is ignored (the serialization needs a langtag);
- ``@index`` / ``@container: @index``: index keys are annotations only —
  values flatten into the property (JSON-LD deserialization §4.6.1);
- ``@nest``: nested property containers are transparent — properties of
  the nest object are emitted on the enclosing node.

Outside the subset (documented, raises RDFSyntaxError rather than
mis-parsing): remote contexts that are not preloaded.  ``@included``
blocks are emitted as independent node objects in the same graph.
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

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

_KEYWORDS = {
    "@id", "@type", "@value", "@language", "@graph", "@context", "@list",
    "@set", "@reverse", "@base", "@vocab", "@index", "@nest", "@direction",
    "@included",
}

# @value objects may not carry node-object keywords (checked in context)
_UNSUPPORTED_KEYWORDS: frozenset = frozenset()

RDF_JSON = RDF_NS + "JSON"


def _canonical_json(v: Any) -> str:
    """rdf:JSON lexical form: sorted object keys, minimal separators,
    raw unicode — an RFC 8785 (JCS) subset; integral floats keep the
    Python ``.0`` form (documented divergence from full JCS numbers)."""
    return json.dumps(v, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


class _TermDef:
    __slots__ = ("iri", "type_", "container", "reverse", "language", "direction")

    def __init__(
        self,
        iri: Optional[str],
        type_: Optional[str] = None,
        container: Optional[str] = None,
        reverse: bool = False,
        language=None,   # None = inherit; "" = no-language override
        direction=None,  # None = inherit; "" = no-direction override
    ):
        self.iri = iri
        self.type_ = type_
        self.container = container
        self.reverse = reverse
        self.language = language
        self.direction = direction


class _JsonLdParser:
    def __init__(self, alloc: BNodeAllocator, context_documents=None):
        self.alloc = alloc
        self.out: List[Quad] = []
        self.vocab: Optional[str] = None
        self.base: Optional[str] = None
        self.language: Optional[str] = None
        self.direction: Optional[str] = None  # default base direction
        self.terms: Dict[str, _TermDef] = {}
        self.aliases: Dict[str, str] = {}  # term → keyword
        self.context_documents = context_documents or {}

    # -- context processing ---------------------------------------------------

    def _ctx(self, ctx: Any) -> None:
        if ctx is None:
            # null context: reset to initial state (JSON-LD API §4.1.8)
            self.vocab = self.base = self.language = self.direction = None
            self.terms.clear()
            self.aliases.clear()
            return
        if isinstance(ctx, list):
            for c in ctx:
                self._ctx(c)
            return
        if isinstance(ctx, str):
            # remote context: resolved through the injected document map
            # (no network) — the reference's DocumentLoader seam
            url = ctx
            if self.base and ":" not in url.split("/")[0]:
                from ..iri import IRIResolver

                url = IRIResolver(self.base).resolve(url)
            doc = self.context_documents.get(url, self.context_documents.get(ctx))
            if doc is None:
                raise RDFSyntaxError(
                    f"remote @context {ctx!r} not preloaded — pass it via "
                    "context_documents (no network access in this engine)"
                )
            inner = doc.get("@context", doc) if isinstance(doc, dict) else doc
            self._ctx(inner)
            return
        if not isinstance(ctx, dict):
            raise RDFSyntaxError("unsupported @context form")
        for k, v in ctx.items():
            if k == "@vocab":
                if v is not None and not isinstance(v, str):
                    raise RDFSyntaxError("@vocab must be a string or null")
                self.vocab = v
            elif k == "@base":
                if v is not None and not isinstance(v, str):
                    raise RDFSyntaxError("@base must be a string or null")
                self.base = v
            elif k == "@language":
                self.language = v
            elif k == "@direction":
                if v not in (None, "ltr", "rtl"):
                    raise RDFSyntaxError("@direction must be 'ltr', 'rtl' or null")
                self.direction = v
            elif k in ("@version", "@propagate"):
                continue  # processing-mode hints: accepted, no-op
            elif k.startswith("@"):
                raise RDFSyntaxError(f"unsupported context keyword {k!r}")
            elif isinstance(v, str):
                if v in _KEYWORDS:
                    self.aliases[k] = v
                else:
                    self.terms[k] = _TermDef(self._expand_iri(v, vocab_ok=True))
            elif isinstance(v, dict):
                self.terms[k] = self._term_def(k, v)
            elif v is None:
                self.terms[k] = _TermDef(None)  # term explicitly decoupled
            else:
                raise RDFSyntaxError(f"unsupported @context entry for {k!r}")

    def _term_def(self, term: str, d: dict) -> _TermDef:
        iri: Optional[str] = None
        reverse = False
        if "@reverse" in d:
            reverse = True
            iri = self._expand_iri(d["@reverse"], vocab_ok=True)
        elif "@id" in d:
            if d["@id"] is None:
                return _TermDef(None)
            iri = self._expand_iri(d["@id"], vocab_ok=True)
        else:
            iri = self._expand_iri(term, vocab_ok=True)
        type_ = None
        if "@type" in d:
            t = d["@type"]
            if t in ("@id", "@vocab", "@json"):
                type_ = t
            elif isinstance(t, str):
                type_ = self._expand_iri(t, vocab_ok=True)
            else:
                raise RDFSyntaxError(f"bad @type in term definition {term!r}")
        container = None
        if "@container" in d:
            c = d["@container"]
            if isinstance(c, list) and len(c) == 1:
                c = c[0]
            if c in ("@list", "@set", "@index"):
                container = c
            else:
                raise RDFSyntaxError(
                    f"unsupported @container {c!r} (subset: @list/@set/@index)"
                )
        language = None
        if "@language" in d:
            language = d["@language"] if d["@language"] is not None else ""
        direction = None
        if "@direction" in d:
            dv = d["@direction"]
            if dv not in (None, "ltr", "rtl"):
                raise RDFSyntaxError("@direction must be 'ltr', 'rtl' or null")
            direction = dv if dv is not None else ""
        for k in d:
            if k in _UNSUPPORTED_KEYWORDS:
                raise RDFSyntaxError(f"unsupported keyword {k} in term def")
        return _TermDef(iri, type_, container, reverse, language, direction)

    # -- IRI expansion ----------------------------------------------------------

    def _expand_iri(self, s: str, vocab_ok: bool = False) -> str:
        if not isinstance(s, str):
            raise RDFSyntaxError(f"expected IRI string, got {type(s).__name__}")
        if s.startswith("_:"):
            return s
        if s in _KEYWORDS:
            raise RDFSyntaxError(f"keyword {s!r} used as IRI")
        td = self.terms.get(s)
        if td is not None:
            if td.iri is None:
                raise RDFSyntaxError(f"term {s!r} is explicitly decoupled")
            return td.iri
        if ":" in s:
            pfx, rest = s.split(":", 1)
            ptd = self.terms.get(pfx)
            if ptd is not None and ptd.iri and not rest.startswith("//"):
                return ptd.iri + rest
            return s
        if vocab_ok and self.vocab:
            return self.vocab + s
        if self.base:
            from ..iri import IRIResolver

            return IRIResolver(self.base).resolve(s)
        raise RDFSyntaxError(f"cannot expand {s!r} (no @vocab / not an IRI)")

    def _kw(self, node: dict, keyword: str):
        """Value for a keyword, honouring context aliases."""
        if keyword in node:
            return node[keyword]
        for alias, kw in self.aliases.items():
            if kw == keyword and alias in node:
                return node[alias]
        return None

    def _is_kw(self, key: str, keyword: str) -> bool:
        return key == keyword or self.aliases.get(key) == keyword

    # -- node / value processing -----------------------------------------------

    def _subject(self, node: dict) -> Term:
        sid = self._kw(node, "@id")
        if sid is None:
            return mk_bnode(self.alloc.fresh())
        if not isinstance(sid, str):
            raise RDFSyntaxError("@id must be a string")
        if sid.startswith("_:"):
            return mk_bnode(self.alloc.get(sid[2:]))
        return mk_iri(self._expand_iri(sid))

    def _rdf_list(self, items: List[Any], td: Optional[_TermDef], graph) -> Term:
        """Build an rdf:first/rdf:rest chain; returns the head term."""
        if not items:
            return mk_iri(RDF_NIL)
        head = mk_bnode(self.alloc.fresh())
        cur = head
        for i, item in enumerate(items):
            val = self._value_term(item, td, graph, allow_list=False)
            self.out.append((graph, cur.nt(), mk_iri(RDF_FIRST).nt(), val.nt()))
            nxt = (
                mk_iri(RDF_NIL)
                if i == len(items) - 1
                else mk_bnode(self.alloc.fresh())
            )
            self.out.append((graph, cur.nt(), mk_iri(RDF_REST).nt(), nxt.nt()))
            cur = nxt
        return head

    def _value_term(
        self,
        v: Any,
        td: Optional[_TermDef] = None,
        graph: Optional[str] = None,
        allow_list: bool = True,
    ) -> Term:
        coerce = td.type_ if td else None
        lang_default = (
            td.language if (td and td.language is not None) else self.language
        )
        dir_default = (
            td.direction if (td and td.direction is not None) else self.direction
        )

        def langdir(lang: Optional[str], direction: Optional[str]) -> Optional[str]:
            # language + direction → RDF 1.2 dir-lang tag "lang--dir";
            # a direction with no language has no serialization → ignored
            if not lang:
                return lang
            return f"{lang}--{direction}" if direction else lang

        if coerce == "@json" and not (
            isinstance(v, dict) and self._kw(v, "@value") is not None
        ):
            return mk_literal(_canonical_json(v), datatype=RDF_JSON)
        if isinstance(v, dict):
            for k in v:
                if k in _UNSUPPORTED_KEYWORDS:
                    raise RDFSyntaxError(f"unsupported keyword {k}")
            if "@value" in v or any(self._is_kw(k, "@value") for k in v):
                val = self._kw(v, "@value")
                lang = self._kw(v, "@language")
                direction = self._kw(v, "@direction")
                if direction is None:
                    direction = dir_default
                elif direction not in ("ltr", "rtl"):
                    raise RDFSyntaxError("@direction must be 'ltr' or 'rtl'")
                dt = self._kw(v, "@type")
                if dt == "@json" or coerce == "@json":
                    if lang is not None:
                        raise RDFSyntaxError("@json literal cannot have @language")
                    return mk_literal(_canonical_json(val), datatype=RDF_JSON)
                # a @type on a native value is a term/compact IRI too —
                # expand it exactly like the string-value branch does
                xdt = self._expand_iri(dt, vocab_ok=True) if dt is not None else None
                if isinstance(val, bool):
                    return mk_literal(
                        "true" if val else "false", datatype=xdt or XSD_BOOLEAN
                    )
                if isinstance(val, int):
                    return mk_literal(str(val), datatype=xdt or XSD_INTEGER)
                if isinstance(val, float):
                    return mk_literal(
                        _canonical_double(val), datatype=xdt or XSD_DOUBLE
                    )
                if not isinstance(val, str):
                    raise RDFSyntaxError("unsupported @value type")
                if lang is not None:
                    return mk_literal(val, lang=langdir(lang, direction))
                if xdt is not None:
                    return mk_literal(val, datatype=xdt)
                return mk_literal(val)
            if "@list" in v or any(self._is_kw(k, "@list") for k in v):
                if not allow_list:
                    raise RDFSyntaxError("nested @list not supported")
                items = self._kw(v, "@list")
                if not isinstance(items, list):
                    items = [items]
                return self._rdf_list(items, td, graph)
            if "@set" in v or any(self._is_kw(k, "@set") for k in v):
                raise RDFSyntaxError("@set value object must be an array")
            # node object (reference or nested)
            term = self._subject(v)
            self._node(v, term, graph)
            return term
        if isinstance(v, bool):
            return mk_literal("true" if v else "false", datatype=XSD_BOOLEAN)
        if isinstance(v, int):
            return mk_literal(str(v), datatype=XSD_INTEGER)
        if isinstance(v, float):
            return mk_literal(_canonical_double(v), datatype=XSD_DOUBLE)
        if isinstance(v, str):
            if coerce == "@id":
                return mk_bnode(self.alloc.get(v[2:])) if v.startswith("_:") \
                    else mk_iri(self._expand_iri(v))
            if coerce == "@vocab":
                return mk_iri(self._expand_iri(v, vocab_ok=True))
            if coerce is not None:
                return mk_literal(v, datatype=coerce)
            if lang_default:
                return mk_literal(v, lang=langdir(lang_default, dir_default))
            return mk_literal(v)
        raise RDFSyntaxError(f"unsupported value {type(v).__name__}")

    def _emit_property(
        self, subj: Term, key: str, v: Any, graph: Optional[str], reverse_ctx: bool
    ) -> None:
        td = self.terms.get(key)
        if td is not None and td.iri is None:
            return  # decoupled term: ignored
        iri = td.iri if td is not None else self._expand_iri(key, vocab_ok=True)
        pred = mk_iri(iri)
        reverse = reverse_ctx ^ bool(td and td.reverse)
        if td is not None and td.container == "@list" and isinstance(v, list):
            if reverse:
                raise RDFSyntaxError("@reverse with @list is illegal")
            head = self._rdf_list(v, td, graph)
            self.out.append((graph, subj.nt(), pred.nt(), head.nt()))
            return
        if td is not None and td.container == "@index" and isinstance(v, dict):
            # index maps: keys are annotations only — values flatten into
            # the property (deterministic key order for stable bnode ids)
            flat: List[Any] = []
            for _ik in sorted(v):
                iv = v[_ik]
                flat.extend(iv if isinstance(iv, list) else [iv])
            v = flat
        vals = v if isinstance(v, list) else [v]
        for item in vals:
            obj = self._value_term(item, td, graph)
            if reverse:
                if obj.nt().startswith('"'):
                    raise RDFSyntaxError("@reverse value must be a node")
                self.out.append((graph, obj.nt(), pred.nt(), subj.nt()))
            else:
                self.out.append((graph, subj.nt(), pred.nt(), obj.nt()))

    def _nest(self, subj: Term, v: Any, graph: Optional[str]) -> None:
        """@nest containers are transparent: the nest object's properties
        (and @type) belong to the enclosing node (JSON-LD 1.1 §9.13)."""
        items = v if isinstance(v, list) else [v]
        for nd in items:
            if not isinstance(nd, dict) or self._kw(nd, "@value") is not None:
                raise RDFSyntaxError("@nest value must be node object(s)")
            types = self._kw(nd, "@type") or []
            if isinstance(types, str):
                types = [types]
            for t in types:
                self.out.append(
                    (graph, subj.nt(), mk_iri(RDF_TYPE).nt(),
                     mk_iri(self._expand_iri(t, True)).nt())
                )
            for k, val in nd.items():
                if k in _KEYWORDS or k in self.aliases:
                    if self._is_kw(k, "@nest"):
                        self._nest(subj, val, graph)
                    continue
                self._emit_property(subj, k, val, graph, reverse_ctx=False)

    def _node(
        self, node: dict, subj: Optional[Term] = None, graph: Optional[str] = None
    ) -> None:
        if "@context" in node:
            self._ctx(node["@context"])
        for k in node:
            if k in _UNSUPPORTED_KEYWORDS:
                raise RDFSyntaxError(f"unsupported keyword {k}")
        if subj is None:
            subj = self._subject(node)
        types = self._kw(node, "@type") or []
        if isinstance(types, str):
            types = [types]
        for t in types:
            self.out.append(
                (
                    graph,
                    subj.nt(),
                    mk_iri(RDF_TYPE).nt(),
                    mk_iri(self._expand_iri(t, True)).nt(),
                )
            )
        for k, v in node.items():
            if k == "@context" or k in _KEYWORDS or k in self.aliases:
                if self._is_kw(k, "@reverse") and isinstance(v, dict):
                    for rk, rv in v.items():
                        self._emit_property(subj, rk, rv, graph, reverse_ctx=True)
                elif self._is_kw(k, "@nest"):
                    self._nest(subj, v, graph)
                elif self._is_kw(k, "@included"):
                    # included blocks: independent node objects emitted
                    # into the SAME graph (JSON-LD 1.1 §9.14)
                    inc = v if isinstance(v, list) else [v]
                    for nd in inc:
                        if not isinstance(nd, dict):
                            raise RDFSyntaxError(
                                "@included entries must be node objects")
                        self._node(nd, graph=graph)
                continue
            self._emit_property(subj, k, v, graph, reverse_ctx=False)
        gval = self._kw(node, "@graph")
        if gval is not None:
            inner = gval if isinstance(gval, list) else [gval]
            has_id = self._kw(node, "@id") is not None
            g = subj.nt() if has_id else None
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


def parse_jsonld(
    text: str,
    base: Optional[str],
    alloc: BNodeAllocator,
    context_documents: Optional[Dict[str, Any]] = None,
) -> List[Quad]:
    """``context_documents`` maps remote-context IRIs to their parsed
    documents (the whole document or the context object itself) — the
    injectable no-network DocumentLoader seam."""
    p = _JsonLdParser(alloc, context_documents)
    if base:
        p.base = base
    return p.parse(text)
