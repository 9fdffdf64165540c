"""RDF/XML parser: striped XML → triples.

Re-implements the reference RRX SAX parser semantics
(riot/lang/rdfxml/rrx/ParserRRX_SAX.java, 1,977 LoC: term classification
:83-199, parse modes :260-292, rdf:li counters :474-475,783, xml:base
scoping :688-691, reification :1181) over Python ``xml.parsers.expat``:

- node elements / property elements alternate (striping);
- rdf:about / rdf:ID / rdf:nodeID subject rules, typed node elements;
- property attributes, ``rdf:li`` → ``rdf:_n`` counters (per node element);
- rdf:parseType = Resource | Collection | Literal (exclusive-C14N-style
  XML literal serialization: visibly-utilized namespaces only, attributes
  sorted, ``<e></e>`` never self-closed);
- reification via rdf:ID on property elements;
- xml:base / xml:lang scoping.

Errors (negative-syntax tests) raise RDFSyntaxError → the document yields
zero triples.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple
from xml.parsers import expat

from ..iri import IRIResolver, split_iri, resolve as iri_resolve
from ..skolem import BNodeAllocator
from ..terms import (
    RDF_NS,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    RDFSyntaxError,
    Term,
    mk_bnode,
    mk_iri,
    mk_literal,
)

Triple = Tuple[str, str, str]

XML_NS = "http://www.w3.org/XML/1998/namespace"
ITS_NS = "http://www.w3.org/2005/11/its"  # its:dir base-direction (RDF 1.2)
XMLNS_NS = "http://www.w3.org/2000/xmlns/"
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"
RDF_STATEMENT = RDF_NS + "Statement"
RDF_REIFIES = RDF_NS + "reifies"

_CORE_SYNTAX = {"RDF", "ID", "about", "parseType", "resource", "nodeID", "datatype"}
_OLD_TERMS = {"aboutEach", "aboutEachPrefix", "bagID"}

from .tokenizer import _is_pn_chars, _is_pn_chars_u


def _is_ncname(s: str) -> bool:
    """XML NCName: the start/continue classes coincide with Turtle's
    PN_CHARS_U / (PN_CHARS | '.')."""
    if not s or not _is_pn_chars_u(ord(s[0])):
        return False
    return all(_is_pn_chars(ord(c)) or c == "." for c in s[1:])


class _NCNameChecker:
    @staticmethod
    def match(s: str):
        return _is_ncname(s) or None


_NCNAME_RE = _NCNameChecker()


class _Elem:
    __slots__ = ("uri", "local", "qname", "attrs", "nsdecls", "children", "line")

    def __init__(self, uri, local, qname, attrs, nsdecls, line):
        self.uri = uri          # namespace URI or ""
        self.local = local
        self.qname = qname      # prefix:local or local
        self.attrs = attrs      # list[(uri, local, qname, value)]
        self.nsdecls = nsdecls  # list[(prefix_or_None, uri)] declared here
        self.children = []      # _Elem | str (text)
        self.line = line


def _build_tree(text: str) -> _Elem:
    p = expat.ParserCreate(namespace_separator="\x01")
    p.namespace_prefixes = True
    p.ordered_attributes = True

    root: List[_Elem] = []
    stack: List[_Elem] = []
    pending_ns: List[Tuple[Optional[str], str]] = []

    def split_name(name: str) -> Tuple[str, str, str]:
        parts = name.split("\x01")
        if len(parts) == 1:
            return "", parts[0], parts[0]
        if len(parts) == 2:
            return parts[0], parts[1], parts[1]
        return parts[0], parts[1], parts[2] + ":" + parts[1]

    def start_ns(prefix, uri):
        pending_ns.append((prefix, uri))

    def start(name, attlist):
        nonlocal pending_ns
        uri, local, qname = split_name(name)
        attrs = []
        for i in range(0, len(attlist), 2):
            auri, alocal, aqname = split_name(attlist[i])
            attrs.append((auri, alocal, aqname, attlist[i + 1]))
        el = _Elem(uri, local, qname, attrs, pending_ns, p.CurrentLineNumber)
        pending_ns = []
        if stack:
            stack[-1].children.append(el)
        else:
            root.append(el)
        stack.append(el)

    def end(name):
        stack.pop()

    def chars(data):
        if stack:
            kids = stack[-1].children
            if kids and isinstance(kids[-1], str):
                kids[-1] += data
            else:
                kids.append(data)

    p.StartNamespaceDeclHandler = start_ns
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chars

    try:
        p.Parse(text, True)
    except expat.ExpatError as e:
        raise RDFSyntaxError(f"XML parse error: {e}") from None
    if len(root) != 1:
        raise RDFSyntaxError("expected exactly one root element")
    return root[0]


# ---------------------------------------------------------------------------
# Exclusive-canonical-ish XML literal serialization (visibly-utilized
# namespaces; matches Jena RRX output, cf. the alternative xml-canon goldens
# at jena-arq/testing/RIOT/Lang/rdf-xml/xml-canon/).
# ---------------------------------------------------------------------------

def _esc_text(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\r", "&#xD;")
    )


def _esc_attr(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
        .replace("\t", "&#x9;").replace("\n", "&#xA;").replace("\r", "&#xD;")
    )


def _serialize_xml_literal(
    nodes: List, ns_scope: Dict[str, str], out_scope: Dict[str, str]
) -> str:
    """nodes: children of the property element.  ns_scope: prefix→uri in
    scope at each element (computed during walk).  out_scope: namespaces
    already emitted in the output ancestor chain."""
    out: List[str] = []
    for n in nodes:
        if isinstance(n, str):
            out.append(_esc_text(n))
        else:
            out.append(_serialize_elem(n, ns_scope, dict(out_scope)))
    return "".join(out)


def _serialize_elem(el: _Elem, parent_scope: Dict[str, str], out_scope: Dict[str, str]) -> str:
    scope = dict(parent_scope)
    for pfx, uri in el.nsdecls:
        scope[pfx or ""] = uri or ""

    # visibly utilized prefixes: the element's own + its attributes'
    used: Dict[str, str] = {}
    own_prefix = el.qname.split(":")[0] if ":" in el.qname else ""
    if el.uri or own_prefix:
        used[own_prefix] = el.uri
    for auri, alocal, aqname, aval in el.attrs:
        if ":" in aqname:
            apfx = aqname.split(":")[0]
            if apfx != "xml":
                used[apfx] = auri

    new_decls = []
    for pfx in sorted(used):
        uri = used[pfx]
        if out_scope.get(pfx, "") != uri:
            new_decls.append((pfx, uri))
            out_scope[pfx] = uri

    parts = ["<", el.qname]
    for pfx, uri in new_decls:
        if pfx == "":
            parts.append(f' xmlns="{_esc_attr(uri)}"')
        else:
            parts.append(f' xmlns:{pfx}="{_esc_attr(uri)}"')
    for auri, alocal, aqname, aval in sorted(
        el.attrs, key=lambda a: (a[0], a[1])
    ):
        parts.append(f' {aqname}="{_esc_attr(aval)}"')
    parts.append(">")
    for c in el.children:
        if isinstance(c, str):
            parts.append(_esc_text(c))
        else:
            parts.append(_serialize_elem(c, scope, dict(out_scope)))
    parts.append(f"</{el.qname}>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# The striping walk
# ---------------------------------------------------------------------------

class _RDFXMLWalker:
    def __init__(self, base: Optional[str], alloc: BNodeAllocator):
        self.alloc = alloc
        self.out: List[Triple] = []
        self.base0 = base
        self.ids_seen: Dict[Tuple[str, str], bool] = {}
        self.version12 = False  # rdf:version="1.2" seen (enables 1.2 syntax)

    # base/lang are passed down the walk explicitly (xml:base/xml:lang scoping)

    def _resolve(self, iri: str, base: Optional[str]) -> str:
        if split_iri(iri).scheme is not None:
            return iri
        if base is None:
            raise RDFSyntaxError(f"relative IRI without base: {iri!r}")
        return iri_resolve(base, iri)

    def _scoped(self, el: _Elem, base: Optional[str], lang: str, dir_: str = ""):
        for auri, alocal, aq, aval in el.attrs:
            if auri == XML_NS and alocal == "base":
                # fragment stripped from xml:base per XML Base / RFC 3986
                newb = self._resolve(aval, base)
                h = newb.find("#")
                if h >= 0:
                    newb = newb[:h]
                base = newb
            elif auri == XML_NS and alocal == "lang":
                lang = aval
            elif auri == ITS_NS and alocal == "dir":
                dir_ = aval
            elif auri == RDF_NS and alocal == "version":
                self.version12 = aval.startswith("1.2")
        return base, lang, dir_

    def _langdir(self, lang: str, dir_: str) -> Optional[str]:
        """Combined language tag for mk_literal: dir without lang is
        ignored (a base direction needs a language, dir-06), and its:dir
        only takes effect under rdf:version="1.2" (dir-02)."""
        if lang and dir_ and self.version12:
            return f"{lang}--{dir_}"
        return lang or None

    def _emit(self, s: Term, p: Term, o: Term) -> None:
        self.out.append((s.nt(), p.nt(), o.nt()))

    def _mk_id_iri(self, idval: str, base: Optional[str], line: int) -> str:
        if not _NCNAME_RE.match(idval):
            raise RDFSyntaxError(f"line {line}: rdf:ID not an NCName: {idval!r}")
        iri = self._resolve("#" + idval, base)
        key = (base or "", idval)
        if key in self.ids_seen:
            raise RDFSyntaxError(f"line {line}: duplicate rdf:ID {idval!r}")
        self.ids_seen[key] = True
        return iri

    def _check_attr_allowed(self, auri: str, alocal: str, aqname: str, line: int) -> bool:
        """Returns True if the attribute participates as a property
        attribute; False if it should be ignored; raises on forbidden."""
        if auri == XML_NS or aqname.startswith("xml"):
            # xml:lang/base/space and xmlFoo reserved-looking names: ignored
            return False
        if auri == ITS_NS:
            # its:dir handled by _scoped; its:version et al. ignored
            return False
        if auri == "":
            raise RDFSyntaxError(
                f"line {line}: unqualified attribute {aqname!r} not allowed"
            )
        if auri == RDF_NS:
            if alocal in _CORE_SYNTAX or alocal == "version":
                return False  # handled by caller / parser-version decl
            if alocal in _OLD_TERMS:
                raise RDFSyntaxError(f"line {line}: rdf:{alocal} not allowed")
            if alocal in ("Description", "li"):
                raise RDFSyntaxError(
                    f"line {line}: rdf:{alocal} not allowed as attribute"
                )
        return True

    # -- node elements -------------------------------------------------------

    def node_element(self, el: _Elem, base: Optional[str], lang: str, dir_: str = "") -> Term:
        base, lang, dir_ = self._scoped(el, base, lang, dir_)
        if el.uri == RDF_NS and (
            el.local in _CORE_SYNTAX or el.local in _OLD_TERMS or el.local == "li"
        ):
            if el.local != "RDF":
                raise RDFSyntaxError(
                    f"line {el.line}: rdf:{el.local} not allowed as node element"
                )
            raise RDFSyntaxError(f"line {el.line}: nested rdf:RDF")

        about = idv = nodeid = None
        prop_attrs = []
        for auri, alocal, aqname, aval in el.attrs:
            if auri == RDF_NS and alocal == "about":
                about = aval
            elif auri == RDF_NS and alocal == "ID":
                idv = aval
            elif auri == RDF_NS and alocal == "nodeID":
                nodeid = aval
            elif auri == RDF_NS and alocal in ("parseType", "resource", "datatype"):
                raise RDFSyntaxError(
                    f"line {el.line}: rdf:{alocal} not allowed on node element"
                )
            elif self._check_attr_allowed(auri, alocal, aqname, el.line):
                prop_attrs.append((auri, alocal, aval))

        if sum(x is not None for x in (about, idv, nodeid)) > 1:
            raise RDFSyntaxError(
                f"line {el.line}: at most one of rdf:about/rdf:ID/rdf:nodeID"
            )
        if about is not None:
            subj = mk_iri(self._resolve(about, base))
        elif idv is not None:
            subj = mk_iri(self._mk_id_iri(idv, base, el.line))
        elif nodeid is not None:
            if not _NCNAME_RE.match(nodeid):
                raise RDFSyntaxError(f"line {el.line}: bad rdf:nodeID {nodeid!r}")
            subj = mk_bnode(self.alloc.get(nodeid))
        else:
            subj = mk_bnode(self.alloc.fresh())

        # typed node element
        if not (el.uri == RDF_NS and el.local == "Description"):
            if not el.uri:
                raise RDFSyntaxError(
                    f"line {el.line}: element {el.qname!r} has no namespace"
                )
            self._emit(subj, mk_iri(RDF_TYPE), mk_iri(el.uri + el.local))

        # property attributes
        for auri, alocal, aval in prop_attrs:
            if auri == RDF_NS and alocal == "type":
                self._emit(subj, mk_iri(RDF_TYPE), mk_iri(self._resolve(aval, base)))
            else:
                self._emit(
                    subj,
                    mk_iri(auri + alocal),
                    mk_literal(aval, lang=self._langdir(lang, dir_)),
                )

        # property elements
        li_counter = [0]
        for c in el.children:
            if isinstance(c, str):
                if c.strip():
                    raise RDFSyntaxError(
                        f"line {el.line}: stray text inside node element"
                    )
                continue
            self.property_element(c, subj, base, lang, li_counter, dir_)
        return subj

    # -- property elements -----------------------------------------------------

    def property_element(
        self,
        el: _Elem,
        subj: Term,
        base: Optional[str],
        lang: str,
        li_counter: List[int],
        dir_: str = "",
    ) -> None:
        outer_base = base
        base, lang, dir_ = self._scoped(el, base, lang, dir_)
        if el.uri == RDF_NS:
            if el.local in _CORE_SYNTAX or el.local in _OLD_TERMS or el.local == "Description":
                raise RDFSyntaxError(
                    f"line {el.line}: rdf:{el.local} not allowed as property element"
                )
        if not el.uri:
            raise RDFSyntaxError(
                f"line {el.line}: property element {el.qname!r} has no namespace"
            )
        if el.uri == RDF_NS and el.local == "li":
            li_counter[0] += 1
            pred = mk_iri(RDF_NS + f"_{li_counter[0]}")
        else:
            pred = mk_iri(el.uri + el.local)

        resource = nodeid = datatype = parse_type = idv = None
        annotation = annotation_nodeid = None
        prop_attrs = []
        for auri, alocal, aqname, aval in el.attrs:
            if auri == RDF_NS and alocal == "annotation":
                annotation = aval
            elif auri == RDF_NS and alocal == "annotationNodeID":
                annotation_nodeid = aval
            elif auri == RDF_NS and alocal == "resource":
                resource = aval
            elif auri == RDF_NS and alocal == "nodeID":
                nodeid = aval
            elif auri == RDF_NS and alocal == "datatype":
                datatype = aval
            elif auri == RDF_NS and alocal == "parseType":
                parse_type = aval
            elif auri == RDF_NS and alocal == "ID":
                idv = aval
            elif auri == RDF_NS and alocal == "about":
                raise RDFSyntaxError(f"line {el.line}: rdf:about on property element")
            elif self._check_attr_allowed(auri, alocal, aqname, el.line):
                prop_attrs.append((auri, alocal, aval))

        reify_iri = (
            self._mk_id_iri(idv, base, el.line) if idv is not None else None
        )

        def emit(o: Term) -> None:
            self._emit(subj, pred, o)
            if reify_iri is not None:
                st = mk_iri(reify_iri)
                self._emit(st, mk_iri(RDF_TYPE), mk_iri(RDF_STATEMENT))
                self._emit(st, mk_iri(RDF_NS + "subject"), subj)
                self._emit(st, mk_iri(RDF_NS + "predicate"), pred)
                self._emit(st, mk_iri(RDF_NS + "object"), o)
            if annotation is not None or annotation_nodeid is not None:
                # RDF 1.2: rdf:annotation / rdf:annotationNodeID reify the
                # asserted triple via rdf:reifies + a triple term
                from ..terms import TRIPLE_TERM

                if annotation is not None:
                    reifier = mk_iri(self._resolve(annotation, base))
                else:
                    if not _NCNAME_RE.match(annotation_nodeid):
                        raise RDFSyntaxError(
                            f"line {el.line}: bad rdf:annotationNodeID"
                        )
                    reifier = mk_bnode(self.alloc.get(annotation_nodeid))
                tt = Term(TRIPLE_TERM, f"{subj.nt()} {pred.nt()} {o.nt()}")
                self._emit(reifier, mk_iri(RDF_REIFIES), tt)

        elems = [c for c in el.children if isinstance(c, _Elem)]
        texts = [c for c in el.children if isinstance(c, str)]
        text = "".join(texts)

        if parse_type is not None:
            if resource is not None or nodeid is not None or datatype is not None or prop_attrs:
                raise RDFSyntaxError(
                    f"line {el.line}: rdf:parseType with conflicting attributes"
                )
            if parse_type == "Resource":
                bn = mk_bnode(self.alloc.fresh())
                emit(bn)
                inner_li = [0]
                for c in el.children:
                    if isinstance(c, str):
                        if c.strip():
                            raise RDFSyntaxError(
                                f"line {el.line}: text in parseType=Resource"
                            )
                        continue
                    self.property_element(c, bn, base, lang, inner_li, dir_)
                return
            if parse_type == "Triple":
                # RDF 1.2 triple term — only recognized in 1.2 mode
                # (without rdf:version="1.2" the construct is ignored,
                # rdf12-xml-tt-01)
                if not self.version12:
                    return
                if text.strip() or len(elems) != 1:
                    raise RDFSyntaxError(
                        f"line {el.line}: parseType=Triple needs exactly one node element"
                    )
                from ..terms import TRIPLE_TERM

                saved = self.out
                self.out = []
                try:
                    self.node_element(elems[0], base, lang, dir_)
                    inner = self.out
                finally:
                    self.out = saved
                if len(inner) != 1:
                    raise RDFSyntaxError(
                        f"line {el.line}: parseType=Triple must describe exactly one triple"
                    )
                s_, p_, o_ = inner[0]
                emit(Term(TRIPLE_TERM, f"{s_} {p_} {o_}"))
                return
            if parse_type == "Collection":
                if elems:
                    head = mk_bnode(self.alloc.fresh())
                    emit(head)
                    cur = head
                    for i, c in enumerate(elems):
                        if i > 0:
                            nxt = mk_bnode(self.alloc.fresh())
                            self._emit(cur, mk_iri(RDF_REST), nxt)
                            cur = nxt
                        node = self.node_element(c, base, lang, dir_)
                        self._emit(cur, mk_iri(RDF_FIRST), node)
                    self._emit(cur, mk_iri(RDF_REST), mk_iri(RDF_NIL))
                else:
                    emit(mk_iri(RDF_NIL))
                return
            # "Literal" and any unknown parseType → XML literal
            lit = _serialize_xml_literal(el.children, {}, {})
            emit(mk_literal(lit, datatype=RDF_XMLLITERAL))
            return

        if elems:
            if text.strip():
                raise RDFSyntaxError(
                    f"line {el.line}: mixed content needs rdf:parseType='Literal'"
                )
            if len(elems) != 1:
                raise RDFSyntaxError(
                    f"line {el.line}: multiple node elements in property element"
                )
            if resource is not None or nodeid is not None or datatype is not None or prop_attrs:
                raise RDFSyntaxError(
                    f"line {el.line}: node element content with conflicting attributes"
                )
            node = self.node_element(elems[0], base, lang, dir_)
            emit(node)
            return

        if text and any(t.strip() for t in texts):
            # literal content
            if resource is not None or nodeid is not None or prop_attrs:
                raise RDFSyntaxError(
                    f"line {el.line}: literal content with conflicting attributes"
                )
            if datatype is not None:
                emit(mk_literal(text, datatype=self._resolve(datatype, base)))
            else:
                emit(mk_literal(text, lang=self._langdir(lang, dir_)))
            return

        # empty (or whitespace-only) property element
        if resource is not None and nodeid is not None:
            raise RDFSyntaxError(
                f"line {el.line}: both rdf:resource and rdf:nodeID"
            )
        if resource is not None:
            obj: Term = mk_iri(self._resolve(resource, base))
            for auri, alocal, aval in prop_attrs:
                self._attr_triple(obj, auri, alocal, aval, base, lang, dir_)
            emit(obj)
            return
        if nodeid is not None:
            if not _NCNAME_RE.match(nodeid):
                raise RDFSyntaxError(f"line {el.line}: bad rdf:nodeID {nodeid!r}")
            obj = mk_bnode(self.alloc.get(nodeid))
            for auri, alocal, aval in prop_attrs:
                self._attr_triple(obj, auri, alocal, aval, base, lang, dir_)
            emit(obj)
            return
        if prop_attrs:
            obj = mk_bnode(self.alloc.fresh())
            for auri, alocal, aval in prop_attrs:
                self._attr_triple(obj, auri, alocal, aval, base, lang, dir_)
            emit(obj)
            return
        # truly empty → empty literal (whitespace-only content is "" per
        # white-space handling? No: whitespace-only content is the literal
        # text itself when no child elements — but XML whitespace between
        # (absent) elements... Jena emits "" for <p></p> and the raw
        # whitespace for <p> </p> with string content)
        if datatype is not None:
            emit(mk_literal(text, datatype=self._resolve(datatype, base)))
        else:
            emit(mk_literal(text, lang=self._langdir(lang, dir_)))

    def _attr_triple(self, subj, auri, alocal, aval, base, lang, dir_=""):
        if auri == RDF_NS and alocal == "type":
            self._emit(subj, mk_iri(RDF_TYPE), mk_iri(self._resolve(aval, base)))
        else:
            self._emit(
                subj,
                mk_iri(auri + alocal),
                mk_literal(aval, lang=self._langdir(lang, dir_)),
            )

    # -- document ---------------------------------------------------------------

    def walk(self, root: _Elem) -> List[Triple]:
        base, lang, dir_ = self._scoped(root, self.base0, "")
        if root.uri == RDF_NS and root.local == "RDF":
            for c in root.children:
                if isinstance(c, str):
                    if c.strip():
                        raise RDFSyntaxError("stray text at top level")
                    continue
                self.node_element(c, base, lang, dir_)
        else:
            # rdf:RDF element is optional (rdf-element-not-mandatory)
            self.node_element(root, self.base0, "")
        return self.out


def parse_rdfxml(
    text: str, base: Optional[str], alloc: BNodeAllocator
) -> List[Triple]:
    root = _build_tree(text)
    return _RDFXMLWalker(base, alloc).walk(root)
