"""N-Triples / N-Quads parsers.

Semantics from the reference N-tuple parsers
(riot/lang/LangNTriples.java:54-69, riot/lang/LangNQuads.java over
riot/lang/LangNTuple.java:86-177): strict token set (absolute IRIs only,
double-quoted single-line strings, no prefixed names or bare numbers) and
positional checks — subject ∈ {IRI, bnode}, predicate ∈ {IRI},
object ∈ {IRI, bnode, literal}, graph ∈ {IRI, bnode}.

A fatal error yields zero triples for the document (negative-syntax
behavior of the reference error handler).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..skolem import BNodeAllocator
from ..terms import (
    RDFSyntaxError,
    Term,
    XSD_STRING,
    canonical_langtag,
    mk_bnode,
    mk_iri,
    mk_literal,
    mk_tripleterm,
)
from ..iri import split_iri
from .turtle import _CDT_DTS
from .tokenizer import (
    T_BNODE,
    T_DOT,
    T_EOF,
    T_HATHAT,
    T_IRI,
    T_LANGTAG,
    T_LTT,
    T_RTT,
    T_STRING,
    Token,
    Tokenizer,
)

Triple = Tuple[str, str, str]
Quad = Tuple[Optional[str], str, str, str]


def _iri_term(tok: Token) -> Term:
    iri = tok.value
    if split_iri(iri).scheme is None:
        raise RDFSyntaxError(f"relative IRI not allowed in N-Triples: {iri!r}")
    return mk_iri(iri)


class _NTupleParser:
    def __init__(self, text: str, alloc: BNodeAllocator, quads: bool):
        self.tk = Tokenizer(text, strict_nt=True)
        self.alloc = alloc
        self.quads = quads

    def _node(self, tok: Token, tz: Tokenizer) -> Tuple[Term, Token]:
        """Parse one term starting at tok; return (term, next token)."""
        if tok.type == T_IRI:
            return _iri_term(tok), tz.next_token()
        if tok.type == T_BNODE:
            return mk_bnode(self.alloc.get(tok.value)), tz.next_token()
        if tok.type == T_STRING:
            if tok.value2 != '"':
                raise RDFSyntaxError("only double-quoted strings in N-Triples")
            nxt = tz.next_token()
            if nxt.type == T_LANGTAG:
                return mk_literal(tok.value, lang=nxt.value), tz.next_token()
            if nxt.type == T_HATHAT:
                dt = tz.next_token()
                if dt.type != T_IRI:
                    raise RDFSyntaxError("datatype must be an IRI")
                dt_iri = _iri_term(dt).lex
                lex = tok.value
                if dt_iri in _CDT_DTS:
                    # bnode labels inside cdt:List/Map literals share the
                    # document scope (see parsers/turtle.py twin)
                    from ..cdt import CdtError, relabel_bnodes

                    try:
                        lex = relabel_bnodes(lex, self.alloc.get)
                    except CdtError:
                        pass
                return (
                    mk_literal(lex, datatype=dt_iri),
                    tz.next_token(),
                )
            return mk_literal(tok.value), nxt
        if tok.type == T_LTT:
            # RDF 1.2 triple term <<( s p o )>> — object position only;
            # the positional check lives in parse() (LangNTuple.java:138-144)
            s, nxt = self._node(tz.next_token(), tz)
            p, nxt = self._node(nxt, tz)
            o, nxt = self._node(nxt, tz)
            if nxt.type != T_RTT:
                raise RDFSyntaxError("expected ')>>' closing a triple term")
            return mk_tripleterm(s, p, o), tz.next_token()
        raise RDFSyntaxError(f"unexpected token {tok.type} in N-tuple")

    def parse(self) -> List[Quad]:
        out: List[Quad] = []
        tz = self.tk
        tok = tz.next_token()
        while tok.type != T_EOF:
            s, tok = self._node(tok, tz)
            if s.kind not in ("iri", "bnode"):
                raise RDFSyntaxError(f"{s.kind} as subject")
            p, tok = self._node(tok, tz)
            if p.kind != "iri":
                raise RDFSyntaxError("predicate must be an IRI")
            o, tok = self._node(tok, tz)
            g: Optional[Term] = None
            if self.quads and tok.type != T_DOT:
                g, tok = self._node(tok, tz)
                if g.kind not in ("iri", "bnode"):
                    raise RDFSyntaxError(f"{g.kind} as graph name")
            if tok.type != T_DOT:
                raise RDFSyntaxError(f"expected '.' at end of statement, got {tok.type}")
            out.append((g.nt() if g else None, s.nt(), p.nt(), o.nt()))
            tok = tz.next_token()
        return out


# ---------------------------------------------------------------------------
# Line fast path.  N-Triples/N-Quads are line-oriented by grammar
# (ntriplesDoc ::= triple? (EOL triple)*), so the overwhelmingly common
# statement shape is matched with ONE compiled regex per line and encoded
# with zero per-token Python dispatch.  The character classes are strict
# SUBSETS of the token grammar AND of the canonical encoder's no-escaping
# classes, so a matched line needs no unescape and no re-escape — the
# captured text IS the canonical encoding.  Any line outside the subset
# (escape sequences, exotic bnode labels, triple terms, multi-line or
# multi-statement layouts, syntax errors) sends the WHOLE document to the
# tokenizer parser, which keeps acceptance and error behavior identical.
# ---------------------------------------------------------------------------

_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*:"          # absolute-IRI requirement
_IRI_C = r'[^\x00-\x20<>"{}|^`\\\x7f]'          # no escapes, no re-escaping
_BN = r"[A-Za-z_0-9][A-Za-z_0-9\-]*"            # subset of BLANK_NODE_LABEL
_LIT_C = r'[^\x00-\x1f"\\\x7f]'                 # encoder-safe verbatim chars
_LANG = r"[A-Za-z]{1,8}(?:-[A-Za-z0-9]{1,8})*(?:--(?:ltr|rtl))?"

_FAST_LINE = re.compile(
    rf"^[ \t]*"
    rf"(?:<({_SCHEME}{_IRI_C}*)>|_:({_BN}))[ \t]+"
    rf"<({_SCHEME}{_IRI_C}*)>[ \t]+"
    rf'(?:<({_SCHEME}{_IRI_C}*)>|_:({_BN})'
    rf'|"({_LIT_C}*)"(?:@({_LANG})|\^\^<({_SCHEME}{_IRI_C}*)>)?)'
    rf"(?:[ \t]+(?:<({_SCHEME}{_IRI_C}*)>|_:({_BN})))?"
    rf"[ \t]*\.[ \t]*(?:#.*)?$"
)
_BLANK_LINE = re.compile(r"^[ \t]*(?:#.*)?$")
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
# explicit rdf:langString/dirLangString datatypes require a language tag
# (rejected by mk_literal; rdf12 ntriples-langdir-bad-3/-5)
_LANGSTRING_DTS = frozenset((_RDF_NS + "langString", _RDF_NS + "dirLangString"))


def _parse_fast(
    text: str, alloc: BNodeAllocator, quads: bool
) -> Optional[List[Quad]]:
    """All-lines-match fast parse, or None → caller falls back."""
    out: List[Quad] = []
    match = _FAST_LINE.match
    blank = _BLANK_LINE.match
    get = alloc.get
    for line in text.split("\n"):
        if line.endswith("\r"):
            line = line[:-1]
        if not line or blank(line):
            continue
        m = match(line)
        if m is None:
            return None
        s_i, s_b, p_i, o_i, o_b, o_l, lang, dt, g_i, g_b = m.groups()
        if not quads and (g_i is not None or g_b is not None):
            return None  # trailing graph term: let the strict parser error
        s = f"<{s_i}>" if s_i is not None else "_:" + get(s_b)
        p = f"<{p_i}>"
        if o_i is not None:
            o = f"<{o_i}>"
        elif o_b is not None:
            o = "_:" + get(o_b)
        elif lang is not None:
            o = f'"{o_l}"@{canonical_langtag(lang)}'
        elif dt is not None:
            if dt in _LANGSTRING_DTS:
                return None  # needs a language tag: strict parser errors
            if dt in _CDT_DTS:
                # cdt literals may carry document-scoped bnode labels:
                # let the strict parser relabel them
                return None
            o = f'"{o_l}"' if dt == XSD_STRING else f'"{o_l}"^^<{dt}>'
        else:
            o = f'"{o_l}"'
        if g_i is not None:
            g: Optional[str] = f"<{g_i}>"
        elif g_b is not None:
            g = "_:" + get(g_b)
        else:
            g = None
        out.append((g, s, p, o))
    return out


def parse_ntriples(text: str, alloc: BNodeAllocator) -> List[Triple]:
    fast = _parse_fast(text, alloc, quads=False)
    if fast is not None:
        return [(s, p, o) for _, s, p, o in fast]
    quads = _NTupleParser(text, alloc, quads=False).parse()
    return [(s, p, o) for _, s, p, o in quads]


def parse_nquads(text: str, alloc: BNodeAllocator) -> List[Quad]:
    fast = _parse_fast(text, alloc, quads=True)
    if fast is not None:
        return fast
    return _NTupleParser(text, alloc, quads=True).parse()
