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

from typing import List, Optional, Tuple

from ..skolem import BNodeAllocator
from ..terms import (
    RDFSyntaxError,
    Term,
    mk_bnode,
    mk_iri,
    mk_literal,
    mk_tripleterm,
)
from ..iri import split_iri
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
                return (
                    mk_literal(tok.value, datatype=_iri_term(dt).lex),
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


def parse_ntriples(text: str, alloc: BNodeAllocator) -> List[Triple]:
    quads = _NTupleParser(text, alloc, quads=False).parse()
    return [(s, p, o) for _, s, p, o in quads]


def parse_nquads(text: str, alloc: BNodeAllocator) -> List[Quad]:
    return _NTupleParser(text, alloc, quads=True).parse()
