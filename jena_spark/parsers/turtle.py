"""Turtle and TriG recursive-descent parsers.

Grammar semantics from the reference
(riot/lang/LangTurtle.java over riot/lang/LangTurtleBase.java:
directives :109-243, triples :244-560, predicateObjectList :582-667,
objectList :669-685, blank-node property lists :748-763, collection
expansion to rdf:first/rest/nil :767-811; TriG graph blocks
riot/lang/LangTriG.java:56-120), following the W3C Turtle/TriG grammars.

Term construction rules (riot/system/ParserProfileStd.java:291-360):
bare INTEGER→xsd:integer, DECIMAL→xsd:decimal, DOUBLE→xsd:double,
true/false→xsd:boolean, lexical forms kept exactly as written; IRIs
resolved against the in-scope base (RFC 3986 §5.2, resolution only);
undefined prefix is fatal.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..iri import IRIResolver
from ..skolem import BNodeAllocator

# cdt:List / cdt:Map datatype IRIs (lazy import of ..cdt at the use site
# keeps the parser import-light)
_CDT_DTS = (
    "http://w3id.org/awslabs/neptune/SPARQL-CDTs/List",
    "http://w3id.org/awslabs/neptune/SPARQL-CDTs/Map",
)
from ..terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    canonical_langtag,
    RDFSyntaxError,
    Term,
    mk_bnode,
    mk_iri,
    mk_literal,
    mk_tripleterm,
)
from .tokenizer import (
    T_AT_BASE,
    T_AT_PREFIX,
    T_BNODE,
    T_COMMA,
    T_DECIMAL,
    T_DOT,
    T_DOUBLE,
    T_EOF,
    T_HATHAT,
    T_INTEGER,
    T_IRI,
    T_KEYWORD,
    T_LANGTAG,
    T_LANN,
    T_LBRACE,
    T_LBRACKET,
    T_LPAREN,
    T_LQT,
    T_LTT,
    T_PNAME,
    T_RANN,
    T_RBRACE,
    T_RBRACKET,
    T_RPAREN,
    T_RQT,
    T_RTT,
    T_SEMI,
    T_STRING,
    T_TILDE,
    Token,
    Tokenizer,
)

Triple = Tuple[str, str, str]
Quad = Tuple[Optional[str], str, str, str]

# chars that force the canonical encoder to escape (the bulk token scan
# already excludes backslash, quotes-in-kind and newlines — only control
# chars like TAB remain possible inside a short string token)
import re as _fre
_CTRL_RE = _fre.compile(r"[\x00-\x1f\x7f]")

_RDF_TYPE_TERM = mk_iri(RDF_TYPE)
_RDF_NIL_TERM = mk_iri(RDF_NIL)
_RDF_FIRST_TERM = mk_iri(RDF_FIRST)
_RDF_REST_TERM = mk_iri(RDF_REST)


class _FastBail(Exception):
    """Fast-loop escape: statement outside the fast subset (module-level
    so the class is not rebuilt on every document parse)."""
# RDF 1.2 reification (LangTurtleBase reified triples / annotations)
_RDF_REIFIES_TERM = mk_iri(
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies"
)


class TurtleParser:
    """One-document parser.  ``trig=True`` adds GRAPH blocks and emits quads
    (graph None = default graph)."""

    def __init__(
        self,
        text: str,
        base: Optional[str],
        alloc: BNodeAllocator,
        trig: bool = False,
    ):
        self.tz = Tokenizer(text)
        self.resolver = IRIResolver(base)
        self.alloc = alloc
        self.trig = trig
        self.prefixes: dict[str, str] = {}
        self.out: List[Quad] = []
        self._enc_cache: dict = {}
        # token-text → Term caches: IRIs repeat (same base resolution) and
        # prefixed names repeat massively; cleared when @base/@prefix
        # changes the mapping mid-document
        self._iri_cache: dict = {}
        self._pn_cache: dict = {}
        self.graph: Optional[str] = None  # current graph term (encoded) or None
        self.tok: Token = self.tz.next_token()

    # -- token plumbing ------------------------------------------------------

    def _advance(self) -> Token:
        t = self.tok
        self.tok = self.tz.next_token()
        return t

    def _expect(self, ttype: str) -> Token:
        if self.tok.type != ttype:
            raise RDFSyntaxError(
                f"line {self.tok.line}: expected {ttype}, got {self.tok.type} {self.tok.value!r}"
            )
        return self._advance()

    # -- emit ----------------------------------------------------------------

    def _enc(self, t: Term) -> str:
        # terms repeat heavily within a document (same subject across a
        # predicateObjectList, same predicates everywhere) — memoize the
        # canonical encoding per parse
        e = self._enc_cache.get(t)
        if e is None:
            e = t.nt()
            self._enc_cache[t] = e
        return e

    def _emit(self, s: Term, p: Term, o: Term) -> None:
        self.out.append((self.graph, self._enc(s), self._enc(p), self._enc(o)))

    # -- entry ---------------------------------------------------------------

    def parse(self) -> List[Quad]:
        toks = self.tz._toks
        if toks is not None and not self.trig:
            return self._parse_fast(toks)
        while self.tok.type != T_EOF:
            self._statement()
        return self.out

    # -- statement-level fast loop ---------------------------------------
    #
    # When the bulk token scan succeeded (Turtle mode), the dominant
    # statement shape — subject + predicateObjectList of plain IRIs,
    # prefixed names, bnode labels, and short literals — is emitted by
    # one tight loop over the token array: no recursive descent, no Term
    # objects, no per-token next_token() dispatch.  ANY token outside
    # the subset (directives, [ ] property lists, ( ) collections,
    # << >> reification, ~ / {| |} annotations, long strings, escapes,
    # CDT literals) rolls the current statement back and re-runs it
    # through the generic recursive-descent path, so acceptance, output
    # and error behavior stay identical — only the speed differs.
    # (The same design as the N-Triples line fast path; the reference's
    # hand-tuned scanner is riot/tokens/TokenizerText.java.)

    def _slow_stmt(self, toks, j0: int) -> int:
        """Run ONE statement at token index j0 through the generic path;
        returns the index of the next unconsumed token."""
        self.tz._tpos = j0 + 1
        self.tok = toks[j0]
        self._statement()
        if self.tok.type == T_EOF:
            return len(toks) - 1
        return self.tz._tpos - 1

    def _parse_fast(self, toks) -> List[Quad]:
        out = self.out
        append = out.append
        alloc = self.alloc
        alloc_get = self.alloc.get
        alloc_fresh = self.alloc.fresh
        prefixes = self.prefixes
        resolver = self.resolver
        ic: dict = {}   # IRI token text → encoded term
        pc: dict = {}   # (prefix, local) → encoded term
        lc: dict = {}   # raw langtag → canonical form
        ctrl = _CTRL_RE.search
        rdf_type = "<" + RDF_TYPE + ">"
        int_suf = f'"^^<{XSD_INTEGER}>'
        dec_suf = f'"^^<{XSD_DECIMAL}>'
        dbl_suf = f'"^^<{XSD_DOUBLE}>'
        bool_suf = f'"^^<{XSD_BOOLEAN}>'
        xsd_string = XSD_STRING

        _Bail = _FastBail

        def iri_enc(t):
            v = t.value
            e = ic.get(v)
            if e is None:
                e = mk_iri(resolver.resolve(v)).nt()
                ic[v] = e
            return e

        def pn_enc(t):
            key = (t.value, t.value2)
            e = pc.get(key)
            if e is None:
                ns = prefixes.get(t.value)
                if ns is None:
                    raise RDFSyntaxError(
                        f"line {t.line}: undefined prefix {t.value!r}:"
                    )
                e = mk_iri(ns + t.value2).nt()
                pc[key] = e
            return e

        rdf_first = "<" + RDF_FIRST + ">"
        rdf_rest = "<" + RDF_REST + ">"
        rdf_nil = "<" + RDF_NIL + ">"

        def simple_elem(j):
            """One SIMPLE collection element at index j → (encoded, next_j);
            _Bail on anything needing the generic path.  Token subset kept
            narrower than the main objectList (no langtag/datatype suffix
            checks) — strings here are bail-checked for cleanliness only."""
            t = toks[j]
            tt = t.type
            if tt == T_PNAME:
                return pn_enc(t), j + 1
            if tt == T_IRI:
                return iri_enc(t), j + 1
            if tt == T_BNODE:
                return "_:" + alloc_get(t.value), j + 1
            if tt == T_INTEGER:
                return '"' + t.value + int_suf, j + 1
            if tt == T_DECIMAL:
                return '"' + t.value + dec_suf, j + 1
            if tt == T_DOUBLE:
                return '"' + t.value + dbl_suf, j + 1
            if tt == T_KEYWORD and t.value in ("true", "false"):
                return '"' + t.value + bool_suf, j + 1
            if (
                tt == T_STRING
                and t.value2 == '"'
                and ctrl(t.value) is None
                and toks[j + 1].type not in (T_LANGTAG, T_HATHAT)
            ):
                return '"' + t.value + '"', j + 1
            raise _Bail

        j = self.tz._tpos - 1
        while True:
            t = toks[j]
            tt = t.type
            if tt == T_EOF:
                break
            j0 = j
            n0 = len(out)
            c0 = alloc.counter  # fresh() savepoint: rollback-safe [] / ()
            try:
                # ---- directives (the common @prefix/@base and the
                # SPARQL-style keyword forms; anything irregular bails so
                # error behavior stays byte-identical to the slow path)
                if tt == T_AT_PREFIX or (
                    tt == T_KEYWORD and t.value.lower() == "prefix"
                ):
                    pt, it, dt_ = toks[j + 1], toks[j + 2], toks[j + 3]
                    if (
                        pt.type != T_PNAME or pt.value2 != ""
                        or it.type != T_IRI
                        or (tt == T_AT_PREFIX) != (dt_.type == T_DOT)
                    ):
                        raise _Bail
                    prefixes[pt.value] = resolver.resolve(it.value)
                    pc.clear()
                    self._pn_cache.clear()
                    j += 4 if tt == T_AT_PREFIX else 3
                    continue
                if tt == T_AT_BASE or (
                    tt == T_KEYWORD and t.value.lower() == "base"
                ):
                    it, dt_ = toks[j + 1], toks[j + 2]
                    if it.type != T_IRI or (tt == T_AT_BASE) != (
                        dt_.type == T_DOT
                    ):
                        raise _Bail
                    resolver.set_base(it.value)
                    ic.clear()
                    self._iri_cache.clear()
                    j += 3 if tt == T_AT_BASE else 2
                    continue
                # ---- subject
                if tt == T_PNAME:
                    s = pn_enc(t)
                elif tt == T_IRI:
                    s = iri_enc(t)
                elif tt == T_BNODE:
                    s = "_:" + alloc_get(t.value)
                elif tt == T_LBRACKET and toks[j + 1].type == T_RBRACKET:
                    # ANON subject ('[] p o .'); a bare '[] .' statement
                    # or a property list bails to the generic path
                    s = "_:" + alloc_fresh()
                    j += 1
                else:
                    raise _Bail
                j += 1
                # ---- predicateObjectList
                while True:
                    t = toks[j]
                    tt = t.type
                    if tt == T_PNAME:
                        p = pn_enc(t)
                    elif tt == T_IRI:
                        p = iri_enc(t)
                    elif tt == T_KEYWORD and t.value == "a":
                        p = rdf_type
                    else:
                        raise _Bail
                    j += 1
                    while True:  # objectList
                        t = toks[j]
                        tt = t.type
                        if tt == T_PNAME:
                            o = pn_enc(t)
                            j += 1
                        elif tt == T_IRI:
                            o = iri_enc(t)
                            j += 1
                        elif tt == T_STRING:
                            v = t.value
                            q = t.value2
                            clean = (
                                q == '"' and ctrl(v) is None
                            ) or (
                                q == "'" and '"' not in v and ctrl(v) is None
                            )
                            nx = toks[j + 1]
                            nxt = nx.type
                            if nxt == T_LANGTAG:
                                tag = nx.value
                                ct = lc.get(tag)
                                if ct is None:
                                    ct = canonical_langtag(tag)
                                    lc[tag] = ct
                                o = (
                                    f'"{v}"@{ct}' if clean
                                    else mk_literal(v, lang=tag).nt()
                                )
                                j += 2
                            elif nxt == T_HATHAT:
                                dtk = toks[j + 2]
                                if dtk.type == T_PNAME:
                                    dte = pn_enc(dtk)
                                elif dtk.type == T_IRI:
                                    dte = iri_enc(dtk)
                                else:
                                    raise _Bail
                                dtv = dte[1:-1]
                                if dtv in _CDT_DTS:
                                    raise _Bail  # needs bnode relabeling
                                if dtv == xsd_string and clean:
                                    o = f'"{v}"'
                                elif clean:
                                    o = f'"{v}"^^' + dte
                                else:
                                    o = mk_literal(v, datatype=dtv).nt()
                                j += 3
                            else:
                                o = f'"{v}"' if clean else mk_literal(v).nt()
                                j += 1
                        elif tt == T_INTEGER:
                            o = '"' + t.value + int_suf
                            j += 1
                        elif tt == T_DECIMAL:
                            o = '"' + t.value + dec_suf
                            j += 1
                        elif tt == T_DOUBLE:
                            o = '"' + t.value + dbl_suf
                            j += 1
                        elif tt == T_BNODE:
                            o = "_:" + alloc_get(t.value)
                            j += 1
                        elif tt == T_KEYWORD and t.value in ("true", "false"):
                            o = '"' + t.value + bool_suf
                            j += 1
                        elif tt == T_LBRACKET and toks[j + 1].type == T_RBRACKET:
                            o = "_:" + alloc_fresh()  # ANON object
                            j += 2
                        elif tt == T_LPAREN:
                            # collection of SIMPLE elements → rdf:first/rest
                            # chain, fresh()-order and emit-order identical
                            # to _collection (LangTurtleBase.java:767-811)
                            j += 1
                            if toks[j].type == T_RPAREN:
                                o = rdf_nil
                                j += 1
                            else:
                                cur = o = "_:" + alloc_fresh()
                                first_el = True
                                while toks[j].type != T_RPAREN:
                                    if not first_el:
                                        nxt = "_:" + alloc_fresh()
                                        append((None, cur, rdf_rest, nxt))
                                        cur = nxt
                                    e, j = simple_elem(j)
                                    append((None, cur, rdf_first, e))
                                    first_el = False
                                j += 1
                                append((None, cur, rdf_rest, rdf_nil))
                        else:
                            raise _Bail
                        append((None, s, p, o))
                        t = toks[j]
                        tt = t.type
                        if tt == T_COMMA:
                            j += 1
                            continue
                        break
                    if tt == T_SEMI:
                        j += 1
                        while toks[j].type == T_SEMI:
                            j += 1
                        if toks[j].type == T_DOT:
                            j += 1
                            break
                        continue
                    if tt == T_DOT:
                        j += 1
                        break
                    raise _Bail
            except (_Bail, IndexError):
                # IndexError = lookahead past the EOF sentinel on a
                # malformed tail — same treatment: replay through the
                # generic path for the exact error message.
                del out[n0:]
                alloc.counter = c0  # un-allocate fresh() bnodes of the
                # rolled-back attempt so the replay reissues them
                j = self._slow_stmt(toks, j0)
                # a directive may have changed prefixes/base: local
                # encodings are stale (rare path — rebuild lazily)
                ic.clear()
                pc.clear()
        self.tz._tpos = len(toks) - 1
        self.tok = toks[-1]
        return out

    def _statement(self) -> None:
        t = self.tok
        if t.type == T_AT_PREFIX:
            self._advance()
            self._directive_prefix(at_form=True)
            return
        if t.type == T_AT_BASE:
            self._advance()
            self._directive_base(at_form=True)
            return
        if t.type == T_LANGTAG and t.value == "version":
            # '@version "1.2"' — the tokenizer lexes '@version' as a
            # langtag; accepted (and ignored) as a directive, '.'-form
            self._advance()
            self._version_string()
            self._expect(T_DOT)
            return
        if t.type == T_KEYWORD:
            kw = t.value.lower()
            if kw == "prefix":
                self._advance()
                self._directive_prefix(at_form=False)
                return
            if kw == "base":
                self._advance()
                self._directive_base(at_form=False)
                return
            if kw == "version":
                # Turtle 1.2 VERSION directive (case-insensitive, no dot)
                self._advance()
                self._version_string()
                if self.tok.type == T_DOT:
                    raise RDFSyntaxError("VERSION takes no '.'")
                return
            if self.trig and kw == "graph":
                self._advance()
                self._trig_graph_block()
                return
            # else fall through: bare keyword can't start triples (true/false
            # are not subjects; 'a' is not a subject)
            raise RDFSyntaxError(f"line {t.line}: unexpected keyword {t.value!r}")
        if self.trig:
            self._trig_block()
        else:
            self._triples()
            self._expect(T_DOT)

    # -- directives ------------------------------------------------------

    def _version_string(self) -> None:
        t = self._expect(T_STRING)
        if t.value2 not in ('"', "'"):
            raise RDFSyntaxError("VERSION takes a short quoted string")

    def _directive_prefix(self, at_form: bool) -> None:
        t = self._expect(T_PNAME)
        if t.value2 != "":
            raise RDFSyntaxError(f"line {t.line}: bad prefix declaration")
        iri_tok = self._expect(T_IRI)
        self.prefixes[t.value] = self.resolver.resolve(iri_tok.value)
        self._pn_cache.clear()  # mapping changed: cached pname Terms stale
        if at_form:
            self._expect(T_DOT)
        elif self.tok.type == T_DOT:
            raise RDFSyntaxError("SPARQL-style PREFIX takes no '.'")

    def _directive_base(self, at_form: bool) -> None:
        iri_tok = self._expect(T_IRI)
        self.resolver.set_base(iri_tok.value)
        self._iri_cache.clear()  # base changed: cached resolutions stale
        if at_form:
            self._expect(T_DOT)
        elif self.tok.type == T_DOT:
            raise RDFSyntaxError("SPARQL-style BASE takes no '.'")

    # -- TriG blocks -------------------------------------------------------

    def _trig_graph_block(self) -> None:
        # GRAPH labelOrSubject { ... }
        g = self._label_or_subject()
        self._wrapped_graph(g)

    def _trig_block(self) -> None:
        t = self.tok
        if t.type == T_LBRACE:
            self._wrapped_graph(None)
            return
        if t.type == T_LBRACKET:
            # could be an ANON graph label ("[] { ... }") or a blank-node
            # property list subject — disambiguate on "[]" + "{"
            # peek: ANON is LBRACKET immediately followed by RBRACKET
            self._advance()
            if self.tok.type == T_RBRACKET:
                self._advance()
                anon = mk_bnode(self.alloc.fresh())
                if self.tok.type == T_LBRACE:
                    self._wrapped_graph(anon)
                    return
                # "[] <p> <o> ." — ANON subject with predicateObjectList
                self._predicate_object_list(anon)
                self._expect(T_DOT)
                return
            # non-empty property list subject: parse its contents now
            node = mk_bnode(self.alloc.fresh())
            self._predicate_object_list(node)
            self._expect(T_RBRACKET)
            if self.tok.type not in (T_DOT,):
                self._predicate_object_list(node)
            self._expect(T_DOT)
            return
        if t.type in (T_IRI, T_PNAME, T_BNODE):
            node = self._label_or_subject()
            if self.tok.type == T_LBRACE:
                self._wrapped_graph(node)
                return
            # plain triples in the default graph starting from this subject
            self._predicate_object_list(node)
            self._expect(T_DOT)
            return
        # triples2: bnode property list / collection subject in default graph
        self._triples()
        self._expect(T_DOT)

    def _label_or_subject(self) -> Term:
        t = self.tok
        if t.type == T_IRI or t.type == T_PNAME:
            return self._iri_node()
        if t.type == T_BNODE:
            self._advance()
            return mk_bnode(self.alloc.get(t.value))
        if t.type == T_LBRACKET:
            # ANON graph label: "GRAPH [] { ... }"
            self._advance()
            self._expect(T_RBRACKET)
            return mk_bnode(self.alloc.fresh())
        raise RDFSyntaxError(f"line {t.line}: expected graph label or subject")

    def _wrapped_graph(self, gnode: Optional[Term]) -> None:
        prev = self.graph
        self.graph = gnode.nt() if gnode is not None else None
        self._expect(T_LBRACE)
        # triplesBlock: triples ('.' triplesBlock?)?
        while self.tok.type != T_RBRACE:
            self._triples()
            if self.tok.type == T_DOT:
                self._advance()
            elif self.tok.type != T_RBRACE:
                raise RDFSyntaxError(
                    f"line {self.tok.line}: expected '.' or '}}' in graph block"
                )
        self._advance()  # consume '}'
        self.graph = prev

    # -- Turtle core -------------------------------------------------------

    def _triples(self) -> None:
        t = self.tok
        if t.type == T_LBRACKET:
            subj = self._blank_node_property_list_or_anon()
            # predicateObjectList is optional after a [...] subject
            if self.tok.type not in (T_DOT, T_RBRACE):
                self._predicate_object_list(subj)
            return
        if t.type == T_LPAREN:
            subj = self._collection()
            self._predicate_object_list(subj)
            return
        reified_subj = t.type == T_LQT
        subj = self._subject()
        if reified_subj and self.tok.type in (T_DOT, T_RBRACE):
            return  # "<<:s :p :o>> ." — the reifies triple alone is legal
        self._predicate_object_list(subj)

    def _subject(self) -> Term:
        t = self.tok
        if t.type == T_IRI or t.type == T_PNAME:
            return self._iri_node()
        if t.type == T_BNODE:
            self._advance()
            return mk_bnode(self.alloc.get(t.value))
        if t.type == T_LQT:
            # reified triple as subject: "<<:s :p :o>> :q :z ."
            return self._reified_triple()
        raise RDFSyntaxError(f"line {t.line}: bad subject token {t.type}")

    def _predicate_object_list(self, subj: Term) -> None:
        while True:
            pred = self._verb()
            self._object_list(subj, pred)
            if self.tok.type != T_SEMI:
                return
            while self.tok.type == T_SEMI:
                self._advance()
            # after ';' the next verb is optional (trailing semicolons)
            if self.tok.type in (T_DOT, T_RBRACKET, T_RBRACE, T_RANN):
                return

    def _verb(self) -> Term:
        t = self.tok
        if t.type == T_KEYWORD and t.value == "a":
            self._advance()
            return _RDF_TYPE_TERM
        if t.type == T_IRI or t.type == T_PNAME:
            return self._iri_node()
        raise RDFSyntaxError(f"line {t.line}: bad predicate token {t.type} {t.value!r}")

    def _object_list(self, subj: Term, pred: Term) -> None:
        while True:
            obj = self._object()
            self._emit(subj, pred, obj)
            self._annotations(subj, pred, obj)
            if self.tok.type != T_COMMA:
                return
            self._advance()

    def _annotations(self, subj: Term, pred: Term, obj: Term) -> None:
        """RDF 1.2 annotation syntax after an object:
        ``~reifier`` and/or ``{| predicateObjectList |}`` blocks
        (LangTurtleBase.java:686-745).  Each emits
        (reifier, rdf:reifies, <<( s p o )>>); an annotation block
        following a ``~reifier`` reuses that reifier."""
        cur: Optional[Term] = None
        while self.tok.type in (T_TILDE, T_LANN):
            if self.tok.type == T_TILDE:
                self._advance()
                if self.tok.type in (T_IRI, T_PNAME):
                    cur = self._iri_node()
                elif self.tok.type == T_BNODE:
                    t = self._advance()
                    cur = mk_bnode(self.alloc.get(t.value))
                else:
                    cur = mk_bnode(self.alloc.fresh())
                self._emit(cur, _RDF_REIFIES_TERM, mk_tripleterm(subj, pred, obj))
            else:
                self._advance()  # '{|'
                if cur is None:
                    cur = mk_bnode(self.alloc.fresh())
                    self._emit(
                        cur, _RDF_REIFIES_TERM, mk_tripleterm(subj, pred, obj)
                    )
                self._predicate_object_list(cur)
                self._expect(T_RANN)
                cur = None  # a further block gets its own fresh reifier

    def _reified_triple(self) -> Term:
        """``<< s p o (~ r)? >>`` — allocates (or takes) a reifier term R,
        emits (R, rdf:reifies, <<( s p o )>>) and returns R.  The base
        triple is NOT asserted (turtle12-eval-rt-01)."""
        self._expect(T_LQT)
        s = self._rt_term(subject=True)
        p = self._verb()
        o = self._rt_term(subject=False)
        reifier: Optional[Term] = None
        if self.tok.type == T_TILDE:
            self._advance()
            if self.tok.type in (T_IRI, T_PNAME):
                reifier = self._iri_node()
            elif self.tok.type == T_BNODE:
                t = self._advance()
                reifier = mk_bnode(self.alloc.get(t.value))
        if reifier is None:
            reifier = mk_bnode(self.alloc.fresh())
        self._expect(T_RQT)
        self._emit(reifier, _RDF_REIFIES_TERM, mk_tripleterm(s, p, o))
        return reifier

    def _triple_term(self) -> Term:
        """``<<( s p o )>>`` — a term (object position only)."""
        self._expect(T_LTT)
        s = self._rt_term(subject=True, allow_reified=False)
        p = self._verb()
        o = self._rt_term(subject=False, allow_reified=False)
        self._expect(T_RTT)
        return mk_tripleterm(s, p, o)

    def _rt_term(self, subject: bool, allow_reified: bool = True) -> Term:
        """A term inside ``<< … >>`` / ``<<( … )>>``: IRI or bnode;
        objects may also be literals, triple terms, or (in reified
        triples) nested reified triples."""
        t = self.tok
        if t.type in (T_IRI, T_PNAME):
            return self._iri_node()
        if t.type == T_BNODE:
            self._advance()
            return mk_bnode(self.alloc.get(t.value))
        if t.type == T_LBRACKET:
            # ANON only — a property list inside a triple term is illegal
            self._advance()
            self._expect(T_RBRACKET)
            return mk_bnode(self.alloc.fresh())
        if allow_reified and t.type == T_LQT:
            # rtSubject and rtObject both admit a nested reified triple
            return self._reified_triple()
        if not subject:
            if t.type == T_LTT:
                return self._triple_term()
            if t.type == T_STRING:
                return self._rdf_literal()
            if t.type == T_INTEGER:
                self._advance()
                return mk_literal(t.value, datatype=XSD_INTEGER)
            if t.type == T_DECIMAL:
                self._advance()
                return mk_literal(t.value, datatype=XSD_DECIMAL)
            if t.type == T_DOUBLE:
                self._advance()
                return mk_literal(t.value, datatype=XSD_DOUBLE)
            if t.type == T_KEYWORD and t.value in ("true", "false"):
                self._advance()
                return mk_literal(t.value, datatype=XSD_BOOLEAN)
        raise RDFSyntaxError(
            f"line {t.line}: bad term {t.type} inside reified/triple term"
        )

    def _object(self) -> Term:
        t = self.tok
        if t.type == T_IRI or t.type == T_PNAME:
            return self._iri_node()
        if t.type == T_BNODE:
            self._advance()
            return mk_bnode(self.alloc.get(t.value))
        if t.type == T_LBRACKET:
            return self._blank_node_property_list_or_anon()
        if t.type == T_LPAREN:
            return self._collection()
        if t.type == T_STRING:
            return self._rdf_literal()
        if t.type == T_INTEGER:
            self._advance()
            return mk_literal(t.value, datatype=XSD_INTEGER)
        if t.type == T_DECIMAL:
            self._advance()
            return mk_literal(t.value, datatype=XSD_DECIMAL)
        if t.type == T_DOUBLE:
            self._advance()
            return mk_literal(t.value, datatype=XSD_DOUBLE)
        if t.type == T_KEYWORD and t.value in ("true", "false"):
            self._advance()
            return mk_literal(t.value, datatype=XSD_BOOLEAN)
        if t.type == T_LTT:
            return self._triple_term()
        if t.type == T_LQT:
            return self._reified_triple()
        raise RDFSyntaxError(f"line {t.line}: bad object token {t.type} {t.value!r}")

    def _rdf_literal(self) -> Term:
        t = self._advance()  # STRING
        if self.tok.type == T_LANGTAG:
            lt = self._advance()
            return mk_literal(t.value, lang=lt.value)
        if self.tok.type == T_HATHAT:
            self._advance()
            dt = self._iri_node()
            lex = t.value
            if dt.lex in _CDT_DTS:
                # bnode labels inside cdt:List/Map literals share the
                # document scope (SPARQL-CDTs bnodes suite; riot does
                # the same) — rewrite them with this document's allocator
                from ..cdt import CdtError, relabel_bnodes

                try:
                    lex = relabel_bnodes(lex, self.alloc.get)
                except CdtError:
                    pass  # ill-formed composite: keep verbatim
            return mk_literal(lex, datatype=dt.lex)
        return mk_literal(t.value)

    def _iri_node(self) -> Term:
        t = self._advance()
        if t.type == T_IRI:
            term = self._iri_cache.get(t.value)
            if term is None:
                term = mk_iri(self.resolver.resolve(t.value))
                self._iri_cache[t.value] = term
            return term
        # PNAME
        key = (t.value, t.value2)
        term = self._pn_cache.get(key)
        if term is None:
            ns = self.prefixes.get(t.value)
            if ns is None:
                raise RDFSyntaxError(f"line {t.line}: undefined prefix {t.value!r}:")
            term = mk_iri(ns + t.value2)
            self._pn_cache[key] = term
        return term

    def _blank_node_property_list_or_anon(self) -> Term:
        self._expect(T_LBRACKET)
        node = mk_bnode(self.alloc.fresh())
        if self.tok.type == T_RBRACKET:
            self._advance()
            return node
        self._predicate_object_list(node)
        self._expect(T_RBRACKET)
        return node

    def _collection(self) -> Term:
        """(...) expands to rdf:first/rdf:rest/rdf:nil chains with fresh
        bnodes (reference: LangTurtleBase.java:767-811)."""
        self._expect(T_LPAREN)
        if self.tok.type == T_RPAREN:
            self._advance()
            return _RDF_NIL_TERM
        head = mk_bnode(self.alloc.fresh())
        cur = head
        first = True
        while self.tok.type != T_RPAREN:
            if not first:
                nxt = mk_bnode(self.alloc.fresh())
                self._emit(cur, _RDF_REST_TERM, nxt)
                cur = nxt
            obj = self._object()
            self._emit(cur, _RDF_FIRST_TERM, obj)
            first = False
        self._advance()  # ')'
        self._emit(cur, _RDF_REST_TERM, _RDF_NIL_TERM)
        return head


def parse_turtle(
    text: str, base: Optional[str], alloc: BNodeAllocator
) -> List[Triple]:
    quads = TurtleParser(text, base, alloc, trig=False).parse()
    return [(s, p, o) for _, s, p, o in quads]


def parse_trig(text: str, base: Optional[str], alloc: BNodeAllocator) -> List[Quad]:
    return TurtleParser(text, base, alloc, trig=True).parse()
