"""RDF term model and canonical N-Triples term codec.

This module is pure Python (no Spark imports) so it can run inside Arrow
pandas UDF workers with zero per-row JVM round-trips.

Semantics re-expressed from the reference (Apache Jena):

- Term identity is *lexical*: a literal is the tuple
  (lexical form, datatype IRI, language tag) and ``"1"^^xsd:integer`` is a
  different *term* from ``"01"^^xsd:integer``
  (reference: jena-core/.../graph/impl/LiteralLabel.java:499-519).
- Plain literals are xsd:string in RDF 1.1; the canonical N-Triples form
  omits ``^^<http://www.w3.org/2001/XMLSchema#string>``
  (reference: jena-arq/.../riot/out/NodeFmtLib.java:83-114).
- Language tags are case-normalized at node creation to RFC 5646
  canonical case (reference: jena-core/.../graph/NodeFactory.java:118 →
  jena-langtag/.../LangTags.java:81-111).
- Canonical serialization is N-Triples with the escape set of
  jena-base/.../atlas/lib/EscapeStr.java:37-142.

The canonical *storage* encoding used throughout the Spark pipeline is the
N-Triples string of the term: ``<iri>``, ``_:label``, ``"lex"``,
``"lex"@lang``, ``"lex"^^<dt>``.  P/R comparison against the reference is
then a plain string join.
"""

from __future__ import annotations

import re as _re
from typing import NamedTuple, Optional

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"
RDF_LANGSTRING = RDF_NS + "langString"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_TYPE = RDF_NS + "type"

# Term kinds
IRI = "iri"
BNODE = "bnode"
LITERAL = "literal"
TRIPLE_TERM = "triple"  # RDF 1.2 <<( s p o )>> — lex = encoded "s p o"


class Term(NamedTuple):
    """An RDF term: kind + lexical payload.

    For kind == IRI:     lex = the absolute IRI string.
    For kind == BNODE:   lex = the label (without the ``_:``).
    For kind == LITERAL: lex = the (escape-decoded) lexical form,
                         datatype = datatype IRI (None => xsd:string),
                         lang = canonical-case language tag or None.
    """

    kind: str
    lex: str
    datatype: Optional[str] = None
    lang: Optional[str] = None

    def nt(self) -> str:
        return encode_term(self)


class RDFSyntaxError(ValueError):
    """A parse error; the whole document yields zero triples (the
    reference's fatal error policy — riot/system/ErrorHandlerFactory)."""


# ---------------------------------------------------------------------------
# String escapes (reference: TokenizerText.java:1453-1506, EscapeStr.java)
# ---------------------------------------------------------------------------

_UNESCAPE_MAP = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

_HEX = set("0123456789abcdefABCDEF")


def unescape_string(s: str) -> str:
    """Decode Turtle/N-Triples string escapes (\\t \\b \\n \\r \\f \\" \\'
    \\\\ and \\uXXXX / \\UXXXXXXXX).  Raises RDFSyntaxError on bad escapes."""
    if "\\" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise RDFSyntaxError("trailing backslash in string")
        e = s[i + 1]
        if e in _UNESCAPE_MAP:
            out.append(_UNESCAPE_MAP[e])
            i += 2
        elif e == "u":
            out.append(_hex_escape(s, i + 2, 4))
            i += 6
        elif e == "U":
            out.append(_hex_escape(s, i + 2, 8))
            i += 10
        else:
            raise RDFSyntaxError(f"illegal string escape \\{e}")
    return "".join(out)


def _hex_escape(s: str, start: int, width: int) -> str:
    end = start + width
    if end > len(s):
        raise RDFSyntaxError("short \\u escape")
    h = s[start:end]
    if any(ch not in _HEX for ch in h):
        raise RDFSyntaxError(f"bad \\u escape: {h!r}")
    cp = int(h, 16)
    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        raise RDFSyntaxError(f"illegal codepoint in escape: {h}")
    return chr(cp)


def unescape_iri(s: str) -> str:
    """Inside ``<...>`` only \\uXXXX and \\UXXXXXXXX are allowed
    (reference: TokenizerText.java:725-773)."""
    if "\\" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise RDFSyntaxError("trailing backslash in IRI")
        e = s[i + 1]
        if e == "u":
            out.append(_hex_escape(s, i + 2, 4))
            i += 6
        elif e == "U":
            out.append(_hex_escape(s, i + 2, 8))
            i += 10
        else:
            raise RDFSyntaxError(f"illegal IRI escape \\{e}")
    return "".join(out)


# Canonical N-Triples escaping: \n \r \t \f \b \" \\ named; other C0
# controls (and DEL) as \uXXXX.  Reference: EscapeStr.java:37-142 /
# NodeFmtLib.strNT.
_ESCAPE_MAP = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\f": "\\f",
    "\b": "\\b",
}


_LIT_UNSAFE_RE = _re.compile(r'[\x00-\x1f"\\\x7f]')
_IRI_UNSAFE_RE = _re.compile(r'[\x00-\x20<>"{}|^`\\\x7f]')


def escape_literal(s: str) -> str:
    if _LIT_UNSAFE_RE.search(s) is None:  # fast path: nothing to escape
        return s
    out = []
    for ch in s:
        esc = _ESCAPE_MAP.get(ch)
        if esc is not None:
            out.append(esc)
        else:
            cp = ord(ch)
            if cp < 0x20 or cp == 0x7F:
                out.append(f"\\u{cp:04X}")
            else:
                out.append(ch)
    return "".join(out)


def escape_iri_for_output(s: str) -> str:
    if _IRI_UNSAFE_RE.search(s) is None:  # fast path
        return s
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x20 or ch in '<>"{}|^`\\' or cp == 0x7F:
            out.append(f"\\u{cp:04X}")
        else:
            out.append(ch)
    return "".join(out)


# ---------------------------------------------------------------------------
# Language tags (reference: LangTags.basicFormat, LangTags.java:81-111)
# ---------------------------------------------------------------------------

# RFC 5646 well-formedness, as enforced by the Turtle LANGTAG production
# [a-zA-Z]+('-'[a-zA-Z0-9]+)*  — the tokenizer-level check; full RFC 5646
# validation is not done at parse time in the reference either.
_LANGTAG_RE = _re.compile(r"^[A-Za-z]{1,8}(-[A-Za-z0-9]{1,8})*$")


def canonical_langtag(tag: str) -> str:
    """RFC 5646 canonical case: language lowercase, then per-subtag by
    length (2 => UPPER, 4 => Title, else lower); everything after a
    singleton subtag is lowercase.  Mirrors LangTags.basicFormat
    (jena-langtag/.../LangTags.java:81-111, InternalLangTag.strcase).

    RDF 1.2 dir-lang: a ``--ltr`` / ``--rtl`` suffix (initial text
    direction, ParserProfileStd.java:335-343) is validated case-
    sensitively and preserved after the canonicalized language tag."""
    if "--" in tag:
        tag, _, direction = tag.partition("--")
        if direction not in ("ltr", "rtl"):
            raise RDFSyntaxError(
                f"bad base direction {direction!r} (must be ltr or rtl)"
            )
        return f"{canonical_langtag(tag)}--{direction}"
    if not _LANGTAG_RE.match(tag):
        raise RDFSyntaxError(f"bad language tag: {tag!r}")
    parts = tag.split("-")
    out = [parts[0].lower()]
    singleton = False
    for s in parts[1:]:
        if singleton:
            out.append(s.lower())
        else:
            if len(s) == 2:
                out.append(s.upper())
            elif len(s) == 4:
                out.append(s[0].upper() + s[1:].lower())
            else:
                out.append(s.lower())
            if len(s) == 1:
                singleton = True
    return "-".join(out)


# ---------------------------------------------------------------------------
# Term constructors (validated)
# ---------------------------------------------------------------------------

def mk_iri(iri: str) -> Term:
    return Term(IRI, iri)


def mk_bnode(label: str) -> Term:
    return Term(BNODE, label)


def mk_literal(
    lex: str, datatype: Optional[str] = None, lang: Optional[str] = None
) -> Term:
    if lang is not None:
        return Term(LITERAL, lex, RDF_LANGSTRING, canonical_langtag(lang))
    if datatype is None or datatype == XSD_STRING:
        return Term(LITERAL, lex, None, None)
    if datatype in (RDF_LANGSTRING, RDF_NS + "dirLangString"):
        # these datatypes exist only WITH a language tag (RDF 1.2
        # ntriples-langdir-bad-3/-5; Jena rejects the explicit form)
        raise RDFSyntaxError(
            f"literal typed {datatype} requires a language tag"
        )
    return Term(LITERAL, lex, datatype, None)


def mk_tripleterm(s: Term, p: Term, o: Term) -> Term:
    """RDF 1.2 triple term ``<<( s p o )>>`` (LangNTuple.java:138-144).
    Positional checks match the inner-triple grammar: subject ∈
    {IRI, bnode}, predicate ∈ {IRI}; object is any term (incl. a nested
    triple term)."""
    if s.kind not in (IRI, BNODE):
        raise RDFSyntaxError("triple-term subject must be an IRI or bnode")
    if p.kind != IRI:
        raise RDFSyntaxError("triple-term predicate must be an IRI")
    return Term(TRIPLE_TERM, f"{s.nt()} {p.nt()} {o.nt()}")


# ---------------------------------------------------------------------------
# Canonical N-Triples encoding / decoding of a single term
# ---------------------------------------------------------------------------

def encode_term(t: Term) -> str:
    if t.kind == IRI:
        return "<" + escape_iri_for_output(t.lex) + ">"
    if t.kind == BNODE:
        return "_:" + t.lex
    if t.kind == TRIPLE_TERM:
        return "<<(" + t.lex + ")>>"
    # literal
    body = '"' + escape_literal(t.lex) + '"'
    if t.lang is not None:
        return body + "@" + t.lang
    if t.datatype is None or t.datatype == XSD_STRING:
        return body
    return body + "^^<" + escape_iri_for_output(t.datatype) + ">"


def decode_term(s: str) -> Term:
    """Parse one canonical N-Triples term string back into a Term.
    Used by tests and by the golden-file comparator."""
    if s.startswith("<<(") and s.endswith(")>>"):
        return Term(TRIPLE_TERM, s[3:-3])
    if s.startswith("<") and s.endswith(">"):
        return Term(IRI, unescape_iri(s[1:-1]))
    if s.startswith("_:"):
        return Term(BNODE, s[2:])
    if s.startswith('"'):
        # find closing quote, honoring escapes
        i = 1
        n = len(s)
        while i < n:
            if s[i] == "\\":
                i += 2
                continue
            if s[i] == '"':
                break
            i += 1
        if i >= n:
            raise RDFSyntaxError(f"unterminated literal: {s!r}")
        lex = unescape_string(s[1:i])
        rest = s[i + 1 :]
        if not rest:
            return Term(LITERAL, lex, None, None)
        if rest.startswith("@"):
            return Term(LITERAL, lex, RDF_LANGSTRING, canonical_langtag(rest[1:]))
        if rest.startswith("^^<") and rest.endswith(">"):
            dt = unescape_iri(rest[3:-1])
            if dt == XSD_STRING:
                return Term(LITERAL, lex, None, None)
            return Term(LITERAL, lex, dt, None)
        raise RDFSyntaxError(f"bad literal suffix: {rest!r}")
    raise RDFSyntaxError(f"unparseable term: {s!r}")
