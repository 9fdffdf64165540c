"""RFC 3986 reference resolution, implemented exactly per §5.2.

The reference resolves relative IRIs at parse time with *resolution only,
no normalization* (Jena: riot/system/ParserProfileStd.java:86-120 →
jena-iri3986/.../AlgResolveIRI.java:41-180).  Python's ``urllib.parse.urljoin``
deviates on several corner cases exercised by the W3C fixtures
(``IRI-resolution-01/02/07/08.ttl``), so we implement the algorithm from the
spec: parse into (scheme, authority, path, query, fragment), merge paths,
remove_dot_segments, recompose.  No case folding, no percent-decoding —
resolution must preserve the spelling of every component it copies.
"""

from __future__ import annotations

import re
from typing import NamedTuple, Optional

from .terms import RDFSyntaxError

# RFC 3986 appendix B parsing regex.
_RFC3986_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.DOTALL,
)

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*$")


class IRIParts(NamedTuple):
    scheme: Optional[str]
    authority: Optional[str]
    path: str
    query: Optional[str]
    fragment: Optional[str]


def split_iri(iri: str) -> IRIParts:
    m = _RFC3986_RE.match(iri)
    if m is None:  # the regex matches everything; defensive
        raise RDFSyntaxError(f"unparseable IRI: {iri!r}")
    scheme, authority, path, query, fragment = m.groups()
    if scheme is not None and not _SCHEME_RE.match(scheme):
        # "a:b" where a is not a valid scheme — treat whole thing as path
        return IRIParts(None, None, iri, None, None)
    return IRIParts(scheme, authority, path or "", query, fragment)


def recompose(p: IRIParts) -> str:
    out = []
    if p.scheme is not None:
        out.append(p.scheme)
        out.append(":")
    if p.authority is not None:
        out.append("//")
        out.append(p.authority)
    out.append(p.path)
    if p.query is not None:
        out.append("?")
        out.append(p.query)
    if p.fragment is not None:
        out.append("#")
        out.append(p.fragment)
    return "".join(out)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    output: list[str] = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if output:
                output.pop()
        elif inp == "/..":
            inp = "/"
            if output:
                output.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            # move first path segment (up to but not including the next "/"
            # after the first char) from inp to output
            if inp.startswith("/"):
                j = inp.find("/", 1)
            else:
                j = inp.find("/")
            if j < 0:
                output.append(inp)
                inp = ""
            else:
                output.append(inp[:j])
                inp = inp[j:]
    return "".join(output)


def merge_paths(base: IRIParts, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base.authority is not None and base.path == "":
        return "/" + ref_path
    i = base.path.rfind("/")
    if i < 0:
        return ref_path
    return base.path[: i + 1] + ref_path


def resolve(base: str, ref: str) -> str:
    """RFC 3986 §5.2.2 transform-references (strict mode)."""
    b = split_iri(base)
    r = split_iri(ref)
    if r.scheme is not None:
        t = IRIParts(r.scheme, r.authority, remove_dot_segments(r.path), r.query, r.fragment)
    elif r.authority is not None:
        t = IRIParts(b.scheme, r.authority, remove_dot_segments(r.path), r.query, r.fragment)
    elif r.path == "":
        q = r.query if r.query is not None else b.query
        t = IRIParts(b.scheme, b.authority, b.path, q, r.fragment)
    elif r.path.startswith("/"):
        t = IRIParts(b.scheme, b.authority, remove_dot_segments(r.path), r.query, r.fragment)
    else:
        merged = merge_paths(b, r.path)
        t = IRIParts(b.scheme, b.authority, remove_dot_segments(merged), r.query, r.fragment)
    return recompose(t)


# ---------------------------------------------------------------------------
# IRI syntax checking — tokenizer-level rules from the reference
# (riot/tokens/TokenizerText.java:725-773, riot/system/Checker.java:60-127):
# space / tab / newline inside <...> is an error; < > " { } | ^ ` are
# excluded by the IRIREF production itself.
# ---------------------------------------------------------------------------

_BAD_IRI_CHARS = set(' \t\n\r<>"{}|^`')


def check_iri_chars(iri: str) -> None:
    for ch in iri:
        if ch in _BAD_IRI_CHARS or ord(ch) < 0x20:
            raise RDFSyntaxError(f"illegal character {ch!r} in IRI {iri!r}")


class IRIResolver:
    """Stateful resolver used by a single document parse: holds the current
    base (mutated by @base directives) and resolves/validates IRIs."""

    __slots__ = ("base",)

    def __init__(self, base: Optional[str] = None):
        self.base = base

    def resolve(self, iri: str) -> str:
        check_iri_chars(iri)
        parts = split_iri(iri)
        if parts.scheme is not None:
            # absolute: normalize the dot segments? No — resolution only
            # applies to relative refs; an absolute IRI is kept verbatim
            # (Jena keeps lexical form; dot-segment removal happens only
            # via the resolution path).
            return iri
        if self.base is None:
            raise RDFSyntaxError(f"relative IRI without base: {iri!r}")
        return resolve(self.base, iri)

    def set_base(self, iri: str) -> None:
        check_iri_chars(iri)
        parts = split_iri(iri)
        if parts.scheme is not None:
            self.base = iri
        else:
            if self.base is None:
                raise RDFSyntaxError(f"relative @base without outer base: {iri!r}")
            self.base = resolve(self.base, iri)
