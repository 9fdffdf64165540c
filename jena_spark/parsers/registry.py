"""Language detection + per-document parse dispatch.

Mirrors the reference registry (riot/RDFLanguages.java:69-161 — extension
mapping; riot/RDFParser.java:452-488 — open/dispatch) with one pipeline
addition: a cheap *content sniff* stage so that non-RDF repository files
never reach the expensive parse UDF (SURVEY.md §2.1 "Detection").
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from ..skolem import BNodeAllocator, doc_seed
from ..terms import RDFSyntaxError
from .ntriples import parse_ntriples, parse_nquads
from .turtle import parse_turtle, parse_trig
from .rdfxml import parse_rdfxml
from .jsonld import parse_jsonld
from .rdfjson import parse_rdfjson, parse_trix
from .binrdf import parse_rdf_thrift, parse_rdf_protobuf

Quad = Tuple[Optional[str], str, str, str]

# extension → language (riot/RDFLanguages.java:69-161)
EXT_TO_LANG = {
    "ttl": "turtle",
    "nt": "ntriples",
    "nq": "nquads",
    "trig": "trig",
    "rdf": "rdfxml",
    "owl": "rdfxml",
    "xml": "rdfxml",
    "jsonld": "jsonld",
    "rj": "rdfjson",
    "trix": "trix",
    # binary wire formats (riot/RDFLanguages.java RDFTHRIFT/RDFPROTO
    # registrations); the string content column carries them latin-1-mapped
    "trdf": "rdfthrift",
    "rt": "rdfthrift",
    "rpb": "rdfprotobuf",
}

RDF_LANGS = set(EXT_TO_LANG.values())


def detect_lang(path: str, lang_hint: Optional[str] = None) -> Optional[str]:
    if lang_hint in RDF_LANGS:
        return lang_hint
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    return EXT_TO_LANG.get(ext)


def sniff(content: str, lang: str) -> bool:
    """Cheap pre-parse plausibility check (runs as a Spark column predicate
    before the UDF; duplicated here for direct callers)."""
    head = content[:4096]
    if lang in ("rdfxml", "trix"):
        return "<" in head
    if lang in ("jsonld", "rdfjson"):
        h = head.lstrip()
        return h.startswith("{") or h.startswith("[")
    return True  # turtle-family: no reliable sniff beyond extension


def parse_document(
    repo: str, path: str, commit: str, lang_hint: Optional[str], content: str
) -> Tuple[List[Quad], Optional[str]]:
    """Parse one document → (quads, error).  Parse errors yield
    ([], message): the whole document contributes zero triples, matching
    the reference's fatal-error policy (riot/system/ErrorHandlerFactory)."""
    lang = detect_lang(path, lang_hint)
    if lang is None:
        return [], "not-rdf"
    alloc = BNodeAllocator(doc_seed(repo, path, commit))
    base = f"file:///{repo}/{path}"
    try:
        if lang == "turtle":
            quads = [(None, s, p, o) for s, p, o in parse_turtle(content, base, alloc)]
        elif lang == "ntriples":
            quads = [(None, s, p, o) for s, p, o in parse_ntriples(content, alloc)]
        elif lang == "nquads":
            quads = parse_nquads(content, alloc)
        elif lang == "trig":
            quads = parse_trig(content, base, alloc)
        elif lang == "rdfxml":
            quads = [(None, s, p, o) for s, p, o in parse_rdfxml(content, base, alloc)]
        elif lang == "jsonld":
            quads = parse_jsonld(content, base, alloc)
        elif lang == "rdfjson":
            quads = [(None, s, p, o) for s, p, o in parse_rdfjson(content, base, alloc)]
        elif lang == "trix":
            quads = parse_trix(content, base, alloc)
        elif lang == "rdfthrift":
            quads = parse_rdf_thrift(content, alloc)
        elif lang == "rdfprotobuf":
            quads = parse_rdf_protobuf(content, alloc)
        else:
            return [], f"unsupported-lang:{lang}"
    except RDFSyntaxError as e:
        return [], f"syntax:{e}"
    except RecursionError:
        return [], "syntax:recursion-depth"
    return quads, None
