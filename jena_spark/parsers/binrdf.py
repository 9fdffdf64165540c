"""RDF-Thrift and RDF-Protobuf binary RDF readers/writers (pure Python).

The reference ships two binary RDF wire formats whose schemas are public
Apache-licensed IDL files:

- RDF-Thrift: ``Grammar/RDF-Thrift/BinaryRDF.thrift:26-112`` — a stream of
  ``RDF_StreamRow`` unions (prefixDecl | triple | quad) serialized with the
  Thrift *compact* protocol (riot/thrift/TRDF.java:105 pins
  TCompactProtocol) back-to-back until EOF
  (riot/thrift/IteratorThriftRDF.java).
- RDF-Protobuf: ``Grammar/RDF-Protobuf/binary-rdf.proto:36-131`` — the same
  row model as proto3 messages, written length-delimited
  (``writeDelimitedTo``: varint byte-length + message,
  riot/protobuf/ProtobufRDF.java:76,129).

This module implements both wire encodings from the public Thrift
compact-protocol and protobuf encoding specifications — no thrift/protobuf
runtime is required — and converts rows to/from this repo's canonical
N-Triples term strings.

Term conversion mirrors riot/thrift/ThriftConvert.java:
- ``prefixName`` terms and ``dtPrefix`` datatypes expand through the prefix
  map accumulated from earlier ``prefixDecl`` rows in the same stream
  (Thrift2StreamRDF.java:66-69); an undeclared prefix is a fatal error.
- Value forms decode to typed literals (ThriftConvert.java:298-318):
  ``valInteger`` → ``str(v)^^xsd:integer``; ``valDouble`` →
  Java ``Double.toString`` lexical ``^^xsd:double`` (shortest round-trip
  digits, which matches modern JDKs); ``valDecimal(value, scale)`` →
  ``BigDecimal.valueOf(value, scale).toPlainString()^^xsd:decimal``.
- Simple/lang/dirlang literals carry no datatype field
  (ThriftConvert.java:187-192).  Thrift keeps ``langtag`` and
  ``baseDirection`` in separate fields; protobuf packs them as one
  ``langdir`` = ``"lang--dir"`` string (ProtobufConvert.java:186-196,365).
- ``variable`` / ``any`` / ``undefined`` / ``repeat`` terms are not graph
  data; they raise ``RDFSyntaxError`` here (documented divergence: Jena
  converts them to internal matcher nodes that are equally invalid in a
  stored graph).

Writers default to the reference's default format (no value encoding — the
``*_VALUES`` RDFFormat variants opt in; no prefix compaction unless a
prefix map is supplied, in which case ``prefixDecl`` rows are emitted
first).
"""

from __future__ import annotations

import functools
import math
import re
import struct as _struct
from typing import Dict, Iterable, List, Optional, Tuple

from ..skolem import BNodeAllocator
from ..terms import (
    IRI,
    BNODE,
    LITERAL,
    TRIPLE_TERM,
    RDF_NS,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    RDFSyntaxError,
    Term,
    decode_term,
    mk_bnode,
    mk_iri,
    mk_literal,
    mk_tripleterm,
)

Quad = Tuple[Optional[str], str, str, str]

_RDF_LANGSTRING = RDF_NS + "langString"
_RDF_DIRLANGSTRING = RDF_NS + "dirLangString"

_I64_MIN = -(1 << 63)
_I64_MAX = (1 << 63) - 1


# ---------------------------------------------------------------------------
# Shared lexical-form helpers (Java parity)
# ---------------------------------------------------------------------------

def _decimal_plain(value: int, scale: int) -> str:
    """``BigDecimal.valueOf(value, scale).toPlainString()``
    (ThriftConvert.java:313-317): unscaled-value × 10^-scale, never in
    exponent notation."""
    sign = "-" if value < 0 else ""
    s = str(abs(value))
    if scale <= 0:
        return sign + s + "0" * (-scale)
    if len(s) <= scale:
        s = "0" * (scale - len(s) + 1) + s
    return sign + s[:-scale] + "." + s[-scale:]


def _java_double_str(v: float) -> str:
    """Java ``Double.toString`` lexical form (ThriftConvert.java:306):
    plain decimal for 1e-3 <= |v| < 1e7, else ``D.DDDE±e`` scientific;
    always at least one fractional digit.  Digits are the shortest
    round-trip decimal (Python repr == JDK 19+ behavior)."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0:
        return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
    sign = "-" if v < 0 else ""
    r = repr(abs(v))
    if "e" in r:
        mant, _, exp_s = r.partition("e")
        exp = int(exp_s)
    else:
        mant, exp = r, 0
    ip, _, fp = mant.partition(".")
    raw = ip + fp
    digits = raw.lstrip("0")
    n_lead = len(raw) - len(digits)
    digits = digits.rstrip("0") or "0"
    # value == 0.<digits> * 10^pointpos
    pointpos = len(ip) + exp - n_lead
    d = pointpos - 1  # scientific exponent
    if -3 <= d <= 6:
        if pointpos <= 0:
            return sign + "0." + "0" * (-pointpos) + digits
        if pointpos >= len(digits):
            return sign + digits + "0" * (pointpos - len(digits)) + ".0"
        return sign + digits[:pointpos] + "." + digits[pointpos:]
    return sign + digits[0] + "." + (digits[1:] or "0") + "E" + str(d)


def _expand(pmap: Dict[str, str], prefix: str, local: str) -> str:
    base = pmap.get(prefix)
    if base is None:
        raise RDFSyntaxError(f"undeclared prefix in binary stream: {prefix!r}")
    return base + local


# ---------------------------------------------------------------------------
# Thrift compact protocol primitives
# (public Apache Thrift compact-protocol spec; doubles are 8-byte
# little-endian as in the Java implementation TRDF uses)
# ---------------------------------------------------------------------------

_T_STOP = 0x00
_T_BOOL_TRUE = 0x01
_T_BOOL_FALSE = 0x02
_T_BYTE = 0x03
_T_I16 = 0x04
_T_I32 = 0x05
_T_I64 = 0x06
_T_DOUBLE = 0x07
_T_BINARY = 0x08
_T_LIST = 0x09
_T_SET = 0x0A
_T_MAP = 0x0B
_T_STRUCT = 0x0C


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _varint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    shift = 0
    result = 0
    while True:
        if pos >= len(data):
            raise RDFSyntaxError("truncated varint in binary RDF stream")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise RDFSyntaxError("varint too long in binary RDF stream")


class _TReader:
    """Generic Thrift compact-protocol struct reader.

    Reads any struct into ``{field_id: value}`` with structs as nested
    dicts; the RDF schema is interpreted afterwards.  Unknown fields are
    retained/skipped harmlessly (forward compatibility)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def at_eof(self) -> bool:
        return self.pos >= len(self.data)

    def read_struct(self) -> Dict[int, object]:
        fields: Dict[int, object] = {}
        last_fid = 0
        while True:
            if self.pos >= len(self.data):
                raise RDFSyntaxError("truncated struct in thrift stream")
            head = self.data[self.pos]
            self.pos += 1
            if head == _T_STOP:
                return fields
            typ = head & 0x0F
            delta = head >> 4
            if delta:
                fid = last_fid + delta
            else:
                u, self.pos = _read_varint(self.data, self.pos)
                fid = _unzigzag(u)
            last_fid = fid
            fields[fid] = self._read_value(typ)

    def _read_value(self, typ: int) -> object:
        data, pos = self.data, self.pos
        if typ == _T_BOOL_TRUE:
            return True
        if typ == _T_BOOL_FALSE:
            return False
        if typ == _T_BYTE:
            if pos >= len(data):
                raise RDFSyntaxError("truncated byte in thrift stream")
            self.pos = pos + 1
            b = data[pos]
            return b - 256 if b >= 128 else b
        if typ in (_T_I16, _T_I32, _T_I64):
            u, self.pos = _read_varint(data, pos)
            return _unzigzag(u)
        if typ == _T_DOUBLE:
            if pos + 8 > len(data):
                raise RDFSyntaxError("truncated double in thrift stream")
            self.pos = pos + 8
            return _struct.unpack("<d", data[pos : pos + 8])[0]
        if typ == _T_BINARY:
            n, pos = _read_varint(data, pos)
            if pos + n > len(data):
                raise RDFSyntaxError("truncated string in thrift stream")
            self.pos = pos + n
            return data[pos : pos + n]
        if typ == _T_STRUCT:
            return self.read_struct()
        if typ in (_T_LIST, _T_SET):
            if pos >= len(data):
                raise RDFSyntaxError("truncated collection header in thrift stream")
            head = data[pos]
            pos += 1
            elem_t = head & 0x0F
            size = head >> 4
            if size == 0x0F:
                size, pos = _read_varint(data, pos)
            # spec-compliant compact encoding spends >=1 byte per element
            # (bools in collections are full bytes), so a size beyond the
            # remaining stream is corrupt — and, unchecked, a crafted
            # zero-consume element type would loop for 2^n iterations
            if size > len(data) - pos:
                raise RDFSyntaxError("collection size exceeds thrift stream length")
            self.pos = pos
            return [self._read_value(elem_t) for _ in range(size)]
        if typ == _T_MAP:
            size, pos = _read_varint(data, pos)
            if size == 0:
                self.pos = pos
                return {}
            if size > len(data) - pos:
                raise RDFSyntaxError("map size exceeds thrift stream length")
            if pos >= len(data):
                raise RDFSyntaxError("truncated map header in thrift stream")
            head = data[pos]
            pos += 1
            self.pos = pos
            kt, vt = head >> 4, head & 0x0F
            out = {}
            for _ in range(size):
                k = self._read_value(kt)
                out[k] = self._read_value(vt)
            return out
        raise RDFSyntaxError(f"unknown thrift compact type {typ}")


class _TWriter:
    """Thrift compact-protocol struct writer (fields written in increasing
    field-id order, so short-form delta headers always apply)."""

    __slots__ = ("out",)

    def __init__(self) -> None:
        self.out = bytearray()

    def _header(self, last_fid: int, fid: int, typ: int) -> None:
        delta = fid - last_fid
        if 0 < delta <= 15:
            self.out.append((delta << 4) | typ)
        else:
            self.out.append(typ)
            _varint(self.out, _zigzag(fid))

    def struct(self, fields: List[Tuple[int, int, object]]) -> None:
        """fields: sorted list of (fid, type, value)."""
        last = 0
        for fid, typ, val in fields:
            if typ == _T_BOOL_TRUE:
                typ = _T_BOOL_TRUE if val else _T_BOOL_FALSE
                self._header(last, fid, typ)
            elif typ in (_T_I16, _T_I32, _T_I64):
                self._header(last, fid, typ)
                _varint(self.out, _zigzag(int(val)))
            elif typ == _T_DOUBLE:
                self._header(last, fid, typ)
                self.out += _struct.pack("<d", float(val))
            elif typ == _T_BINARY:
                self._header(last, fid, typ)
                b = val.encode("utf-8") if isinstance(val, str) else bytes(val)
                _varint(self.out, len(b))
                self.out += b
            elif typ == _T_STRUCT:
                self._header(last, fid, typ)
                self.out += val  # pre-serialized struct body (incl. STOP)
            elif typ == _T_LIST:
                self._header(last, fid, typ)
                elem_t, payloads = val  # list of pre-serialized elements
                if len(payloads) < 15:
                    self.out.append((len(payloads) << 4) | elem_t)
                else:
                    self.out.append(0xF0 | elem_t)
                    _varint(self.out, len(payloads))
                for p in payloads:
                    self.out += p
            else:
                raise ValueError(f"unsupported thrift write type {typ}")
            last = fid
        self.out.append(_T_STOP)


def _t_struct(fields: List[Tuple[int, int, object]]) -> bytes:
    w = _TWriter()
    w.struct(fields)
    return bytes(w.out)


# ---------------------------------------------------------------------------
# RDF_Term <-> Term (BinaryRDF.thrift:70-84 field numbering)
# ---------------------------------------------------------------------------

def _bnode_label(label: str, alloc: Optional[BNodeAllocator]) -> str:
    return alloc.get(label) if alloc is not None else label


def _as_str(v: object, what: str) -> str:
    if isinstance(v, bytes):
        return v.decode("utf-8")
    if isinstance(v, str):
        return v
    raise RDFSyntaxError(f"bad {what} in binary RDF term")


def _term_from_fields(
    f: Dict[int, object], pmap: Dict[str, str], alloc: Optional[BNodeAllocator]
) -> Term:
    if 1 in f:  # iri
        return mk_iri(_as_str(f[1].get(1, b""), "iri"))
    if 2 in f:  # bnode
        return mk_bnode(_bnode_label(_as_str(f[2].get(1, b""), "bnode label"), alloc))
    if 3 in f:  # literal
        lit = f[3]
        lex = _as_str(lit.get(1, b""), "literal lex")
        lang = _as_str(lit[2], "langtag") if 2 in lit else None
        base_dir = _as_str(lit[5], "baseDirection") if 5 in lit else None
        if 3 in lit:
            dt: Optional[str] = _as_str(lit[3], "datatype")
        elif 4 in lit:
            pn = lit[4]
            dt = _expand(pmap, _as_str(pn.get(1, b""), "prefix"), _as_str(pn.get(2, b""), "localName"))
        else:
            dt = None
        if lang:
            return mk_literal(lex, lang=lang + "--" + base_dir if base_dir else lang)
        if base_dir:
            raise RDFSyntaxError("baseDirection without langtag in binary literal")
        return mk_literal(lex, datatype=dt)
    if 4 in f:  # prefixName
        pn = f[4]
        return mk_iri(_expand(pmap, _as_str(pn.get(1, b""), "prefix"), _as_str(pn.get(2, b""), "localName")))
    if 9 in f:  # tripleTerm
        t = f[9]
        return mk_tripleterm(
            _term_from_fields(t.get(1, {}), pmap, alloc),
            _term_from_fields(t.get(2, {}), pmap, alloc),
            _term_from_fields(t.get(3, {}), pmap, alloc),
        )
    if 10 in f:  # valInteger
        return mk_literal(str(f[10]), datatype=XSD_INTEGER)
    if 11 in f:  # valDouble
        return mk_literal(_java_double_str(float(f[11])), datatype=XSD_DOUBLE)
    if 12 in f:  # valDecimal
        d = f[12]
        return mk_literal(_decimal_plain(int(d.get(1, 0)), int(d.get(2, 0))), datatype=XSD_DECIMAL)
    if 5 in f:
        raise RDFSyntaxError("variable term in binary RDF data stream")
    if 6 in f or 7 in f or 8 in f:
        raise RDFSyntaxError("ANY/UNDEF/REPEAT term in binary RDF data stream")
    raise RDFSyntaxError("empty RDF_Term union in binary RDF stream")


def _abbrev(iri: str, pmap: Optional[Dict[str, str]]) -> Optional[Tuple[str, str]]:
    """Prefix-compact an IRI against the writer prefix map (safe local
    parts only, like riot PrefixMapStd.abbrev)."""
    if not pmap:
        return None
    for prefix, base in pmap.items():
        if iri.startswith(base):
            local = iri[len(base) :]
            if local and not any(c in local for c in "/#?:"):
                return prefix, local
    return None


_XSD_INT_TYPES = frozenset(
    (
        XSD_INTEGER,
        "http://www.w3.org/2001/XMLSchema#long",
        "http://www.w3.org/2001/XMLSchema#int",
        "http://www.w3.org/2001/XMLSchema#short",
        "http://www.w3.org/2001/XMLSchema#byte",
    )
)


# strict XSD lexical grammars: Python int()/float() are wider (they
# accept "1_0", Unicode digits, "infinity"), and value-encoding an
# ill-formed literal would silently rewrite it into a different,
# well-formed one on decode — the reference only value-encodes literals
# its XSD parse accepts and ships the rest verbatim
_XSD_INT_LEX = re.compile(r"^[+-]?[0-9]+$")
_XSD_DEC_LEX = re.compile(r"^[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)$")
_XSD_DBL_LEX = re.compile(
    r"^(?:[+-]?(?:[0-9]+(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?|[+-]?INF|NaN)$"
)


def _try_value_fields(t: Term) -> Optional[Tuple[int, int, object]]:
    """ThriftConvert.toThriftValue (ThriftConvert.java:70-125): encode
    integer/decimal/double literals by value when lexically valid and in
    range; returns the (fid, type, value) triple for the union."""
    lex = t.lex.strip()
    if t.datatype in _XSD_INT_TYPES:
        if not _XSD_INT_LEX.match(lex):
            return None
        v = int(lex)
        if _I64_MIN <= v <= _I64_MAX:
            return (10, _T_I64, v)
        return None
    if t.datatype == XSD_DOUBLE:
        if not _XSD_DBL_LEX.match(lex):
            return None
        return (11, _T_DOUBLE, float(lex))
    if t.datatype == XSD_DECIMAL:
        if not _XSD_DEC_LEX.match(lex):
            return None
        ip, _, fp = lex.partition(".")
        scale = len(fp)
        v = int(ip + fp) if (ip.strip("+-") or fp) else 0
        if _I64_MIN <= v <= _I64_MAX:
            return (12, _T_STRUCT, _t_struct([(1, _T_I64, v), (2, _T_I32, scale)]))
        return None
    return None


def _term_to_thrift(
    t: Term, pmap: Optional[Dict[str, str]], encode_values: bool
) -> bytes:
    """Serialize one Term as an RDF_Term union struct body."""
    if t.kind == IRI:
        ab = _abbrev(t.lex, pmap)
        if ab is not None:
            return _t_struct(
                [(4, _T_STRUCT, _t_struct([(1, _T_BINARY, ab[0]), (2, _T_BINARY, ab[1])]))]
            )
        return _t_struct([(1, _T_STRUCT, _t_struct([(1, _T_BINARY, t.lex)]))])
    if t.kind == BNODE:
        return _t_struct([(2, _T_STRUCT, _t_struct([(1, _T_BINARY, t.lex)]))])
    if t.kind == TRIPLE_TERM:
        s, p, o = _split_tripleterm(t)
        body = _t_struct(
            [
                (1, _T_STRUCT, _term_to_thrift(s, pmap, encode_values)),
                (2, _T_STRUCT, _term_to_thrift(p, pmap, encode_values)),
                (3, _T_STRUCT, _term_to_thrift(o, pmap, encode_values)),
            ]
        )
        return _t_struct([(9, _T_STRUCT, body)])
    # literal
    if encode_values and t.lang is None:
        vf = _try_value_fields(t)
        if vf is not None:
            return _t_struct([vf])
    fields: List[Tuple[int, int, object]] = [(1, _T_BINARY, t.lex)]
    if t.lang is not None:
        lang, _, direction = t.lang.partition("--")
        fields.append((2, _T_BINARY, lang))
        if direction:
            fields.append((5, _T_BINARY, direction))
    elif t.datatype is not None and t.datatype != XSD_STRING:
        ab = _abbrev(t.datatype, pmap)
        if ab is not None:
            fields.append(
                (4, _T_STRUCT, _t_struct([(1, _T_BINARY, ab[0]), (2, _T_BINARY, ab[1])]))
            )
        else:
            fields.append((3, _T_BINARY, t.datatype))
    fields.sort(key=lambda x: x[0])
    return _t_struct([(3, _T_STRUCT, _t_struct(fields))])


def _split_tripleterm(t: Term) -> Tuple[Term, Term, Term]:
    """A TRIPLE_TERM's lex is 's p o' in NT encoding; split on top-level
    spaces via decode of the three encoded terms."""
    parts = _split_nt_terms(t.lex)
    if len(parts) != 3:
        raise RDFSyntaxError(f"bad triple-term payload: {t.lex!r}")
    return decode_term(parts[0]), decode_term(parts[1]), decode_term(parts[2])


def _split_nt_terms(s: str) -> List[str]:
    out: List[str] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == " ":
            i += 1
            continue
        start = i
        if s.startswith("<<(", i):
            depth = 0
            while i < n:
                if s.startswith("<<(", i):
                    depth += 1
                    i += 3
                elif s.startswith(")>>", i):
                    depth -= 1
                    i += 3
                    if depth == 0:
                        break
                elif s[i] == '"':
                    i = _skip_quoted(s, i)
                else:
                    i += 1
        elif s[i] == '"':
            i = _skip_quoted(s, i)
            while i < n and s[i] != " ":
                i += 1
        else:
            while i < n and s[i] != " ":
                i += 1
        out.append(s[start:i])
    return out


def _skip_quoted(s: str, i: int) -> int:
    i += 1
    n = len(s)
    while i < n:
        if s[i] == "\\":
            i += 2
        elif s[i] == '"':
            return i + 1
        else:
            i += 1
    raise RDFSyntaxError("unterminated literal in triple-term payload")


# ---------------------------------------------------------------------------
# RDF-Thrift stream read / write
# ---------------------------------------------------------------------------

def _decode_guard(fn):
    """Contract for every binary reader: ANY malformation of the
    untrusted byte stream surfaces as RDFSyntaxError — never a stray
    IndexError/TypeError/AttributeError from type-confused thrift fields
    or mis-shaped protobuf spans.  Inside the extraction pipeline an
    unexpected exception type escapes ``parse_document``'s error
    handling (registry.py) and kills the whole Spark stage; a corrupt
    document must instead become one lineage error row.  Internal codec
    correctness is pinned separately by the hand-computed wire vectors
    in tests/test_binrdf.py, so this net cannot hide a wrong-answer bug.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except RDFSyntaxError:
            raise
        except (
            IndexError,
            KeyError,
            TypeError,
            AttributeError,
            ValueError,
            OverflowError,
            RecursionError,
            _struct.error,
        ) as e:
            raise RDFSyntaxError(
                f"malformed binary RDF stream ({fn.__name__}): "
                f"{type(e).__name__}: {e}"
            ) from None

    return wrapped


def _coerce_bytes(data) -> bytes:
    if isinstance(data, bytes):
        return data
    if isinstance(data, bytearray):
        return bytes(data)
    if isinstance(data, str):
        # the pipeline's content column is a string; binary payloads ride
        # as latin-1 (lossless byte <-> code-point)
        try:
            return data.encode("latin-1")
        except UnicodeEncodeError as e:
            raise RDFSyntaxError(f"binary RDF content not byte-mappable: {e}") from None
    raise RDFSyntaxError("binary RDF content must be bytes or latin-1 string")


@_decode_guard
def parse_rdf_thrift(data, alloc: Optional[BNodeAllocator] = None) -> List[Quad]:
    """Parse an RDF-Thrift stream → quads of NT-encoded term strings
    (graph None for triple rows; named graph for quad rows).

    RDF_StreamRow union (BinaryRDF.thrift:107-112): 1 = prefixDecl,
    2 = triple, 3 = quad; rows repeat until EOF."""
    r = _TReader(_coerce_bytes(data))
    pmap: Dict[str, str] = {}
    out: List[Quad] = []
    while not r.at_eof():
        row = r.read_struct()
        if 1 in row:  # prefixDecl {1: prefix, 2: uri}
            pd = row[1]
            pmap[_as_str(pd.get(1, b""), "prefix")] = _as_str(pd.get(2, b""), "prefix uri")
        elif 2 in row:  # triple
            t = row[2]
            s = _term_from_fields(t.get(1, {}), pmap, alloc)
            p = _term_from_fields(t.get(2, {}), pmap, alloc)
            o = _term_from_fields(t.get(3, {}), pmap, alloc)
            out.append((None, s.nt(), p.nt(), o.nt()))
        elif 3 in row:  # quad (G optional field 4)
            q = row[3]
            s = _term_from_fields(q.get(1, {}), pmap, alloc)
            p = _term_from_fields(q.get(2, {}), pmap, alloc)
            o = _term_from_fields(q.get(3, {}), pmap, alloc)
            g = _term_from_fields(q[4], pmap, alloc).nt() if 4 in q else None
            out.append((g, s.nt(), p.nt(), o.nt()))
        elif not row:
            # an empty struct decodes from a lone 0x00 byte; treat padding
            # at EOF as an error to catch truncation
            raise RDFSyntaxError("empty RDF_StreamRow in thrift stream")
        else:
            raise RDFSyntaxError(f"unknown RDF_StreamRow field {sorted(row)} in thrift stream")
    return out


def write_rdf_thrift(
    quads: Iterable[Quad],
    encode_values: bool = False,
    prefixes: Optional[Dict[str, str]] = None,
) -> bytes:
    """Serialize quads (NT-encoded term strings, graph None ⇒ triple row)
    as an RDF-Thrift stream.  ``prefixes`` (prefix → IRI base) emits
    prefixDecl rows up front and compacts matching IRIs, mirroring the
    reference writer's prefix handling (StreamRDF2Thrift.java prefix())."""
    out = bytearray()
    if prefixes:
        for pfx, base in prefixes.items():
            out += _t_struct(
                [(1, _T_STRUCT, _t_struct([(1, _T_BINARY, pfx), (2, _T_BINARY, base)]))]
            )
    for g, s, p, o in quads:
        st = _term_to_thrift(decode_term(s), prefixes, encode_values)
        pt = _term_to_thrift(decode_term(p), prefixes, encode_values)
        ot = _term_to_thrift(decode_term(o), prefixes, encode_values)
        if g is None:
            body = _t_struct(
                [(1, _T_STRUCT, st), (2, _T_STRUCT, pt), (3, _T_STRUCT, ot)]
            )
            out += _t_struct([(2, _T_STRUCT, body)])
        else:
            gt = _term_to_thrift(decode_term(g), prefixes, encode_values)
            body = _t_struct(
                [(1, _T_STRUCT, st), (2, _T_STRUCT, pt), (3, _T_STRUCT, ot), (4, _T_STRUCT, gt)]
            )
            out += _t_struct([(3, _T_STRUCT, body)])
    return bytes(out)


# ---------------------------------------------------------------------------
# Protobuf wire primitives (public protobuf encoding spec)
# ---------------------------------------------------------------------------

_P_VARINT = 0
_P_I64 = 1
_P_LEN = 2
_P_I32 = 5


def _p_read_message(data: bytes, start: int, end: int) -> Dict[int, List[object]]:
    """Generic proto reader: {field: [raw values in order]}.  LEN fields
    stay as (start, end) byte spans — interpreted per schema afterwards."""
    fields: Dict[int, List[object]] = {}
    pos = start
    while pos < end:
        key, pos = _read_varint(data, pos)
        fid, wt = key >> 3, key & 0x07
        if fid == 0:
            raise RDFSyntaxError("protobuf field number 0")
        if wt == _P_VARINT:
            v, pos = _read_varint(data, pos)
        elif wt == _P_I64:
            if pos + 8 > end:
                raise RDFSyntaxError("truncated fixed64 in protobuf message")
            v = data[pos : pos + 8]
            pos += 8
        elif wt == _P_LEN:
            n, pos = _read_varint(data, pos)
            if pos + n > end:
                raise RDFSyntaxError("truncated length-delimited protobuf field")
            v = (pos, pos + n)
            pos += n
        elif wt == _P_I32:
            if pos + 4 > end:
                raise RDFSyntaxError("truncated fixed32 in protobuf message")
            v = data[pos : pos + 4]
            pos += 4
        else:
            raise RDFSyntaxError(f"unsupported protobuf wire type {wt}")
        fields.setdefault(fid, []).append(v)
    if pos != end:
        raise RDFSyntaxError("protobuf message overran its length")
    return fields


def _p_str(data: bytes, span) -> str:
    if not isinstance(span, tuple):
        raise RDFSyntaxError("expected length-delimited protobuf field")
    return data[span[0] : span[1]].decode("utf-8")


def _p_key(out: bytearray, fid: int, wt: int) -> None:
    _varint(out, (fid << 3) | wt)


def _p_len_field(out: bytearray, fid: int, payload: bytes) -> None:
    _p_key(out, fid, _P_LEN)
    _varint(out, len(payload))
    out += payload


def _p_str_field(out: bytearray, fid: int, s: str) -> None:
    _p_len_field(out, fid, s.encode("utf-8"))


def _p_sint_field(out: bytearray, fid: int, v: int) -> None:
    _p_key(out, fid, _P_VARINT)
    _varint(out, _zigzag(v))


# ---------------------------------------------------------------------------
# RDF_Term protobuf (binary-rdf.proto:80-97 field numbering)
# ---------------------------------------------------------------------------

def _p_term_from(data: bytes, span, pmap: Dict[str, str], alloc) -> Term:
    return _p_term_fields(data, _p_read_message(data, span[0], span[1]), pmap, alloc)


def _p_term_fields(data: bytes, f: Dict[int, List[object]], pmap: Dict[str, str], alloc) -> Term:
    if 1 in f:  # iri
        m = _p_read_message(data, *f[1][-1])
        return mk_iri(_p_str(data, m[1][-1]) if 1 in m else "")
    if 2 in f:  # bnode
        m = _p_read_message(data, *f[2][-1])
        return mk_bnode(_bnode_label(_p_str(data, m[1][-1]) if 1 in m else "", alloc))
    if 3 in f:  # literal
        m = _p_read_message(data, *f[3][-1])
        lex = _p_str(data, m[1][-1]) if 1 in m else ""
        if 2 in m:  # langtag
            return mk_literal(lex, lang=_p_str(data, m[2][-1]))
        if 5 in m:  # langdir "lang--dir" (ProtobufConvert.java:186-196)
            langdir = _p_str(data, m[5][-1])
            if "--" not in langdir:
                raise RDFSyntaxError(f"bad langdir value: {langdir!r}")
            return mk_literal(lex, lang=langdir)
        if 3 in m:  # datatype
            return mk_literal(lex, datatype=_p_str(data, m[3][-1]))
        if 4 in m:  # dtPrefix
            pn = _p_read_message(data, *m[4][-1])
            dt = _expand(
                pmap,
                _p_str(data, pn[1][-1]) if 1 in pn else "",
                _p_str(data, pn[2][-1]) if 2 in pn else "",
            )
            return mk_literal(lex, datatype=dt)
        return mk_literal(lex)  # simple=true or literalKind unset
    if 4 in f:  # prefixName
        pn = _p_read_message(data, *f[4][-1])
        return mk_iri(
            _expand(
                pmap,
                _p_str(data, pn[1][-1]) if 1 in pn else "",
                _p_str(data, pn[2][-1]) if 2 in pn else "",
            )
        )
    if 6 in f:  # tripleTerm
        m = _p_read_message(data, *f[6][-1])
        return mk_tripleterm(
            _p_term_from(data, m[1][-1], pmap, alloc),
            _p_term_from(data, m[2][-1], pmap, alloc),
            _p_term_from(data, m[3][-1], pmap, alloc),
        )
    if 20 in f:  # valInteger (sint64)
        return mk_literal(str(_unzigzag(f[20][-1])), datatype=XSD_INTEGER)
    if 21 in f:  # valDouble (8-byte LE double)
        return mk_literal(
            _java_double_str(_struct.unpack("<d", f[21][-1])[0]), datatype=XSD_DOUBLE
        )
    if 22 in f:  # valDecimal
        m = _p_read_message(data, *f[22][-1])
        v = _unzigzag(m[1][-1]) if 1 in m else 0
        sc = _unzigzag(m[2][-1]) if 2 in m else 0
        return mk_literal(_decimal_plain(v, sc), datatype=XSD_DECIMAL)
    if 5 in f:
        raise RDFSyntaxError("variable term in binary RDF data stream")
    if 7 in f or 8 in f or 9 in f:
        raise RDFSyntaxError("ANY/UNDEF/REPEAT term in binary RDF data stream")
    raise RDFSyntaxError("empty RDF_Term oneof in protobuf stream")


def _p_term_to(t: Term, pmap: Optional[Dict[str, str]], encode_values: bool) -> bytes:
    out = bytearray()
    if t.kind == IRI:
        ab = _abbrev(t.lex, pmap)
        if ab is not None:
            pn = bytearray()
            _p_str_field(pn, 1, ab[0])
            _p_str_field(pn, 2, ab[1])
            _p_len_field(out, 4, bytes(pn))
            return bytes(out)
        inner = bytearray()
        _p_str_field(inner, 1, t.lex)
        _p_len_field(out, 1, bytes(inner))
        return bytes(out)
    if t.kind == BNODE:
        inner = bytearray()
        _p_str_field(inner, 1, t.lex)
        _p_len_field(out, 2, bytes(inner))
        return bytes(out)
    if t.kind == TRIPLE_TERM:
        s, p, o = _split_tripleterm(t)
        inner = bytearray()
        _p_len_field(inner, 1, _p_term_to(s, pmap, encode_values))
        _p_len_field(inner, 2, _p_term_to(p, pmap, encode_values))
        _p_len_field(inner, 3, _p_term_to(o, pmap, encode_values))
        _p_len_field(out, 6, bytes(inner))
        return bytes(out)
    # literal
    if encode_values and t.lang is None:
        vf = _try_value_fields(t)
        if vf is not None:
            fid_t, typ, val = vf
            if fid_t == 10:  # integer → field 20 sint64
                _p_sint_field(out, 20, int(val))
            elif fid_t == 11:  # double → field 21
                _p_key(out, 21, _P_I64)
                out += _struct.pack("<d", float(val))
            else:  # decimal struct → message field 22
                # re-derive value/scale from the lexical form
                lex = t.lex.strip()
                ip, _, fp = lex.partition(".")
                inner = bytearray()
                _p_sint_field(inner, 1, int((ip + fp) or "0"))
                _p_sint_field(inner, 2, len(fp))
                _p_len_field(out, 22, bytes(inner))
            return bytes(out)
    lit = bytearray()
    _p_str_field(lit, 1, t.lex)
    if t.lang is not None:
        if "--" in t.lang:
            _p_str_field(lit, 5, t.lang)
        else:
            _p_str_field(lit, 2, t.lang)
    elif t.datatype is not None and t.datatype != XSD_STRING:
        ab = _abbrev(t.datatype, pmap)
        if ab is not None:
            pn = bytearray()
            _p_str_field(pn, 1, ab[0])
            _p_str_field(pn, 2, ab[1])
            _p_len_field(lit, 4, bytes(pn))
        else:
            _p_str_field(lit, 3, t.datatype)
    else:
        _p_key(lit, 9, _P_VARINT)  # simple = true (ProtobufConvert.java:362)
        lit.append(1)
    _p_len_field(out, 3, bytes(lit))
    return bytes(out)


@_decode_guard
def parse_rdf_protobuf(data, alloc: Optional[BNodeAllocator] = None) -> List[Quad]:
    """Parse an RDF-Protobuf stream of length-delimited RDF_StreamRow
    messages (ProtobufRDF.java:129 parseDelimitedFrom) → quads."""
    buf = _coerce_bytes(data)
    pmap: Dict[str, str] = {}
    out: List[Quad] = []
    pos = 0
    n = len(buf)
    while pos < n:
        size, pos = _read_varint(buf, pos)
        if pos + size > n:
            raise RDFSyntaxError("truncated protobuf row")
        row = _p_read_message(buf, pos, pos + size)
        pos += size
        if 1 in row:  # prefixDecl
            m = _p_read_message(buf, *row[1][-1])
            pmap[_p_str(buf, m[1][-1]) if 1 in m else ""] = (
                _p_str(buf, m[2][-1]) if 2 in m else ""
            )
        elif 2 in row:  # triple
            m = _p_read_message(buf, *row[2][-1])
            s = _p_term_from(buf, m[1][-1], pmap, alloc)
            p = _p_term_from(buf, m[2][-1], pmap, alloc)
            o = _p_term_from(buf, m[3][-1], pmap, alloc)
            out.append((None, s.nt(), p.nt(), o.nt()))
        elif 3 in row:  # quad
            m = _p_read_message(buf, *row[3][-1])
            s = _p_term_from(buf, m[1][-1], pmap, alloc)
            p = _p_term_from(buf, m[2][-1], pmap, alloc)
            o = _p_term_from(buf, m[3][-1], pmap, alloc)
            g = _p_term_from(buf, m[4][-1], pmap, alloc).nt() if 4 in m else None
            out.append((g, s.nt(), p.nt(), o.nt()))
        elif 4 in row:  # base — no relative resolution in binary streams; ignore
            pass
        elif not row:
            raise RDFSyntaxError("empty RDF_StreamRow in protobuf stream")
        else:
            raise RDFSyntaxError(
                f"unknown RDF_StreamRow field {sorted(row)} in protobuf stream"
            )
    return out


def write_rdf_protobuf(
    quads: Iterable[Quad],
    encode_values: bool = False,
    prefixes: Optional[Dict[str, str]] = None,
) -> bytes:
    """Serialize quads as length-delimited RDF_StreamRow protobuf messages
    (the reference's writeDelimitedTo framing)."""
    out = bytearray()

    def emit_row(fid: int, payload: bytes) -> None:
        row = bytearray()
        _p_len_field(row, fid, payload)
        _varint(out, len(row))
        out.extend(row)

    if prefixes:
        for pfx, base in prefixes.items():
            pd = bytearray()
            _p_str_field(pd, 1, pfx)
            _p_str_field(pd, 2, base)
            emit_row(1, bytes(pd))
    for g, s, p, o in quads:
        body = bytearray()
        _p_len_field(body, 1, _p_term_to(decode_term(s), prefixes, encode_values))
        _p_len_field(body, 2, _p_term_to(decode_term(p), prefixes, encode_values))
        _p_len_field(body, 3, _p_term_to(decode_term(o), prefixes, encode_values))
        if g is None:
            emit_row(2, bytes(body))
        else:
            _p_len_field(body, 4, _p_term_to(decode_term(g), prefixes, encode_values))
            emit_row(3, bytes(body))
    return bytes(out)


# ---------------------------------------------------------------------------
# SPARQL result tuples: RDF_VarTuple then RDF_DataTuple rows
# (BinaryRDF.thrift:116-122; riot/thrift/Binding2Thrift.java /
# Thift2Binding.java — unbound variables travel as RDF_UNDEF)
# ---------------------------------------------------------------------------

def _undef_thrift() -> bytes:
    return _t_struct([(7, _T_STRUCT, _t_struct([]))])


def write_result_tuples_thrift(
    varnames: List[str], rows: Iterable[List[Optional[str]]],
    encode_values: bool = False,
) -> bytes:
    """Serialize a SPARQL result table (NT-encoded cells, None = unbound)
    as one RDF_VarTuple followed by RDF_DataTuple rows."""
    out = bytearray()
    var_elems = [_t_struct([(1, _T_BINARY, v)]) for v in varnames]
    out += _t_struct([(1, _T_LIST, (_T_STRUCT, var_elems))])
    for row in rows:
        elems = [
            _undef_thrift() if c is None
            else _term_to_thrift(decode_term(c), None, encode_values)
            for c in row
        ]
        out += _t_struct([(1, _T_LIST, (_T_STRUCT, elems))])
    return bytes(out)


@_decode_guard
def read_result_tuples_thrift(data) -> Tuple[List[str], List[List[Optional[str]]]]:
    r = _TReader(_coerce_bytes(data))
    if r.at_eof():
        raise RDFSyntaxError("empty thrift result stream (no RDF_VarTuple)")
    vt = r.read_struct()
    varnames = [
        _as_str(v.get(1, b""), "var name") for v in vt.get(1, [])
    ]
    rows: List[List[Optional[str]]] = []
    pmap: Dict[str, str] = {}
    while not r.at_eof():
        dt = r.read_struct()
        row: List[Optional[str]] = []
        for f in dt.get(1, []):
            if 7 in f:  # RDF_UNDEF = unbound
                row.append(None)
            else:
                row.append(_term_from_fields(f, pmap, None).nt())
        rows.append(row)
    return varnames, rows


def write_result_tuples_protobuf(
    varnames: List[str], rows: Iterable[List[Optional[str]]],
    encode_values: bool = False,
) -> bytes:
    """Length-delimited RDF_VarTuple + RDF_DataTuple messages
    (riot/protobuf/Binding2Protobuf.java:56,70)."""
    out = bytearray()

    def emit(payload: bytes) -> None:
        _varint(out, len(payload))
        out.extend(payload)

    vt = bytearray()
    for v in varnames:
        inner = bytearray()
        _p_str_field(inner, 1, v)
        _p_len_field(vt, 1, bytes(inner))
    emit(bytes(vt))
    for row in rows:
        body = bytearray()
        for c in row:
            if c is None:
                _p_len_field(body, 1, b"\x42\x00")  # term oneof: undefined(8) empty
            else:
                _p_len_field(body, 1, _p_term_to(decode_term(c), None, encode_values))
        emit(bytes(body))
    return bytes(out)


@_decode_guard
def read_result_tuples_protobuf(data) -> Tuple[List[str], List[List[Optional[str]]]]:
    buf = _coerce_bytes(data)
    pos, n = 0, len(buf)
    if pos >= n:
        raise RDFSyntaxError("empty protobuf result stream (no RDF_VarTuple)")
    size, pos = _read_varint(buf, pos)
    if pos + size > n:
        # without this a final LEN span can end past the buffer and
        # Python slicing silently truncates the string instead of erroring
        raise RDFSyntaxError("truncated protobuf result stream (var tuple)")
    vt = _p_read_message(buf, pos, pos + size)
    pos += size
    varnames = []
    for span in vt.get(1, []):
        m = _p_read_message(buf, *span)
        varnames.append(_p_str(buf, m[1][-1]) if 1 in m else "")
    rows: List[List[Optional[str]]] = []
    pmap: Dict[str, str] = {}
    while pos < n:
        size, pos = _read_varint(buf, pos)
        if pos + size > n:
            raise RDFSyntaxError("truncated protobuf result stream (data tuple)")
        dt = _p_read_message(buf, pos, pos + size)
        pos += size
        row: List[Optional[str]] = []
        for span in dt.get(1, []):
            f = _p_read_message(buf, *span)
            if 8 in f:  # undefined = unbound
                row.append(None)
            else:
                row.append(_p_term_fields(buf, f, pmap, None).nt())
        rows.append(row)
    return varnames, rows


# ---------------------------------------------------------------------------
# Binary RDF Patch rows (BinaryRDF.thrift:126-165; the reference's
# rdfpatch binary reader/writer use these thrift rows with the same
# compact protocol)
# ---------------------------------------------------------------------------

_PATCH_TXN = {0: "TX", 1: "TC", 2: "TA", 3: "Segment"}
_PATCH_TXN_INV = {v: k for k, v in _PATCH_TXN.items()}

PatchRow = Tuple  # ("H",name,val) | ("A"/"D",g,s,p,o) | ("PA",g,pfx,iri) | ("PD",g,pfx) | ("TX",)


@_decode_guard
def read_patch_rows_thrift(data) -> List[PatchRow]:
    """RDF_Patch_Row stream → neutral row tuples (graph None = default)."""
    r = _TReader(_coerce_bytes(data))
    pmap: Dict[str, str] = {}
    out: List[PatchRow] = []

    def term(f) -> str:
        return _term_from_fields(f, pmap, None).nt()

    while not r.at_eof():
        row = r.read_struct()
        if 1 in row:  # header {1: name, 2: value term}
            h = row[1]
            out.append(("H", _as_str(h.get(1, b""), "header name"), term(h.get(2, {}))))
        elif 2 in row or 3 in row:  # dataAdd / dataDel
            code = "A" if 2 in row else "D"
            d = row[2] if 2 in row else row[3]
            g = term(d[4]) if 4 in d else None
            out.append((code, g, term(d.get(1, {})), term(d.get(2, {})), term(d.get(3, {}))))
        elif 4 in row:  # prefixAdd {1: graphNode?, 2: prefix, 3: iriStr}
            p = row[4]
            g = term(p[1]) if 1 in p else None
            out.append(("PA", g, _as_str(p.get(2, b""), "prefix"), _as_str(p.get(3, b""), "iri")))
        elif 5 in row:  # prefixDel
            p = row[5]
            g = term(p[1]) if 1 in p else None
            out.append(("PD", g, _as_str(p.get(2, b""), "prefix")))
        elif 6 in row:  # txn enum (i32)
            code = _PATCH_TXN.get(int(row[6]))
            if code is None:
                raise RDFSyntaxError(f"unknown PatchTxn value {row[6]}")
            out.append((code,))
        else:
            raise RDFSyntaxError(f"unknown RDF_Patch_Row field {sorted(row)}")
    return out


def write_patch_rows_thrift(rows: Iterable[PatchRow]) -> bytes:
    out = bytearray()

    def term(enc: str) -> bytes:
        return _term_to_thrift(decode_term(enc), None, False)

    for row in rows:
        code = row[0]
        if code == "H":
            body = _t_struct(
                [(1, _T_BINARY, row[1]), (2, _T_STRUCT, term(row[2]))]
            )
            out += _t_struct([(1, _T_STRUCT, body)])
        elif code in ("A", "D"):
            g, s, p, o = row[1], row[2], row[3], row[4]
            fields = [
                (1, _T_STRUCT, term(s)),
                (2, _T_STRUCT, term(p)),
                (3, _T_STRUCT, term(o)),
            ]
            if g is not None:
                fields.append((4, _T_STRUCT, term(g)))
            out += _t_struct([(2 if code == "A" else 3, _T_STRUCT, _t_struct(fields))])
        elif code == "PA":
            fields = []
            if row[1] is not None:
                fields.append((1, _T_STRUCT, term(row[1])))
            fields += [(2, _T_BINARY, row[2]), (3, _T_BINARY, row[3])]
            out += _t_struct([(4, _T_STRUCT, _t_struct(fields))])
        elif code == "PD":
            fields = []
            if row[1] is not None:
                fields.append((1, _T_STRUCT, term(row[1])))
            fields.append((2, _T_BINARY, row[2]))
            out += _t_struct([(5, _T_STRUCT, _t_struct(fields))])
        elif code in _PATCH_TXN_INV:
            out += _t_struct([(6, _T_I32, _PATCH_TXN_INV[code])])
        else:
            raise ValueError(f"unknown patch row code {code!r}")
    return bytes(out)
