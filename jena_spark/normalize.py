"""Opt-in literal value canonicalization (default OFF, matching the
reference's default parse path).

Re-expresses riot/process/normalize/NormalizeValue.java (TTL flavour,
``NormalizeRDFTerms.getTTL()``) + StreamCanonicalLiterals semantics:

- xsd:boolean — ``1``/``0`` → ``true``/``false``;
- integer family — strip ``+`` and leading zeros (``-000`` → ``0``);
- xsd:decimal — strip trailing zeros, always keep a ``.d`` part
  (``0001.10`` → ``1.1``, ``'0'^^xsd:decimal`` → ``0.0``);
- xsd:double — Java ``Double.toString`` form with Turtle's ``e0``
  appended when there is no exponent (``1e1`` → ``10.0e0``,
  ``1e7`` → ``1.0E7``); ``+INF`` → ``INF``;
- xsd:float — same but float32 precision and no ``e0`` suffix
  (``1.234567890`` → ``1.2345679``);
- xsd:dateTime/date/time/g* — drop trailing zeros of fractional
  seconds (``07:07:07.010`` → ``07:07:07.01``, ``.00`` dropped).

Divergence note: for doubles we use the shortest-round-trip digit
string (Python ``repr`` / modern JDK Ryū); Jena on older JDKs can emit
an extra digit for a handful of pathological values — same value,
longer lexical.

Langtag case canonicalization (StreamCanonicalLangTag) is already the
parser default in this engine (terms.canonical_langtag), so there is no
separate opt-in for it.

The DataFrame transform keeps the hot path JVM-side: a Catalyst
prefilter passes only literals whose datatype is in the handled set to
the Arrow UDF; IRIs, bnodes and plain/lang strings never leave the JVM.
"""

from __future__ import annotations

import math
import re
from decimal import Decimal
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .terms import RDFSyntaxError

XSD = "http://www.w3.org/2001/XMLSchema#"

_INTEGER_DTS = frozenset(
    XSD + n
    for n in (
        "integer", "int", "long", "short", "byte", "nonNegativeInteger",
        "nonPositiveInteger", "negativeInteger", "positiveInteger",
        "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte",
    )
)
_DT_TIME_DTS = frozenset(
    XSD + n
    for n in ("dateTime", "dateTimeStamp", "time", "date", "gYear",
              "gYearMonth", "gMonth", "gMonthDay", "gDay")
)
_HANDLED_DTS = (
    _INTEGER_DTS | _DT_TIME_DTS
    | {XSD + "boolean", XSD + "decimal", XSD + "double", XSD + "float"}
)

_LIT_DT_RE = re.compile(r'^"((?s:.*))"\^\^<([^>]*)>$')
_FRAC_RE = re.compile(r"(\.\d*[1-9])0+(?=[Z+\-]|$)|\.0+(?=[Z+\-]|$)")


def _fmt_from_digits(sign: str, ds: str, e: int, plain: bool) -> str:
    """digits ``ds`` with leading-digit exponent ``e`` → Java
    ``Double.toString``-style lexical (plain d+.d+ or sci d.d+E±e)."""
    if plain:
        if e >= 0:
            ip = ds[: e + 1].ljust(e + 1, "0")
            fp = ds[e + 1:] or "0"
        else:
            ip = "0"
            fp = "0" * (-e - 1) + ds
        return f"{sign}{ip}.{fp}"
    mant = ds[0] + "." + (ds[1:] or "0")
    return f"{sign}{mant}E{e}"


def _java_fp_str(lex: str, single: bool) -> str:
    """Canonical Java ``Double/Float.toString`` of an xsd double/float
    lexical (shortest round-trip digits; scientific iff |v| >= 1e7 or
    < 1e-3)."""
    s = lex.strip()
    if s in ("INF", "+INF"):
        return "INF"
    if s == "-INF":
        return "-INF"
    if s == "NaN":
        return "NaN"
    d = float(s)
    if single:
        import numpy as np

        f32 = np.float32(d)
        if math.isinf(float(f32)):
            return "-INF" if float(f32) < 0 else "INF"
        digits = np.format_float_scientific(f32, unique=True, trim="-")
        dec = Decimal(digits)
        a = abs(float(f32))
    else:
        dec = Decimal(repr(abs(d)))
        a = abs(d)
    sign = "-" if math.copysign(1.0, d) < 0 else ""
    _, tup, exp = abs(dec).as_tuple()
    ds = "".join(map(str, tup)).rstrip("0") or "0"
    exp += len("".join(map(str, tup))) - len(ds)
    e = exp + len(ds) - 1
    plain = a == 0 or (1e-3 <= a < 1e7)
    return _fmt_from_digits(sign, ds, e, plain)


def normalize_literal(enc: str, mode: str = "ttl") -> str:
    """One encoded term → its canonical form (non-literals and unhandled
    datatypes pass through unchanged; invalid lexicals pass through, as
    the reference handlers return the input node on bad input)."""
    m = _LIT_DT_RE.match(enc)
    if m is None:
        return enc
    lex, dt = m.group(1), m.group(2)
    if dt not in _HANDLED_DTS or "\\" in lex:
        return enc
    try:
        if dt == XSD + "boolean":
            lex2 = {"1": "true", "0": "false"}.get(lex, lex)
        elif dt in _INTEGER_DTS:
            lex2 = str(int(lex))
        elif dt == XSD + "decimal":
            dec = Decimal(lex)
            lex2 = "0" if dec == 0 else format(dec.normalize(), "f")
            if "." not in lex2:
                lex2 += ".0"
        elif dt == XSD + "double":
            lex2 = _java_fp_str(lex, single=False)
            if "E" not in lex2 and lex2 not in ("INF", "-INF", "NaN"):
                lex2 += "e0"  # Turtle short-form exponent (dtDoubleTTL)
        elif dt == XSD + "float":
            lex2 = _java_fp_str(lex, single=True)
        else:  # date/time family: trim fractional-second zeros
            if "." not in lex:
                return enc
            lex2 = _FRAC_RE.sub(lambda mm: mm.group(1) or "", lex)
    except (ValueError, ArithmeticError):
        return enc  # invalid lexical: reference handlers keep the node
    if lex2 == lex:
        return enc
    return f'"{lex2}"^^<{dt}>'


def normalize_triples(
    triples: DataFrame, cols=("obj",), mode: str = "ttl"
) -> DataFrame:
    """Opt-in canonicalization transform over a triples/quads DataFrame.
    Only literal cells with a handled ``^^<datatype>`` suffix cross the
    Arrow boundary; everything else is untouched JVM-side."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):
        return s.map(lambda v: v if v is None else normalize_literal(v, mode))

    dts = F.array(*[F.lit(d) for d in sorted(_HANDLED_DTS)])
    out = triples
    for c in cols:
        col = F.col(c)
        candidate = col.startswith('"') & F.array_contains(
            dts, F.regexp_extract(col, r'\^\^<([^>]*)>$', 1)
        )
        out = out.withColumn(c, F.when(candidate, _norm(col)).otherwise(col))
    return out
