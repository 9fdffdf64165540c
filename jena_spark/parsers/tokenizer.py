"""Tokenizer for the Turtle family (N-Triples, N-Quads, Turtle, TriG).

Re-implements the token-level semantics of the reference tokenizer
(Jena: riot/tokens/TokenizerText.java, 1,630 LoC; token inventory
riot/tokens/TokenType.java:24-57) as a character-level scanner following
the W3C Turtle grammar productions (IRIREF, PNAME_NS, PNAME_LN,
BLANK_NODE_LABEL, LANGTAG, INTEGER, DECIMAL, DOUBLE, the four string
forms, ANON, punctuation).

Pure Python: runs per document inside Arrow pandas UDF workers;
vectorization is across documents, not characters.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional

from ..terms import RDFSyntaxError, unescape_string, _hex_escape

# Token types
T_IRI = "IRI"                # value = raw IRI text (escapes decoded, unresolved)
T_PNAME = "PNAME"            # value = prefix (no colon), value2 = local (escapes decoded)
T_BNODE = "BNODE"            # value = label
T_STRING = "STRING"          # value = decoded lexical form, value2 = quote style: '"' "'" '"""' "'''"
T_LANGTAG = "LANGTAG"        # value = raw tag (not case-normalized)
T_INTEGER = "INTEGER"        # value = lexical form as written
T_DECIMAL = "DECIMAL"
T_DOUBLE = "DOUBLE"
T_KEYWORD = "KEYWORD"        # bare word: a, true, false, prefix, base, graph ...
T_DOT = "."
T_SEMI = ";"
T_COMMA = ","
T_LPAREN = "("
T_RPAREN = ")"
T_LBRACKET = "["
T_RBRACKET = "]"
T_LBRACE = "{"
T_RBRACE = "}"
T_HATHAT = "^^"
T_AT_PREFIX = "@prefix"
T_AT_BASE = "@base"
T_EOF = "EOF"
# RDF 1.2 (rdf12 grammar: LangNTuple.java:138-144, LangTurtleBase reified
# triples / annotation blocks)
T_LTT = "<<("                # triple term open
T_RTT = ")>>"                # triple term close
T_LQT = "<<"                 # reified-triple open (Turtle only)
T_RQT = ">>"                 # reified-triple close
T_LANN = "{|"                # annotation block open
T_RANN = "|}"                # annotation block close
T_TILDE = "~"                # reifier marker
T_VAR = "VAR"                # SPARQL ?name / $name (sparql mode only)
T_OP = "OP"                  # SPARQL operator: = != < > <= >= && || ! * / + -


class Token(NamedTuple):
    type: str
    value: str = ""
    value2: str = ""
    line: int = 0


# --- character classes (Turtle spec productions) ---------------------------

def _is_pn_chars_base(cp: int) -> bool:
    return (
        (0x41 <= cp <= 0x5A)
        or (0x61 <= cp <= 0x7A)
        or (0xC0 <= cp <= 0xD6)
        or (0xD8 <= cp <= 0xF6)
        or (0xF8 <= cp <= 0x2FF)
        or (0x370 <= cp <= 0x37D)
        or (0x37F <= cp <= 0x1FFF)
        or (0x200C <= cp <= 0x200D)
        or (0x2070 <= cp <= 0x218F)
        or (0x2C00 <= cp <= 0x2FEF)
        or (0x3001 <= cp <= 0xD7FF)
        or (0xF900 <= cp <= 0xFDCF)
        or (0xFDF0 <= cp <= 0xFFFD)
        or (0x10000 <= cp <= 0xEFFFF)
    )


def _is_pn_chars_u(cp: int) -> bool:
    return _is_pn_chars_base(cp) or cp == 0x5F  # '_'


def _is_pn_chars(cp: int) -> bool:
    return (
        _is_pn_chars_u(cp)
        or cp == 0x2D  # '-'
        or (0x30 <= cp <= 0x39)
        or cp == 0xB7
        or (0x300 <= cp <= 0x36F)
        or (0x203F <= cp <= 0x2040)
    )


_PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")
_HEXDIGITS = set("0123456789abcdefABCDEF")
_WS = " \t\r\n"
_DIGITS = set("0123456789")

# ---------------------------------------------------------------------------
# Bulk fast scan (Turtle/TriG mode).  One alternation regex matches the
# overwhelmingly common token shapes in a tight loop; every character
# class is a strict SUBSET of the corresponding grammar production, and a
# matched name token whose follow-character could extend it under the
# full grammar ('.', ':', '%', '\\', non-ASCII) aborts the scan — the
# document then re-tokenizes through the exact character scanner, so
# acceptance and token streams are identical, only the speed differs.
# ---------------------------------------------------------------------------

import re as _re

# Alternation ordered by corpus frequency; branch identified by
# m.lastindex (ints beat a string if/elif chain).  Group numbers:
#  1 ws | 2 pname | 3 num | 4 punct (incl '.') | 5 iri | 6 dstring
#  7 kw | 8 langtag | 9 sstring | 10 bnode | 11 rdf12/hathat
_MASTER = _re.compile(
    r"""(?:
  ((?:[ \t\r\n]|\#[^\n]*)+)
 |((?:[A-Za-z][A-Za-z0-9_\-]*)?:(?:[A-Za-z0-9_][A-Za-z0-9_\-]*)?)
 |([+-]?(?:(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+|\d*\.\d+|\d+))
 |([.;,\[\](]|\)(?!>>)|\{(?!\|)|\})
 |(<[^\x00-\x20<>"{}|^`\\]*>)
 |("[^"\\\n\r]*"(?!"))
 |([A-Za-z][A-Za-z0-9_\-]*)
 |(@[A-Za-z]+(?:-[A-Za-z0-9]+)*(?:--[A-Za-z]+)?)
 |('[^'\\\n\r]*'(?!'))
 |(_:[A-Za-z_0-9][A-Za-z_0-9\-]*)
 |(<<\(|<<|\)>>|>>|\{\||\|\}|~|\^\^)
)[ \t]*""",
    _re.X,
)
# NB: the trailing [ \t]* folds the overwhelmingly common single-space
# separator into the SAME match (half the matches per document);
# m.end(group) still marks the token's own end for the follow-character
# bail checks, while m.end() skips the gap.

_NAME_BAIL = frozenset(".:%\\")
_ALPHA_RUN = _re.compile(r"[A-Za-z]+")
_RDF12_TOK = {"<<(": T_LTT, "<<": T_LQT, ")>>": T_RTT, ">>": T_RQT,
              "{|": T_LANN, "|}": T_RANN, "~": T_TILDE, "^^": T_HATHAT}


class Tokenizer:
    """Character scanner.  ``strict_nt=True`` restricts to the N-Triples /
    N-Quads token set (double-quoted single-line strings only, no prefixed
    names, no bare numbers/keywords, no ANON) — positional-grammar checks
    themselves live in the parsers (cf. riot/lang/LangNTuple.java:94-177).
    """

    def __init__(self, text: str, strict_nt: bool = False, sparql: bool = False):
        self.s = text
        self.n = len(text)
        self.i = 0
        self.line = 1
        self.strict = strict_nt
        self.sparql = sparql
        self._toks: Optional[list] = None  # bulk-scan result (Turtle/TriG)
        self._tpos = 0
        self._bulk_tried = False

    # -- bulk fast scan -------------------------------------------------------

    def _bulk_scan(self) -> Optional[list]:
        """Tokenize the whole document with the master regex, or None if
        any position falls outside the fast subset (the caller then uses
        the exact character scanner — identical behavior, slower)."""
        s, n = self.s, self.n
        toks: list = []
        append = toks.append
        match = _MASTER.match
        mk = Token._make  # C-level tuple construction, no __new__ frame
        bail = _NAME_BAIL
        pos = 0
        line = 1
        while pos < n:
            m = match(s, pos)
            if m is None:
                return None
            g = m.lastindex
            v = m[g]
            end = m.end()
            if g == 1:  # whitespace / comments
                if "\n" in v:
                    line += v.count("\n")
                pos = end
                continue
            if g == 2:  # prefixed name
                te = m.end(g)  # token end (before any folded separator)
                nxt = s[te] if te < n else ""
                if nxt and (nxt in bail or ord(nxt) >= 0x80):
                    return None
                pfx, _, loc = v.partition(":")
                append(mk((T_PNAME, pfx, loc, line)))
            elif g == 4:  # punctuation (type IS the char, incl '.')
                append(mk((v, "", "", line)))
            elif g == 5:  # IRIREF
                append(mk((T_IRI, v[1:-1], "", line)))
            elif g == 6:  # double-quoted string, no escapes
                append(mk((T_STRING, v[1:-1], '"', line)))
            elif g == 3:  # number
                if "e" in v or "E" in v:
                    tt = T_DOUBLE
                elif "." in v:
                    tt = T_DECIMAL
                else:
                    tt = T_INTEGER
                append(mk((tt, v, "", line)))
            elif g == 7:  # bare keyword
                te = m.end(g)
                nxt = s[te] if te < n else ""
                if nxt and (nxt in bail or ord(nxt) >= 0x80):
                    return None
                append(mk((T_KEYWORD, v, "", line)))
            elif g == 8:  # langtag or @prefix/@base directive
                w = v[1:]
                run = _ALPHA_RUN.match(w).group()
                if run in ("prefix", "base"):
                    if w != run:
                        return None  # '@prefix-…': directive-then-error shape
                    append(mk((T_AT_PREFIX if w == "prefix" else T_AT_BASE,
                               "", "", line)))
                else:
                    append(mk((T_LANGTAG, w, "", line)))
            elif g == 9:  # single-quoted string
                append(mk((T_STRING, v[1:-1], "'", line)))
            elif g == 10:  # blank node label
                te = m.end(g)
                nxt = s[te] if te < n else ""
                if nxt and (nxt in bail or ord(nxt) >= 0x80):
                    return None
                append(mk((T_BNODE, v[2:], "", line)))
            else:  # 11: RDF 1.2 multi-char tokens + '^^'
                append(mk((_RDF12_TOK[v], "", "", line)))
            pos = end
        append(Token(T_EOF, line=line))
        return toks

    # -- low-level helpers --------------------------------------------------

    def _err(self, msg: str) -> RDFSyntaxError:
        return RDFSyntaxError(f"line {self.line}: {msg}")

    def _peek(self, k: int = 0) -> str:
        j = self.i + k
        return self.s[j] if j < self.n else ""

    _WS_RE = __import__("re").compile(r"(?:[ \t\r\n]|#[^\n]*)+")

    def _skip_ws_comments(self) -> None:
        m = self._WS_RE.match(self.s, self.i)
        if m is not None:
            self.line += m.group().count("\n")
            self.i = m.end()

    # -- main ---------------------------------------------------------------

    def tokens(self) -> Iterator[Token]:
        while True:
            t = self.next_token()
            yield t
            if t.type == T_EOF:
                return

    def next_token(self) -> Token:
        toks = self._toks
        if toks is not None:
            t = toks[self._tpos]
            if self._tpos < len(toks) - 1:
                self._tpos += 1
            return t
        if not self._bulk_tried:
            self._bulk_tried = True
            if not self.strict and not self.sparql and self.i == 0:
                scanned = self._bulk_scan()
                if scanned is not None:
                    self._toks = scanned
                    return self.next_token()
        self._skip_ws_comments()
        if self.i >= self.n:
            return Token(T_EOF, line=self.line)
        c = self.s[self.i]
        ln = self.line

        if c == "<":
            # SPARQL mode: "<" is a comparison operator when it cannot
            # start an IRIREF (followed by space, '=', digit, or var) —
            # except that '<?...>' / '<2...>' ARE legal relative IRIREFs
            # (dawg syntax-general-12): scan ahead for a closing '>'
            # before any whitespace to disambiguate, like the reference
            # tokenizer's lookahead.
            if self.sparql and self._peek(1) in " \t\r\n=?$0123456789":
                if self._peek(1) not in " \t\r\n=":
                    j = self.i + 1
                    s_, n_ = self.s, self.n
                    while j < n_ and s_[j] not in ' \t\r\n<>"{}|^`\\':
                        j += 1
                    if j < n_ and s_[j] == ">":
                        return self._iri()
                return self._sparql_op()
            if self._peek(1) == "<":
                # RDF 1.2: "<<(" triple term / "<<" reified triple
                # (also valid in SPARQL 1.2 patterns/expressions)
                if self._peek(2) == "(":
                    self.i += 3
                    return Token(T_LTT, line=ln)
                if self.strict:
                    raise self._err("'<<' reified triple not allowed in N-Triples")
                self.i += 2
                return Token(T_LQT, line=ln)
            return self._iri()
        if c == '"' or c == "'":
            if self.strict and c == "'":
                raise self._err("single-quoted string not allowed in N-Triples")
            return self._string(c)
        if c == "_":
            return self._bnode_label()
        if c == "@":
            return self._at()
        if c == "^":
            if self._peek(1) == "^":
                self.i += 2
                return Token(T_HATHAT, line=ln)
            if self.sparql:  # inverse-path operator
                self.i += 1
                return Token(T_OP, "^", line=ln)
            raise self._err("lone '^'")
        if c in ".;,()[]{}":
            # '.' may start a decimal like .5 (Turtle DOUBLE/DECIMAL)
            if c == "." and not self.strict and self._peek(1) in _DIGITS:
                return self._number()
            # RDF 1.2 closers/openers that share a first character
            if c == ")" and self._peek(1) == ">" and self._peek(2) == ">":
                self.i += 3
                return Token(T_RTT, line=ln)
            if c == "{" and self._peek(1) == "|":
                self.i += 2
                return Token(T_LANN, line=ln)
            self.i += 1
            return Token(c, line=ln)
        if not self.sparql:
            if c == ">" and self._peek(1) == ">":
                self.i += 2
                return Token(T_RQT, line=ln)
            if c == "|" and self._peek(1) == "}":
                self.i += 2
                return Token(T_RANN, line=ln)
            if c == "~" and not self.strict:
                self.i += 1
                return Token(T_TILDE, line=ln)
        if self.sparql:
            if c in "?$":
                return self._sparql_var()
            if c == "~":  # reifier marker (SPARQL 1.2)
                self.i += 1
                return Token(T_TILDE, line=ln)
            if c in "=!<>&|*/+-" and not (
                c in "+-" and self._peek(1) in _DIGITS
            ):
                return self._sparql_op()
        if c in "+-" or c in _DIGITS:
            if self.strict:
                raise self._err("bare numbers not allowed in N-Triples")
            return self._number()
        # prefixed name or bare keyword
        if self.strict:
            raise self._err(f"unexpected character {c!r}")
        return self._pname_or_keyword()

    # -- productions ---------------------------------------------------------

    _IRI_FAST = __import__("re").compile(r'<([^\x00-\x20<>"{}|^`\\]*)>')
    _STR_FAST = {
        '"': __import__("re").compile(r'"([^"\\\n\r]*)"'),
        "'": __import__("re").compile(r"'([^'\\\n\r]*)'"),
    }

    def _sparql_var(self) -> Token:
        ln = self.line
        s = self.s
        i = self.i + 1
        j = i
        while j < self.n and (_is_pn_chars_u(ord(s[j])) or s[j].isdigit()):
            j += 1
        if j == i:
            # bare '?' with no name: the zero-or-one path modifier
            self.i = i
            return Token(T_OP, "?", line=ln)
        self.i = j
        return Token(T_VAR, s[i:j], line=ln)

    def _sparql_op(self) -> Token:
        ln = self.line
        s = self.s
        two = s[self.i : self.i + 2]
        if two == ">>":  # SPARQL 1.2 reified-triple close
            self.i += 2
            return Token(T_RQT, line=ln)
        if two == "|}":  # SPARQL 1.2 annotation-block close
            self.i += 2
            return Token(T_RANN, line=ln)
        if two in ("!=", "<=", ">=", "&&", "||"):
            self.i += 2
            return Token(T_OP, two, line=ln)
        op = s[self.i]
        self.i += 1
        return Token(T_OP, op, line=ln)

    def _iri(self) -> Token:
        ln = self.line
        s = self.s
        m = self._IRI_FAST.match(s, self.i)
        if m is not None:  # fast path: no escapes, no illegal chars
            self.i = m.end()
            return Token(T_IRI, m.group(1), line=ln)
        i = self.i + 1
        out = []
        while True:
            if i >= self.n:
                raise self._err("unterminated IRI")
            c = s[i]
            if c == ">":
                self.i = i + 1
                return Token(T_IRI, "".join(out), line=ln)
            cp = ord(c)
            if c == "\\":
                e = s[i + 1] if i + 1 < self.n else ""
                if e == "u":
                    out.append(_hex_escape(s, i + 2, 4))
                    i += 6
                elif e == "U":
                    out.append(_hex_escape(s, i + 2, 8))
                    i += 10
                else:
                    raise self._err(f"illegal escape \\{e} in IRI")
                continue
            if cp <= 0x20 or c in '<"{}|^`':
                raise self._err(f"illegal character {c!r} in IRI")
            out.append(c)
            i += 1

    def _string(self, q: str) -> Token:
        ln = self.line
        s = self.s
        if s.startswith(q * 3, self.i):
            return self._long_string(q)
        m = self._STR_FAST[q].match(s, self.i)
        if m is not None:  # fast path: no escapes/newlines
            self.i = m.end()
            return Token(T_STRING, m.group(1), q, line=ln)
        i = self.i + 1
        out = []
        while True:
            if i >= self.n:
                raise self._err("unterminated string")
            c = s[i]
            if c == q:
                self.i = i + 1
                return Token(T_STRING, "".join(out), q, line=ln)
            if c == "\n" or c == "\r":
                raise self._err("newline in single-line string")
            if c == "\\":
                e = s[i + 1] if i + 1 < self.n else ""
                if e == "u":
                    out.append(_hex_escape(s, i + 2, 4))
                    i += 6
                elif e == "U":
                    out.append(_hex_escape(s, i + 2, 8))
                    i += 10
                elif e in 'tbnrf"\'\\':
                    out.append(unescape_string("\\" + e))
                    i += 2
                else:
                    raise self._err(f"illegal string escape \\{e}")
                continue
            out.append(c)
            i += 1

    def _long_string(self, q: str) -> Token:
        ln = self.line
        s = self.s
        i = self.i + 3
        out = []
        while True:
            if i >= self.n:
                raise self._err("unterminated long string")
            if s.startswith(q * 3, i):
                # The first ''' / """ closes the string (a trailing quote
                # inside must be escaped — W3C turtle-syntax-bad-string-06/07).
                self.i = i + 3
                return Token(T_STRING, "".join(out), q * 3, line=ln)
            c = s[i]
            if c == "\n":
                self.line += 1
                out.append(c)
                i += 1
                continue
            if c == "\\":
                e = s[i + 1] if i + 1 < self.n else ""
                if e == "u":
                    out.append(_hex_escape(s, i + 2, 4))
                    i += 6
                elif e == "U":
                    out.append(_hex_escape(s, i + 2, 8))
                    i += 10
                elif e in 'tbnrf"\'\\':
                    out.append(unescape_string("\\" + e))
                    i += 2
                else:
                    raise self._err(f"illegal string escape \\{e}")
                continue
            out.append(c)
            i += 1

    def _bnode_label(self) -> Token:
        ln = self.line
        s = self.s
        if self._peek(1) != ":":
            raise self._err("'_' must start '_:'")
        i = self.i + 2
        if i >= self.n:
            raise self._err("empty blank node label")
        cp = ord(s[i])
        if not (_is_pn_chars_u(cp) or 0x30 <= cp <= 0x39):
            raise self._err(f"bad first char in blank node label: {s[i]!r}")
        j = i + 1
        last_good = j
        while j < self.n:
            c = s[j]
            if c == ".":
                # dots allowed inside but not at end
                j += 1
                continue
            if _is_pn_chars(ord(c)):
                j += 1
                last_good = j
                continue
            break
        # trim trailing dots
        label = s[i:last_good]
        self.i = last_good
        return Token(T_BNODE, label, line=ln)

    def _at(self) -> Token:
        ln = self.line
        s = self.s
        i = self.i + 1
        j = i
        while j < self.n and (s[j].isascii() and s[j].isalpha()):
            j += 1
        word = s[i:j]
        if word == "prefix" and not self.strict:
            self.i = j
            return Token(T_AT_PREFIX, line=ln)
        if word == "base" and not self.strict:
            self.i = j
            return Token(T_AT_BASE, line=ln)
        if not word:
            raise self._err("empty language tag")
        # LANGTAG: [a-zA-Z]+ ('-' [a-zA-Z0-9]+)* ('--' [a-zA-Z]+)?
        # (the '--dir' suffix is the RDF 1.2 base-direction:
        # ParserProfileStd.java:335-343; value keeps the raw '--dir')
        parts = [word]
        direction = None
        while j < self.n and s[j] == "-":
            k = j + 1
            if k < self.n and s[k] == "-":
                # '--' starts the direction suffix
                m = k + 1
                d0 = m
                while m < self.n and s[m].isascii() and s[m].isalpha():
                    m += 1
                if m == d0:
                    raise self._err("empty base direction after '--'")
                direction = s[d0:m]
                j = m
                break
            m = k
            while m < self.n and s[m].isascii() and s[m].isalnum():
                m += 1
            if m == k:
                raise self._err("empty language subtag")
            parts.append(s[k:m])
            j = m
        self.i = j
        tag = "-".join(parts)
        if direction is not None:
            tag = f"{tag}--{direction}"
        return Token(T_LANGTAG, tag, line=ln)

    def _number(self) -> Token:
        ln = self.line
        s = self.s
        i = self.i
        j = i
        if s[j] in "+-":
            j += 1
        int_digits = 0
        while j < self.n and s[j] in _DIGITS:
            j += 1
            int_digits += 1
        frac_digits = 0
        has_dot = False
        if j < self.n and s[j] == ".":
            # Only consume the dot if digits follow OR an exponent follows
            # digits after dot... Turtle: DECIMAL requires digits after dot;
            # "1." is INTEGER followed by DOT; "1.e0" is invalid.
            k = j + 1
            while k < self.n and s[k] in _DIGITS:
                k += 1
                frac_digits += 1
            if frac_digits > 0 or (int_digits > 0 and k < self.n and s[k] in "eE"):
                has_dot = True
                j = k
        has_exp = False
        if j < self.n and s[j] in "eE" and (int_digits > 0 or frac_digits > 0):
            k = j + 1
            if k < self.n and s[k] in "+-":
                k += 1
            exp_digits = 0
            while k < self.n and s[k] in _DIGITS:
                k += 1
                exp_digits += 1
            if exp_digits == 0:
                raise self._err("malformed double exponent")
            has_exp = True
            j = k
        if int_digits == 0 and frac_digits == 0:
            raise self._err("malformed number")
        lex = s[i:j]
        self.i = j
        if has_exp:
            return Token(T_DOUBLE, lex, line=ln)
        if has_dot:
            if frac_digits == 0:
                raise self._err("malformed decimal")
            return Token(T_DECIMAL, lex, line=ln)
        return Token(T_INTEGER, lex, line=ln)

    def _pname_or_keyword(self) -> Token:
        ln = self.line
        s = self.s
        i = self.i
        # scan prefix part: PN_PREFIX (may be empty before ':')
        j = i
        if j < self.n and s[j] != ":":
            cp = ord(s[j])
            if not _is_pn_chars_base(cp):
                raise self._err(f"unexpected character {s[j]!r}")
            j += 1
            last_good = j
            while j < self.n:
                c = s[j]
                if c == ".":
                    j += 1
                    continue
                if _is_pn_chars(ord(c)):
                    j += 1
                    last_good = j
                    continue
                break
            j = last_good
        word = s[i:j]
        if j < self.n and s[j] == ":":
            # prefixed name
            local, end = self._pn_local(j + 1)
            self.i = end
            return Token(T_PNAME, word, local, line=ln)
        if not word:
            raise self._err(f"unexpected character {s[i]!r}")
        self.i = j
        return Token(T_KEYWORD, word, line=ln)

    _PN_LOCAL_FAST = __import__("re").compile(r"[A-Za-z0-9_][A-Za-z0-9_\-]*")

    def _pn_local(self, start: int) -> tuple[str, int]:
        """PN_LOCAL with PLX escapes; returns (decoded local, end index).
        May be empty.  Trailing '.' not part of the name."""
        s = self.s
        # fast path: plain ASCII name not followed by a char that could
        # extend it under the full grammar ('.', ':', '%', '\\', non-ASCII)
        m = self._PN_LOCAL_FAST.match(s, start)
        if m is not None:
            j = m.end()
            if j >= self.n:
                return m.group(), j
            nxt = s[j]
            if nxt not in ".:%\\" and ord(nxt) < 0x80:
                return m.group(), j
        out = []
        i = start
        first = True
        # positions of chars appended, to trim trailing dots
        pend_dots = 0  # dots seen but not yet committed
        while i < self.n:
            c = s[i]
            cp = ord(c)
            ok: Optional[str] = None
            consumed = 1
            if c == "%":
                if i + 2 < self.n and s[i + 1] in _HEXDIGITS and s[i + 2] in _HEXDIGITS:
                    ok = s[i : i + 3]  # percent triplet kept verbatim
                    consumed = 3
                else:
                    raise self._err("bad %-escape in local name")
            elif c == "\\":
                e = s[i + 1] if i + 1 < self.n else ""
                if e in _PN_LOCAL_ESC:
                    ok = e
                    consumed = 2
                else:
                    raise self._err(f"bad local-name escape \\{e}")
            elif c == ":":
                ok = c
            elif c == ".":
                if first:
                    break  # '.' cannot start PN_LOCAL
                # defer: only keep if followed by more name chars
                pend_dots += 1
                i += 1
                continue
            elif first:
                if _is_pn_chars_u(cp) or (0x30 <= cp <= 0x39):
                    ok = c
                else:
                    break
            else:
                if _is_pn_chars(ord(c)):
                    ok = c
                else:
                    break
            if ok is None:
                break
            if pend_dots:
                out.append("." * pend_dots)
                pend_dots = 0
            out.append(ok)
            i += consumed
            first = False
        # trailing dots are not part of the local name
        return "".join(out), i - pend_dots
