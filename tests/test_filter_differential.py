"""Differential FILTER testing: random filter expressions vs an
independent Python §17 evaluator over DuckDB-mirrored BGP bindings.

Random expression trees (comparisons, three-valued && / || / !,
arithmetic, STRLEN/UCASE/isIRI/isNumeric) are rendered to SPARQL and
evaluated by the engine; the mirror reuses the mechanical DuckDB join
for the BGP (validated by test_bgp_differential.py) and applies SPARQL
operator semantics per row in plain Python — including the parts a SQL
WHERE clause gets wrong:

- a type error in the filter expression makes the row DROP (EBV of an
  error is not true), it does not raise;
- errors propagate three-valued through && and ||: ``error && false``
  is false, ``error || true`` is true, everything else stays error
  (§17.2 extended operand table);
- ``=`` between an IRI and a literal is plain false, but between two
  literals of incomparable categories (e.g. "abc" vs 5) it is an
  ERROR (§17.4.1.7 RDFterm-equal);
- ``<`` is only defined inside a category (numeric/numeric by value,
  string/string by codepoint) — everything else errors;
- arithmetic on non-numerics errors (and so poisons the comparison
  above it).

Reference: jena-arq sparql/expr/NodeValue.java (compare,
sameValueAs), E_LogicalAnd/Or error tables.
"""

import random

import duckdb
import pytest

X = "http://www.w3.org/2001/XMLSchema#"
SUBJECTS = [f"<http://e/s{i}>" for i in range(5)]
PREDICATES = [f"<http://e/p{i}>" for i in range(3)]
OBJS = (
    [f'"{n}"^^<{X}integer>' for n in (-3, 0, 1, 2, 5, 7)]
    + ['"a"', '"b"', '"abc"', '"Zx"']
    + ["<http://e/o1>", "<http://e/o2>"]
)


class Err(Exception):
    """SPARQL expression evaluation error."""


def _parse(term):
    if term.startswith("<"):
        return ("iri", term)
    if term.endswith(f'"^^<{X}integer>'[1:]):
        return ("num", int(term[1 : term.index('"', 1)]))
    return ("str", term[1:-1])


# --- expression AST: tuples ('var', name) / ('int', n) / ('str', s) /
# (op, left, right) / (fn, arg) ------------------------------------------


def _gen_atom(rng, variables):
    r = rng.random()
    if r < 0.5:
        return ("var", rng.choice(variables))
    if r < 0.8:
        return ("int", rng.choice((-3, 0, 1, 2, 5, 7, 10)))
    return ("str", rng.choice(("a", "abc", "Zx", "")))


def _gen_value(rng, variables, depth):
    """numeric-ish subexpression (may error at runtime)."""
    if depth <= 0 or rng.random() < 0.55:
        return _gen_atom(rng, variables)
    op = rng.choice(("+", "-", "*"))
    return (
        op,
        _gen_value(rng, variables, depth - 1),
        _gen_value(rng, variables, depth - 1),
    )


def _gen_bool(rng, variables, depth):
    if depth <= 0 or rng.random() < 0.45:
        kind = rng.random()
        if kind < 0.55:
            op = rng.choice(("<", "<=", ">", ">=", "=", "!="))
            return (op, _gen_value(rng, variables, 1),
                    _gen_value(rng, variables, 1))
        if kind < 0.7:
            return ("isIRI", ("var", rng.choice(variables)))
        if kind < 0.85:
            return ("isNumeric", ("var", rng.choice(variables)))
        # STRLEN comparison: STRLEN errors on IRIs
        return ("<", ("STRLEN", ("var", rng.choice(variables))),
                ("int", rng.choice((1, 2, 8))))
    op = rng.random()
    if op < 0.4:
        return ("&&", _gen_bool(rng, variables, depth - 1),
                _gen_bool(rng, variables, depth - 1))
    if op < 0.8:
        return ("||", _gen_bool(rng, variables, depth - 1),
                _gen_bool(rng, variables, depth - 1))
    return ("!", _gen_bool(rng, variables, depth - 1))


def _to_sparql(e):
    k = e[0]
    if k == "var":
        return e[1]
    if k == "int":
        return str(e[1])
    if k == "str":
        return '"' + e[1] + '"'
    if k == "!":
        return "(! " + _to_sparql(e[1]) + ")"
    if k in ("STRLEN", "isIRI", "isNumeric"):
        return f"{k}({_to_sparql(e[1])})"
    return "(" + _to_sparql(e[1]) + f" {k} " + _to_sparql(e[2]) + ")"


# --- independent §17 evaluator -------------------------------------------


def _val(e, binding):
    """→ ('num', n) | ('str', s) | ('iri', t) | ('bool', b); raises Err."""
    k = e[0]
    if k == "var":
        return _parse(binding[e[1]])
    if k == "int":
        return ("num", e[1])
    if k == "str":
        return ("str", e[1])
    if k in ("+", "-", "*"):
        a, b = _val(e[1], binding), _val(e[2], binding)
        if a[0] != "num" or b[0] != "num":
            raise Err("arithmetic on non-numeric")
        return ("num", {"+": a[1] + b[1], "-": a[1] - b[1],
                        "*": a[1] * b[1]}[k])
    if k == "STRLEN":
        a = _val(e[1], binding)
        if a[0] != "str":
            raise Err("STRLEN on non-string")
        return ("num", len(a[1]))
    if k == "isIRI":
        return ("bool", _val(e[1], binding)[0] == "iri")
    if k == "isNumeric":
        return ("bool", _val(e[1], binding)[0] == "num")
    if k == "!":
        return ("bool", not _ebv(e[1], binding))
    if k in ("&&", "||"):
        # three-valued: evaluate both sides independently (§17.2)
        def side(sub):
            try:
                return _ebv(sub, binding)
            except Err:
                return None

        a, b = side(e[1]), side(e[2])
        if k == "&&":
            if a is False or b is False:
                return ("bool", False)
            if a is None or b is None:
                raise Err("&& with error operand")
            return ("bool", True)
        if a is True or b is True:
            return ("bool", True)
        if a is None or b is None:
            raise Err("|| with error operand")
        return ("bool", False)
    if k in ("<", "<=", ">", ">=", "=", "!="):
        a, b = _val(e[1], binding), _val(e[2], binding)
        if k in ("=", "!="):
            if a[0] == b[0] == "iri":
                r = a[1] == b[1]
            elif a[0] == b[0]:
                r = a[1] == b[1]  # same literal category: by value
            elif "iri" in (a[0], b[0]) and "bool" not in (a[0], b[0]):
                r = False  # IRI vs literal: different kinds of term
            else:
                raise Err("= on incomparable literals")
            return ("bool", r if k == "=" else not r)
        if a[0] == b[0] == "num" or a[0] == b[0] == "str":
            av, bv = a[1], b[1]
        else:
            raise Err("< on incomparable operands")
        return ("bool", {"<": av < bv, "<=": av <= bv,
                         ">": av > bv, ">=": av >= bv}[k])
    raise AssertionError(k)


def _ebv(e, binding):
    v = _val(e, binding)
    if v[0] == "bool":
        return v[1]
    if v[0] == "num":
        return v[1] != 0
    if v[0] == "str":
        return len(v[1]) > 0
    raise Err("EBV of IRI")


def _keeps(e, binding):
    try:
        return _ebv(e, binding)
    except Err:
        return False  # error → filter drops the row, never raises


@pytest.mark.slow  # ~2 min
def test_random_filters_match_python_17_semantics(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(37)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(25):
            rows = sorted(
                {
                    (
                        rng.choice(SUBJECTS),
                        rng.choice(PREDICATES),
                        rng.choice(OBJS),
                    )
                    for _ in range(rng.randint(10, 40))
                }
            )
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            # fixed two-pattern BGP sharing ?s: bindings (?s ?v ?w)
            p1, p2 = rng.choice(PREDICATES), rng.choice(PREDICATES)
            bindings = [
                {"?s": s, "?v": v, "?w": w}
                for s, v, w in con.execute(
                    "SELECT t0.subj, t0.obj, t1.obj FROM quads t0, quads t1 "
                    "WHERE t0.subj = t1.subj AND t0.pred = ? AND t1.pred = ?",
                    [p1, p2],
                ).fetchall()
            ]
            con.close()

            expr = _gen_bool(rng, ["?v", "?w"], 3)
            want = sorted(
                (b["?s"], b["?v"], b["?w"])
                for b in bindings
                if _keeps(expr, b)
            )
            q = (
                "SELECT ?s ?v ?w WHERE { "
                f"?s {p1} ?v . ?s {p2} ?w "
                f"FILTER {_to_sparql(expr)} }}"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                (r["s"], r["v"], r["w"])
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, got[:5], want[:5],
                                 len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
