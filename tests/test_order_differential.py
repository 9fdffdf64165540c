"""Differential ORDER BY testing: random stores + random 1-2-key
ASC/DESC sorts, checked two ways that are both independent of the
engine's comparator:

1. **Multiset equality** of the result rows against a DuckDB left-join
   mirror of the WHERE clause (sorting must not add/drop/duplicate
   rows);
2. **Pairwise order soundness**: for every output pair (i < j), the
   SPARQL §15.1 ordering — re-implemented here in plain Python directly
   from the spec — must not say row_i > row_j (ASC; reversed for DESC).

The spec defines only a PARTIAL order (unbound < blank < IRI < literal;
IRIs as simple literals; numerics by value; simple strings by
codepoint).  Where two terms are spec-incomparable (bnode vs bnode,
lang-tagged literals, string vs number, value-equal numerals with
different lexical forms) the engine's total-order extension
(QueryIterSort / NodeUtils.compareRDFTerms in the reference) may pick
any order, so the checker emits NO constraint — this deliberately tests
conformance without copying either implementation's tie-breaks.

Reference: jena-arq sparql/engine/iterator/QueryIterSort.java,
sparql/util/NodeCmp.java (compareRDFTerms).
"""

import random

import duckdb
import pytest

X = "http://www.w3.org/2001/XMLSchema#"
VOCAB_S = [f"<http://e/s{i}>" for i in range(5)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = (
    VOCAB_S[:2]
    + ["_:b1", "_:b2"]
    + ['"a"', '"b"', '"Zx"', '""']
    + ['"a"@en', '"b"@en', '"a"@de']
    + [f'"{n}"^^<{X}integer>' for n in ("1", "01", "5", "-3", "42")]
    + [f'"{n}"^^<{X}double>' for n in ("1.5", "2", "-0.5")]
)


def _cat(t):
    if t is None:
        return 0
    if t.startswith("_:"):
        return 1
    if t.startswith("<"):
        return 2
    return 3


def _lit_parts(t):
    """encoded literal → ('num', float) | ('str', lex) | ('lang', ...)"""
    close = t.rindex('"')
    lex, suffix = t[1:close], t[close + 1 :]
    if suffix.startswith("^^<") and suffix[3:-1] in (
        X + "integer",
        X + "double",
        X + "decimal",
    ):
        return ("num", float(lex))
    if suffix == "":
        return ("str", lex)
    return ("lang", lex, suffix)


def _compare(a, b):
    """§15.1 partial order → -1 / 0 / 1 / None (spec-incomparable)."""
    if a == b:
        return 0
    ca, cb = _cat(a), _cat(b)
    if ca != cb:
        return -1 if ca < cb else 1
    if ca in (0, 1):  # both unbound (a==b handled) / both bnodes
        return None
    if ca == 2:  # IRIs compare as simple literals of the IRI string
        ia, ib = a[1:-1], b[1:-1]
        return -1 if ia < ib else 1 if ia > ib else 0
    pa, pb = _lit_parts(a), _lit_parts(b)
    if pa[0] == pb[0] == "num":
        if pa[1] == pb[1]:
            return None  # value-equal, different lexicals: no constraint
        return -1 if pa[1] < pb[1] else 1
    if pa[0] == pb[0] == "str":
        return -1 if pa[1] < pb[1] else 1 if pa[1] > pb[1] else 0
    return None  # lang-tagged / cross-subcategory: spec-incomparable


def _check_sequence(rows, keys):
    """rows: list of dicts; keys: [(name, desc_bool)].  Assert no pair
    violates the lexicographic partial order."""
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            for name, desc in keys:
                c = _compare(rows[i][name], rows[j][name])
                if c is None:
                    break  # incomparable: no constraint from this key on
                if c == 0:
                    continue  # tie: next key decides
                assert (c > 0) == desc, (
                    "order violation",
                    i,
                    j,
                    name,
                    "DESC" if desc else "ASC",
                    rows[i],
                    rows[j],
                )
                break
            # all keys tied → any relative order is fine
    return True


@pytest.mark.slow  # ~2 min
def test_random_order_by_is_sound_and_lossless(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(47)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(20):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(12, 50))
                }
            )
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            # WHERE { ?s ?p ?o OPTIONAL { ?s <p0> ?u } } — the OPTIONAL
            # manufactures genuinely-unbound sort keys
            nullsafe = lambda t: tuple((x is None, x or "") for x in t)
            want = sorted(
                (
                    tuple(r)
                    for r in con.execute(
                        "SELECT t0.subj, t0.obj, u.obj FROM quads t0 LEFT JOIN "
                        "(SELECT subj, obj FROM quads WHERE pred = '<http://e/p0>') u "
                        "ON t0.subj = u.subj"
                    ).fetchall()
                ),
                key=nullsafe,
            )
            con.close()

            n_keys = rng.randint(1, 2)
            keys = []
            for name in rng.sample(["o", "u", "s"], n_keys):
                keys.append((name, rng.random() < 0.5))
            order = " ".join(
                f"DESC(?{n})" if d else f"?{n}" for n, d in keys
            )
            q = (
                "SELECT ?s ?o ?u WHERE { ?s ?p ?o "
                "OPTIONAL { ?s <http://e/p0> ?u } } "
                f"ORDER BY {order}"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = [
                {"s": r["s"], "o": r["o"], "u": r["u"]}
                for r in sparql_select(tri, q).collect()
            ]
            got_multiset = sorted(
                ((r["s"], r["o"], r["u"]) for r in got), key=nullsafe
            )
            # DuckDB None == SPARQL unbound == Spark null
            assert got_multiset == want, (
                trial, q, len(got_multiset), len(want)
            )
            _check_sequence(got, keys)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
