"""Differential BGP testing: random basic graph patterns vs a DuckDB
SQL mirror.

The W3C suites and the 50-query oracle gate run FIXED queries; this
sweep generates random BGPs (shared-variable joins, repeated variables
inside one pattern, fully-ground EXISTS-style patterns, cartesian
islands) and checks the engine — including its grounded-first /
rdf:type-penalized join reorderer — against a mechanically-derived SQL
join over the same quads.  The SQL mirror is pattern-by-pattern
(one table alias per triple pattern, equality on shared variables), so
it cannot share a bug with the engine's algebra.
"""

import random

import duckdb
import pytest

VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)] + [
    "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VARS = ["?a", "?b", "?c", "?d", "?e"]


def _gen_store(rng):
    quads = set()
    for _ in range(rng.randint(8, 40)):
        quads.add((rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O)))
    return sorted(quads)


def _gen_bgp(rng):
    """[(s,p,o)] with vars or constants per position; ensure >=1 var
    overall so the SELECT has columns."""
    while True:
        pats = []
        for _ in range(rng.randint(1, 4)):
            s = rng.choice(VARS + VOCAB_S)
            p = rng.choice(VARS[:3] + VOCAB_P)
            o = rng.choice(VARS + VOCAB_O)
            pats.append((s, p, o))
        if any(t.startswith("?") for pat in pats for t in pat):
            return pats


def _sql_mirror(pats):
    """FROM quads t0, quads t1, ... WHERE constants + shared-var joins;
    SELECT one column per distinct variable (first occurrence)."""
    first = {}
    conds = []
    for i, pat in enumerate(pats):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"t{i}.{col}"
            if term.startswith("?"):
                if term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                lit = term.replace("'", "''")
                conds.append(f"{ref} = '{lit}'")
    sel = ", ".join(
        f"{ref} AS {v[1:]}" for v, ref in sorted(first.items())
    )
    frm = ", ".join(f"quads t{i}" for i in range(len(pats)))
    where = " AND ".join(conds) if conds else "1=1"
    return f"SELECT {sel} FROM {frm} WHERE {where}", sorted(first)


@pytest.mark.slow  # ~3-4 min: each query pays full compile+collect
def test_random_bgps_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(23)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(30):
            rows = _gen_store(rng)
            pats = _gen_bgp(rng)
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            sql, vars_sorted = _sql_mirror(pats)
            want = sorted(tuple(r) for r in con.execute(sql).fetchall())
            con.close()

            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            q = (
                "SELECT "
                + " ".join(vars_sorted)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in pats)
                + " }"
            )
            got = sorted(
                tuple(r[v[1:]] for v in vars_sorted)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, rows[:6], got[:5], want[:5])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@pytest.mark.slow
def test_random_union_and_optional_match_duckdb(spark):
    """UNION compares as a BAG (duplicates across branches must be
    kept, absent variables NULL-padded); OPTIONAL mirrors as LEFT JOIN
    on the shared-variable equalities (single OPTIONAL => always
    well-designed)."""
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(29)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(12):
            rows = _gen_store(rng)
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])

            # --- UNION: bag compare with NULL padding ---
            pa, pb = _gen_bgp(rng), _gen_bgp(rng)
            sqla, va = _sql_mirror(pa)
            sqlb, vb = _sql_mirror(pb)
            allv = sorted(set(va) | set(vb))

            def pad(sql, have):
                cols = ", ".join(
                    f"q.{v[1:]}" if v in have else f"NULL AS {v[1:]}"
                    for v in allv
                )
                return f"SELECT {cols} FROM ({sql}) q"

            want = sorted(
                tuple(r)
                for r in con.execute(
                    pad(sqla, va) + " UNION ALL " + pad(sqlb, vb)
                ).fetchall()
            )
            q = (
                "SELECT " + " ".join(allv) + " WHERE { { "
                + " . ".join(" ".join(p) for p in pa)
                + " } UNION { "
                + " . ".join(" ".join(p) for p in pb)
                + " } }"
            )
            got = sorted(
                tuple(r[v[1:]] for v in allv)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, "union", q, got[:5], want[:5])

            # --- OPTIONAL: left-join mirror ---
            base = _gen_bgp(rng)
            opt = [next(
                pat for pat in _gen_bgp(rng) + _gen_bgp(rng)
                if any(t.startswith("?") for t in pat)
            )]  # single optional pattern, at least one variable
            bsql, bv = _sql_mirror(base)
            osql, ov = _sql_mirror(opt)
            shared = sorted(set(bv) & set(ov))
            allv = sorted(set(bv) | set(ov))
            on = (
                " AND ".join(f"b.{v[1:]} = o.{v[1:]}" for v in shared)
                or "TRUE"
            )
            cols = ", ".join(
                f"b.{v[1:]}" if v in bv else f"o.{v[1:]}" for v in allv
            )
            want = sorted(
                tuple(r)
                for r in con.execute(
                    f"SELECT {cols} FROM ({bsql}) b LEFT JOIN ({osql}) o ON {on}"
                ).fetchall()
            )
            q = (
                "SELECT " + " ".join(allv) + " WHERE { "
                + " . ".join(" ".join(p) for p in base)
                + " OPTIONAL { " + " ".join(opt[0]) + " } }"
            )
            got = sorted(
                tuple(r[v[1:]] for v in allv)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, "optional", q, got[:5], want[:5])
            con.close()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
