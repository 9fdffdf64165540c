"""Differential FILTER [NOT] EXISTS testing vs DuckDB correlated
subqueries.

Random outer BGPs filtered by random inner BGPs, usually sharing 1-2
variables with the outer pattern.  SPARQL EXISTS uses *substitution*
semantics (reference: jena-arq sparql/engine/main/solver/ /
E_Exists via QueryIterFilterExpr): the outer solution's bindings are
substituted into the inner pattern and the filter keeps the row iff the
substituted pattern has >=1 solution.  For plain BGP inner patterns
that is exactly a correlated SQL EXISTS on the shared variables — which
is what the mirror builds, alias-per-pattern, so it shares nothing with
the engine's marker-join implementation (ops/sparql.py precomputes
EXISTS via distinct-key left joins; the no-shared-variable case
degenerates to a global emptiness test, also exercised here).
"""

import random

import duckdb
import pytest

VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VARS = ["?a", "?b", "?c", "?d"]


def _gen_pats(rng, n_lo, n_hi, vocab_vars):
    while True:
        pats = []
        for _ in range(rng.randint(n_lo, n_hi)):
            s = rng.choice(vocab_vars + VOCAB_S)
            p = rng.choice(vocab_vars[:2] + VOCAB_P)
            o = rng.choice(vocab_vars + VOCAB_O)
            pats.append((s, p, o))
        if any(t.startswith("?") for pat in pats for t in pat):
            return pats


def _outer_sql(pats):
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
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))
    return first, conds


def _exists_sql(inner, outer_first):
    """Correlated EXISTS subquery: inner vars already bound outside
    correlate by equality; fresh inner vars are existentials."""
    first = {}
    conds = []
    for i, pat in enumerate(inner):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"e{i}.{col}"
            if term.startswith("?"):
                if term in outer_first:
                    conds.append(f"{ref} = {outer_first[term]}")
                elif term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))
    frm = ", ".join(f"quads e{i}" for i in range(len(inner)))
    where = " AND ".join(conds) if conds else "1=1"
    return f"EXISTS (SELECT 1 FROM {frm} WHERE {where})"


def _simple_cond(rng, outer_vars, outer_first):
    """An error-free boolean condition over one outer var, returned as
    (sparql, sql).  Restricted to isIRI / =<iri-const> so the mirror
    never needs §17 three-valued error logic (an IRI-vs-literal '='
    is plain false, not an error) — the point of THIS layer is the
    boolean nesting around EXISTS, not expression errors (those are
    test_filter_differential.py's job)."""
    v = rng.choice(sorted(outer_vars))
    ref = outer_first[v]
    if rng.random() < 0.5:
        return f"isIRI({v})", f"{ref} LIKE '<%'"
    const = rng.choice(VOCAB_S)
    return f"{v} = {const}", f"{ref} = '{const}'"


@pytest.mark.slow  # ~2 min
def test_exists_nested_in_boolean_exprs_match_duckdb(spark):
    """EXISTS inside && / || / ! — the engine precomputes a marker
    column per EXISTS via a distinct-key left join and substitutes it
    into the expression (ops/sparql.py); this sweep checks that whole
    mechanism against DuckDB evaluating the same boolean directly."""
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(61)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(15):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(10, 45))
                }
            )
            outer = _gen_pats(rng, 1, 2, VARS)
            inner = _gen_pats(rng, 1, 2, VARS)

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            outer_first, outer_conds = _outer_sql(outer)
            ex_sql = _exists_sql(inner, outer_first)
            ex_sp = "EXISTS { " + " . ".join(" ".join(p) for p in inner) + " }"
            if rng.random() < 0.4:
                ex_sql, ex_sp = f"(NOT {ex_sql})", f"(!{ex_sp})"
            cond_sp, cond_sql = _simple_cond(
                rng, set(outer_first), outer_first
            )
            shape = rng.random()
            if shape < 0.45:
                filt_sp = f"({cond_sp} && {ex_sp})"
                filt_sql = f"(({cond_sql}) AND {ex_sql})"
            elif shape < 0.9:
                filt_sp = f"({cond_sp} || {ex_sp})"
                filt_sql = f"(({cond_sql}) OR {ex_sql})"
            else:  # two EXISTS combined
                filt_sp = f"({ex_sp} || (!{ex_sp}))"
                filt_sql = "TRUE"

            sel = ", ".join(
                f"{ref} AS {v[1:]}" for v, ref in sorted(outer_first.items())
            )
            frm = ", ".join(f"quads t{i}" for i in range(len(outer)))
            where = " AND ".join(outer_conds + [filt_sql])
            want = sorted(
                tuple(r)
                for r in con.execute(
                    f"SELECT {sel} FROM {frm} WHERE {where}"
                ).fetchall()
            )
            con.close()

            vars_sorted = sorted(outer_first)
            q = (
                "SELECT "
                + " ".join(vars_sorted)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in outer)
                + f" FILTER {filt_sp} }}"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                tuple(r[v[1:]] for v in vars_sorted)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@pytest.mark.slow  # ~2-3 min
def test_random_exists_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(43)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(25):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(10, 45))
                }
            )
            outer = _gen_pats(rng, 1, 2, VARS)
            # inner draws from the same variable pool => usually shares
            # 1-2 vars with the outer pattern; ~sometimes none (global
            # emptiness-test path)
            inner_vars = VARS if rng.random() < 0.8 else ["?x", "?y"]
            inner = _gen_pats(rng, 1, 2, inner_vars)
            negate = rng.random() < 0.5

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            outer_first, outer_conds = _outer_sql(outer)
            ex = _exists_sql(inner, outer_first)
            if negate:
                ex = "NOT " + ex
            sel = ", ".join(
                f"{ref} AS {v[1:]}" for v, ref in sorted(outer_first.items())
            )
            frm = ", ".join(f"quads t{i}" for i in range(len(outer)))
            where = " AND ".join(outer_conds + [ex])
            want = sorted(
                tuple(r)
                for r in con.execute(
                    f"SELECT {sel} FROM {frm} WHERE {where}"
                ).fetchall()
            )
            con.close()

            vars_sorted = sorted(outer_first)
            q = (
                "SELECT "
                + " ".join(vars_sorted)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in outer)
                + (" FILTER NOT EXISTS { " if negate else " FILTER EXISTS { ")
                + " . ".join(" ".join(p) for p in inner)
                + " } }"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                tuple(r[v[1:]] for v in vars_sorted)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
