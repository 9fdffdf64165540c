"""Differential OPTIONAL testing beyond the single well-designed case
(that one lives in test_bgp_differential.py):

1. **Sequential OPTIONALs** ``base OPT{A} OPT{B}`` — left-associative
   LeftJoin(LeftJoin(base,A),B) where the SECOND join must use
   SOLUTION COMPATIBILITY: a variable A failed to bind is NULL in the
   accumulated row, is compatible with any B binding, and takes B's
   value in the merge.  A plain SQL equality join is wrong there; the
   mirror joins on ``(acc IS NULL OR acc = b)`` and COALESCEs.
2. **Filter scoped inside OPTIONAL** ``base OPT{ A FILTER(c) }`` — the
   filter is part of the LeftJoin CONDITION (§8.3.2 / the dawg
   optional-filter cases), so it may reference base-side variables and
   its failure removes the extension, never the base row.  Mirror:
   LEFT JOIN ... ON eqs AND cond.  Conditions are drawn error-free
   (isIRI / = const) — §17 error semantics live in
   test_filter_differential.py.

Reference: jena-arq algebra/op/OpLeftJoin + QueryIterOptionalIndex;
compatibility per sparql/engine/binding/Binding.

Both shapes compare as sorted bags with NULL-safe keys.
"""

import random

import duckdb
import pytest

VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VARS = ["?a", "?b", "?c", "?d"]


def _gen_pats(rng, n_lo, n_hi):
    while True:
        pats = []
        for _ in range(rng.randint(n_lo, n_hi)):
            pats.append(
                (
                    rng.choice(VARS + VOCAB_S),
                    rng.choice(VARS[:2] + VOCAB_P),
                    rng.choice(VARS + VOCAB_O),
                )
            )
        if any(t.startswith("?") for pat in pats for t in pat):
            return pats


def _sub_sql(pats, prefix):
    """derived-table SQL + its projected vars"""
    first = {}
    conds = []
    for i, pat in enumerate(pats):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"{prefix}{i}.{col}"
            if term.startswith("?"):
                if term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))
    sel = ", ".join(f"{ref} AS {v[1:]}" for v, ref in sorted(first.items()))
    frm = ", ".join(f"quads {prefix}{i}" for i in range(len(pats)))
    where = " AND ".join(conds) if conds else "1=1"
    return f"SELECT {sel} FROM {frm} WHERE {where}", sorted(first)


def _fmt(pats):
    return " . ".join(" ".join(p) for p in pats)


def _nullsafe(t):
    return tuple((x is None, x or "") for x in t)


@pytest.mark.slow  # ~2-3 min
def test_sequential_optionals_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(97)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(18):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(10, 45))
                }
            )
            base = _gen_pats(rng, 1, 2)
            opt_a = _gen_pats(rng, 1, 1)
            opt_b = _gen_pats(rng, 1, 1)

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            qb, bv = _sub_sql(base, "t")
            qa, av = _sub_sql(opt_a, "x")
            qc, cv = _sub_sql(opt_b, "y")

            # accumulated expression per var after LeftJoin(base, A):
            # base vars are always bound; A-only vars may be NULL
            acc = {v: f"b.{v[1:]}" for v in bv}
            for v in av:
                acc.setdefault(v, f"a.{v[1:]}")
            on1 = (
                " AND ".join(f"b.{v[1:]} = a.{v[1:]}" for v in set(bv) & set(av))
                or "TRUE"
            )
            # second LeftJoin: compatibility on shared vars with the acc
            on2_parts = []
            for v in set(acc) & set(cv):
                e = acc[v]
                if v in bv:
                    on2_parts.append(f"{e} = c.{v[1:]}")  # never NULL
                else:
                    on2_parts.append(f"({e} IS NULL OR {e} = c.{v[1:]})")
            on2 = " AND ".join(on2_parts) or "TRUE"
            allv = sorted(set(acc) | set(cv))
            sel = []
            for v in allv:
                if v in acc and v in cv and v not in bv:
                    sel.append(f"COALESCE({acc[v]}, c.{v[1:]}) AS {v[1:]}")
                elif v in acc:
                    sel.append(f"{acc[v]} AS {v[1:]}")
                else:
                    sel.append(f"c.{v[1:]} AS {v[1:]}")
            sql = (
                f"SELECT {', '.join(sel)} FROM ({qb}) b "
                f"LEFT JOIN ({qa}) a ON {on1} "
                f"LEFT JOIN ({qc}) c ON {on2}"
            )
            want = sorted(
                (tuple(r) for r in con.execute(sql).fetchall()), key=_nullsafe
            )
            con.close()

            q = (
                "SELECT "
                + " ".join(allv)
                + " WHERE { "
                + _fmt(base)
                + " OPTIONAL { " + _fmt(opt_a) + " }"
                + " OPTIONAL { " + _fmt(opt_b) + " } }"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                (
                    tuple(r[v[1:]] for v in allv)
                    for r in sparql_select(tri, q).collect()
                ),
                key=_nullsafe,
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@pytest.mark.slow  # ~1-2 min
def test_filter_scoped_inside_optional_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(101)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(18):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(10, 45))
                }
            )
            base = _gen_pats(rng, 1, 2)
            opt = _gen_pats(rng, 1, 1)

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            qb, bv = _sub_sql(base, "t")
            qa, av = _sub_sql(opt, "x")
            # the filter references a var visible inside the OPTIONAL
            # group — including BASE vars (the dawg optional-filter trap)
            cand = sorted(set(bv) | set(av))
            v = rng.choice(cand)
            ref = f"a.{v[1:]}" if v in av else f"b.{v[1:]}"
            if rng.random() < 0.5:
                cond_sp, cond_sql = f"isIRI({v})", f"{ref} LIKE '<%'"
            else:
                const = rng.choice(VOCAB_S)
                cond_sp, cond_sql = f"{v} = {const}", f"{ref} = '{const}'"

            on = (
                " AND ".join(f"b.{w[1:]} = a.{w[1:]}" for w in set(bv) & set(av))
                or "TRUE"
            )
            allv = sorted(set(bv) | set(av))
            sel = ", ".join(
                (f"b.{w[1:]}" if w in bv else f"a.{w[1:]}") + f" AS {w[1:]}"
                for w in allv
            )
            sql = (
                f"SELECT {sel} FROM ({qb}) b "
                f"LEFT JOIN ({qa}) a ON {on} AND {cond_sql}"
            )
            want = sorted(
                (tuple(r) for r in con.execute(sql).fetchall()), key=_nullsafe
            )
            con.close()

            q = (
                "SELECT "
                + " ".join(allv)
                + " WHERE { "
                + _fmt(base)
                + " OPTIONAL { " + _fmt(opt) + f" FILTER({cond_sp}) }} }}"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                (
                    tuple(r[v2[1:]] for v2 in allv)
                    for r in sparql_select(tri, q).collect()
                ),
                key=_nullsafe,
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
