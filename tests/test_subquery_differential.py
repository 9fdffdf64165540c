"""Differential sub-SELECT testing: random grouped subqueries joined
with random outer BGPs vs a DuckDB derived-table mirror.

The W3C subquery suite (10 fixed tests) pins known shapes; this sweep
randomizes the join interaction — which variables the subquery
projects, whether the outer pattern shares them, DISTINCT vs grouped
COUNT — and checks the bottom-up evaluation contract (§12: the inner
SELECT evaluates independently, then joins with the enclosing group on
its projected variables).  Reference: jena-arq algebra OpGroup/OpJoin
nesting built by sparql/syntax/ElementSubQuery.

COUNT is the one aggregate mirrored here: the engine returns native
longs for it (same as SQL) so no term/value coercion can blur the
compare; term-valued aggregates get their semantics tested in
test_agg_differential.py.
"""

import random

import duckdb
import pytest

VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VARS = ["?a", "?b", "?c"]


def _gen_pats(rng, n_lo, n_hi):
    while True:
        pats = []
        for _ in range(rng.randint(n_lo, n_hi)):
            pats.append(
                (
                    rng.choice(VARS + VOCAB_S),
                    rng.choice(VARS[:1] + VOCAB_P),
                    rng.choice(VARS + VOCAB_O),
                )
            )
        if any(t.startswith("?") for pat in pats for t in pat):
            return pats


def _pat_sql(pats):
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
    frm = ", ".join(f"quads t{i}" for i in range(len(pats)))
    where = " AND ".join(conds) if conds else "1=1"
    return first, frm, where


@pytest.mark.slow  # ~2 min
def test_random_subqueries_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(67)
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
            outer = _gen_pats(rng, 1, 2)
            inner = _gen_pats(rng, 1, 2)
            inner_vars = sorted(
                {t for pat in inner for t in pat if t.startswith("?")}
            )
            grouped = rng.random() < 0.6 and inner_vars
            if grouped:
                key = rng.choice(inner_vars)
                sub_proj = [key, "?n"]
                sub_sp = (
                    f"{{ SELECT {key} (COUNT(*) AS ?n) WHERE {{ "
                    + " . ".join(" ".join(p) for p in inner)
                    + f" }} GROUP BY {key} }}"
                )
            else:
                sub_proj = list(inner_vars)  # _gen_pats guarantees >=1 var
                sub_sp = (
                    "{ SELECT DISTINCT "
                    + " ".join(sub_proj)
                    + " WHERE { "
                    + " . ".join(" ".join(p) for p in inner)
                    + " } }"
                )

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            of, ofrm, owhere = _pat_sql(outer)
            inf, ifrm, iwhere = _pat_sql(inner)
            if grouped:
                isel = f"{inf[key]} AS {key[1:]}, COUNT(*) AS n"
                sub_sql = (
                    f"SELECT {isel} FROM {ifrm} WHERE {iwhere} "
                    f"GROUP BY {inf[key]}"
                )
                sub_cols = {key: f"sq.{key[1:]}", "?n": "sq.n"}
            else:
                isel = ", ".join(f"{inf[v]} AS {v[1:]}" for v in sub_proj)
                sub_sql = (
                    f"SELECT DISTINCT {isel} FROM {ifrm} WHERE {iwhere}"
                )
                sub_cols = {v: f"sq.{v[1:]}" for v in sub_proj}

            shared = sorted(set(of) & set(sub_cols))
            on = (
                " AND ".join(f"{of[v]} = {sub_cols[v]}" for v in shared)
                or "1=1"
            )
            allv = sorted(set(of) | set(sub_cols))
            sel = ", ".join(
                (f"{of[v]}" if v in of else sub_cols[v]) + f" AS {v[1:]}"
                for v in allv
            )
            want_rows = con.execute(
                f"SELECT {sel} FROM {ofrm}, ({sub_sql}) sq "
                f"WHERE {owhere} AND {on}"
            ).fetchall()
            # DuckDB COUNT(*) → int; engine → long: both land as Python
            # ints through the drivers, so plain tuple compare works
            want = sorted(tuple(r) for r in want_rows)
            con.close()

            q = (
                "SELECT "
                + " ".join(allv)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in outer)
                + " . "
                + sub_sp
                + " }"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                tuple(r[v[1:]] for v in allv)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
