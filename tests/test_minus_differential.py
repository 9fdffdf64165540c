"""Differential MINUS testing vs a DuckDB anti-join mirror.

MINUS (§8.3.3, algebra OpMinus) removes a left solution μ1 iff some
right solution μ2 is COMPATIBLE with it AND dom(μ1) ∩ dom(μ2) ≠ ∅ —
the disjoint-domain escape hatch is what separates MINUS from NOT
EXISTS and is the classic implementation bug (reference: jena-arq
sparql/engine/iterator/QueryIterMinus.java).

With BGP operands every solution binds exactly the pattern's variables,
so the domain test is static per query: if the left and right patterns
share NO variable, MINUS removes nothing (even when the right side
matches rows!); otherwise it mirrors as NOT EXISTS correlated on the
shared variables.  The generator produces both shapes — disjoint-var
right sides are drawn from a separate pool ~25% of the time.
"""

import random

import duckdb
import pytest

VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VARS = ["?a", "?b", "?c", "?d"]


def _gen_pats(rng, n_lo, n_hi, pool):
    while True:
        pats = []
        for _ in range(rng.randint(n_lo, n_hi)):
            pats.append(
                (
                    rng.choice(pool + VOCAB_S),
                    rng.choice(pool[:2] + VOCAB_P),
                    rng.choice(pool + VOCAB_O),
                )
            )
        if any(t.startswith("?") for pat in pats for t in pat):
            return pats


def _pat_sql(pats, prefix, outer_first=None):
    """first-occurrence refs + conds; vars already in outer_first
    correlate to the outer alias."""
    first = {}
    conds = []
    for i, pat in enumerate(pats):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"{prefix}{i}.{col}"
            if term.startswith("?"):
                if outer_first and term in outer_first:
                    conds.append(f"{ref} = {outer_first[term]}")
                elif term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))
    return first, conds


def _vars_of(pats):
    return {t for pat in pats for t in pat if t.startswith("?")}


@pytest.mark.slow  # ~2 min
def test_random_minus_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(53)
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
            left = _gen_pats(rng, 1, 2, VARS)
            # ~25%: right side from a DISJOINT variable pool → MINUS
            # must remove nothing regardless of what the right matches
            right_pool = VARS if rng.random() < 0.75 else ["?x", "?y"]
            right = _gen_pats(rng, 1, 2, right_pool)

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            lf, lconds = _pat_sql(left, "t")
            shared = _vars_of(left) & _vars_of(right)
            sel = ", ".join(f"{ref} AS {v[1:]}" for v, ref in sorted(lf.items()))
            frm = ", ".join(f"quads t{i}" for i in range(len(left)))
            conds = list(lconds)
            if shared:
                _, rconds = _pat_sql(right, "m", outer_first=lf)
                rfrm = ", ".join(f"quads m{i}" for i in range(len(right)))
                rwhere = " AND ".join(rconds) if rconds else "1=1"
                conds.append(f"NOT EXISTS (SELECT 1 FROM {rfrm} WHERE {rwhere})")
            # no shared variable: dom(μ1) ∩ dom(μ2) = ∅ → keep all
            where = " AND ".join(conds) if conds else "1=1"
            want = sorted(
                tuple(r)
                for r in con.execute(
                    f"SELECT {sel} FROM {frm} WHERE {where}"
                ).fetchall()
            )
            con.close()

            vars_sorted = sorted(lf)
            q = (
                "SELECT "
                + " ".join(vars_sorted)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in left)
                + " MINUS { "
                + " . ".join(" ".join(p) for p in right)
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
