"""Differential VALUES testing: random inline-data blocks (with UNDEF)
joined against random BGPs vs a DuckDB NULL-compatible-join mirror.

VALUES joins by SOLUTION COMPATIBILITY (§10.2 / algebra OpTable ⋈): an
UNDEF cell is compatible with anything and leaves the pattern's binding
in place — which a plain SQL equality join gets wrong (NULL = x is
never true).  The mirror joins on ``(v.c IS NULL OR v.c = p.c)`` per
shared column and coalesces the VALUES cell with the pattern binding,
the exact §10.2 merge.  Both prefix (VALUES first) and postfix forms
are generated, and ~20% of blocks carry a variable the BGP never binds
(the VALUES column must then survive into the result as-is).

Reference: jena-arq sparql/engine/iterator/QueryIterAssign /
algebra/table/TableData join semantics.
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
    return first, frm, (" AND ".join(conds) if conds else "1=1")


@pytest.mark.slow  # ~2 min
def test_random_values_blocks_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(79)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(20):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(10, 40))
                }
            )
            pats = _gen_pats(rng, 1, 2)
            pat_vars = sorted(
                {t for p in pats for t in p if t.startswith("?")}
            )
            # VALUES columns: 1-2 pattern vars, ~20% plus a fresh var
            vcols = rng.sample(pat_vars, min(len(pat_vars), rng.randint(1, 2)))
            if rng.random() < 0.2:
                vcols.append("?z")
            vrows = []
            for _ in range(rng.randint(1, 4)):
                vrows.append(
                    tuple(
                        None if rng.random() < 0.3 else rng.choice(VOCAB_O)
                        for _ in vcols
                    )
                )
            postfix = rng.random() < 0.5

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            cols_sql = ", ".join(f"c{i} VARCHAR" for i in range(len(vcols)))
            con.execute(f"CREATE TABLE vals ({cols_sql})")
            con.executemany(
                f"INSERT INTO vals VALUES ({', '.join('?' * len(vcols))})",
                vrows,
            )
            first, frm, where = _pat_sql(pats)
            on = []
            sel = []
            allv = sorted(set(first) | set(vcols))
            for v in allv:
                if v in first and v in vcols:
                    ci = f"v.c{vcols.index(v)}"
                    on.append(f"({ci} IS NULL OR {ci} = {first[v]})")
                    sel.append(f"{first[v]} AS {v[1:]}")
                elif v in first:
                    sel.append(f"{first[v]} AS {v[1:]}")
                else:
                    sel.append(f"v.c{vcols.index(v)} AS {v[1:]}")
            sql = (
                f"SELECT {', '.join(sel)} FROM {frm}, vals v "
                f"WHERE {where}"
                + ("".join(f" AND {c}" for c in on))
            )
            want = sorted(
                (tuple(r) for r in con.execute(sql).fetchall()),
                key=lambda t: tuple((x is None, x or "") for x in t),
            )
            con.close()

            def cell(x):
                return "UNDEF" if x is None else x

            vblock = (
                "VALUES ("
                + " ".join(vcols)
                + ") { "
                + " ".join("(" + " ".join(cell(x) for x in r) + ")" for r in vrows)
                + " }"
            )
            body = " . ".join(" ".join(p) for p in pats)
            q = (
                "SELECT "
                + " ".join(allv)
                + " WHERE { "
                + (f"{body} {vblock}" if postfix else f"{vblock} {body}")
                + " }"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                (
                    tuple(r[v[1:]] for v in allv)
                    for r in sparql_select(tri, q).collect()
                ),
                key=lambda t: tuple((x is None, x or "") for x in t),
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
