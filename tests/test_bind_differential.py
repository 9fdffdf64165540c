"""Differential BIND testing: BIND(expr AS ?new) placed MID-group vs a
DuckDB computed-column mirror.

§10.1: BIND closes the group so far — the expression sees only the
bindings to its LEFT, and patterns to its RIGHT join on the new
variable like any other.  That sequencing (OpExtend over the prefix,
then join with the suffix) is what this sweep pins; the expression
vocabulary is deliberately error-free (STR / CONCAT-with-STR /
constant) so the mirror needs no §17 error model — error semantics
inside expressions are test_filter_differential.py's job.

STR semantics mirrored (§17.4.2.5): for an IRI the IRI string (no
angle brackets), for a literal its lexical form — both as a plain
literal in the engine's encoding.

Reference: jena-arq sparql/syntax/ElementBind →
algebra OpExtend (scope checked at parse: reusing an in-scope var is a
syntax error, also probed here).
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


def _pat_sql(pats, alias_prefix, first=None, conds=None):
    first = {} if first is None else first
    conds = [] if conds is None else conds
    for i, pat in enumerate(pats):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"{alias_prefix}{i}.{col}"
            if term.startswith("?"):
                if term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))
    return first, conds


def _str_sql(ref):
    """SQL for the engine encoding of STR(term) — a plain literal whose
    lexical form is the IRI string / the literal's lexical form."""
    return (
        f"CASE WHEN {ref} LIKE '<%' THEN '\"' || trim({ref}, '<>') || '\"' "
        f"WHEN {ref} LIKE '\"%' THEN "
        f"'\"' || substr({ref}, 2, length(split_part({ref}, '\"', 2))) || '\"' "
        f"ELSE {ref} END"
    )


@pytest.mark.slow  # ~2 min
def test_random_mid_group_bind_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(89)
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
            prefix = _gen_pats(rng, 1, 2)
            pre_vars = sorted(
                {t for p in prefix for t in p if t.startswith("?")}
            )
            src = rng.choice(pre_vars)
            # BIND(STR(?src) AS ?x); the suffix pattern may use ?x in
            # the OBJECT slot (a plain-literal join key)
            use_in_suffix = rng.random() < 0.5
            if use_in_suffix:
                suffix = [
                    (
                        rng.choice(VARS + VOCAB_S),
                        rng.choice(VOCAB_P),
                        "?x",
                    )
                ]
            else:
                suffix = _gen_pats(rng, 1, 1) if rng.random() < 0.7 else []

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            first, conds = _pat_sql(prefix, "t")
            xdef = _str_sql(first[src])
            first["?x"] = xdef
            if suffix:
                first, conds = _pat_sql(suffix, "u", first, conds)
            allv = sorted(first)
            sel = ", ".join(f"{first[v]} AS {v[1:]}" for v in allv)
            frm = ", ".join(
                [f"quads t{i}" for i in range(len(prefix))]
                + [f"quads u{i}" for i in range(len(suffix))]
            )
            where = " AND ".join(conds) if conds else "1=1"
            want = sorted(
                tuple(r)
                for r in con.execute(
                    f"SELECT {sel} FROM {frm} WHERE {where}"
                ).fetchall()
            )
            con.close()

            q = (
                "SELECT "
                + " ".join(allv)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in prefix)
                + f" BIND(STR({src}) AS ?x) "
                + " . ".join(" ".join(p) for p in suffix)
                + " }"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = sorted(
                tuple(r[v[1:]] for v in allv)
                for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))

        # scope probe: BIND reusing an in-scope variable is a
        # syntax error (§10.1 "must not be already in scope")
        from jena_spark.terms import RDFSyntaxError

        tri = spark.createDataFrame(
            [("<http://e/s0>", "<http://e/p0>", '"a"')],
            ["subj", "pred", "obj"],
        )
        bad = "SELECT * WHERE { ?s <http://e/p0> ?o BIND(STR(?s) AS ?o) }"
        with pytest.raises(RDFSyntaxError):
            sparql_select(tri, bad).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
