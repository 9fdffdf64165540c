"""Differential GRAPH-pattern testing: random quad stores + random
``GRAPH ?g/{iri} { … }`` queries vs a mechanical DuckDB SQL mirror.

The W3C graph suites run fixed queries; this sweep randomizes the parts
that interact: how many patterns share the one active graph, whether the
graph slot is a variable or a constant, and whether a default-graph
pattern joins the GRAPH block from outside.  The semantics pinned here
(reference: jena-arq sparql/engine/main/OpExecutor.java execute(OpGraph)
/ sparql/core/DatasetGraph default-vs-named split):

- a default-graph triple pattern matches ``graph IS NULL`` rows ONLY;
- ``GRAPH ?g { t1 . t2 }`` evaluates the WHOLE block inside one named
  graph at a time (t1 and t2 must match in the SAME graph) and binds
  ?g to it — never the default graph;
- ``GRAPH <g> { … }`` pins every pattern in the block to that graph;
- ?g joins like any variable with the enclosing pattern.

The mirror is alias-per-pattern SQL with explicit graph-column equality
chains, so it cannot share a bug with the engine's OpGraph compilation.
"""

import random

import duckdb
import pytest

VOCAB_G = ["<http://e/g1>", "<http://e/g2>", "<http://e/g3>"]
VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VARS = ["?a", "?b", "?c", "?d"]  # ?g reserved for the graph slot


def _gen_store(rng):
    quads = set()
    for _ in range(rng.randint(12, 50)):
        quads.add(
            (
                rng.choice(VOCAB_G + [None, None]),  # ~40% default graph
                rng.choice(VOCAB_S),
                rng.choice(VOCAB_P),
                rng.choice(VOCAB_O),
            )
        )
    return sorted(quads, key=lambda q: (q[0] or "", q[1], q[2], q[3]))


def _gen_pats(rng, n_lo, n_hi):
    while True:
        pats = []
        for _ in range(rng.randint(n_lo, n_hi)):
            s = rng.choice(VARS + VOCAB_S)
            p = rng.choice(VARS[:2] + VOCAB_P)
            o = rng.choice(VARS + VOCAB_O)
            pats.append((s, p, o))
        if any(t.startswith("?") for pat in pats for t in pat):
            return pats


def _mirror(inner, graph_spec, outer):
    """SQL over ``quads(graph, subj, pred, obj)``.

    inner patterns get alias g{i} with a shared-graph equality chain;
    outer patterns get alias d{i} with ``graph IS NULL``.  Returns
    (sql, sorted_vars)."""
    first = {}
    conds = []

    def walk(alias, pat):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"{alias}.{col}"
            if term.startswith("?"):
                if term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                conds.append("{} = '{}'".format(ref, term.replace("'", "''")))

    for i, pat in enumerate(inner):
        walk(f"g{i}", pat)
    # one active named graph for the whole block
    conds.append("g0.graph IS NOT NULL")
    for i in range(1, len(inner)):
        conds.append(f"g{i}.graph = g0.graph")
    if graph_spec == "?g":
        first["?g"] = "g0.graph"
    else:
        conds.append("g0.graph = '{}'".format(graph_spec.replace("'", "''")))
    for i, pat in enumerate(outer):
        walk(f"d{i}", pat)
        conds.append(f"d{i}.graph IS NULL")

    sel = ", ".join(f"{ref} AS {v[1:]}" for v, ref in sorted(first.items()))
    frm = ", ".join(
        [f"quads g{i}" for i in range(len(inner))]
        + [f"quads d{i}" for i in range(len(outer))]
    )
    return f"SELECT {sel} FROM {frm} WHERE " + " AND ".join(conds), sorted(first)


@pytest.mark.slow  # ~2-3 min
def test_random_graph_patterns_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(41)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(25):
            rows = _gen_store(rng)
            inner = _gen_pats(rng, 1, 2)
            graph_spec = "?g" if rng.random() < 0.6 else rng.choice(VOCAB_G)
            outer = _gen_pats(rng, 1, 1) if rng.random() < 0.5 else []

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads "
                "(graph VARCHAR, subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?, ?)", rows)
            sql, vars_sorted = _mirror(inner, graph_spec, outer)
            want = sorted(tuple(r) for r in con.execute(sql).fetchall())
            con.close()

            q = (
                "SELECT "
                + " ".join(vars_sorted)
                + " WHERE { "
                + " . ".join(" ".join(p) for p in outer)
                + (" . " if outer else "")
                + f"GRAPH {graph_spec} {{ "
                + " . ".join(" ".join(p) for p in inner)
                + " } }"
            )
            quads = spark.createDataFrame(rows, ["graph", "subj", "pred", "obj"])
            got = sorted(
                tuple(r[v[1:]] for v in vars_sorted)
                for r in sparql_select(quads, q).collect()
            )
            assert got == want, (trial, q, got[:5], want[:5], len(got), len(want))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
