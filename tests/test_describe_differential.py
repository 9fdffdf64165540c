"""Differential DESCRIBE testing: random stores with blank nodes vs a
pure-Python bnode-closure model.

The engine implements the reference's default DESCRIBE handler —
subject triples of each described node plus the recursive closure over
blank-node OBJECTS (jena-arq sparql/core/describe/
DescribeBNodeClosure.java).  The model here is a six-line worklist
transcription of that definition; random stores weave bnode chains
(including cycles) through IRI nodes so the closure actually recurses.
Both DESCRIBE <const...> and DESCRIBE ?var WHERE {...} forms are
generated.
"""

import random

import pytest

IRIS = [f"<http://e/s{i}>" for i in range(4)]
BNODES = [f"_:b{i}" for i in range(4)]
PREDS = [f"<http://e/p{i}>" for i in range(3)]
LITS = ['"a"', '"b"']


def _gen_store(rng):
    rows = set()
    for _ in range(rng.randint(10, 35)):
        rows.add(
            (
                rng.choice(IRIS + BNODES),
                rng.choice(PREDS),
                rng.choice(IRIS + BNODES + LITS),
            )
        )
    return sorted(rows)


def _model(nodes, triples):
    out, seen, stack = set(), set(), list(nodes)
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        for t in triples:
            if t[0] == n:
                out.add(t)
                if t[2].startswith("_:"):
                    stack.append(t[2])
    return out


@pytest.mark.slow  # ~1-2 min
def test_random_describe_match_model(spark):
    from jena_spark.ops.sparql import sparql_query

    rng = random.Random(83)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(15):
            rows = _gen_store(rng)
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            if rng.random() < 0.5:
                targets = rng.sample(IRIS, rng.randint(1, 2))
                q = "DESCRIBE " + " ".join(targets)
                seeds = set(targets)
            else:
                p = rng.choice(PREDS)
                o = rng.choice(IRIS + LITS)
                q = f"DESCRIBE ?x WHERE {{ ?x {p} {o} }}"
                seeds = {s for s, pp, oo in rows if pp == p and oo == o}
            want = _model(seeds, rows)
            got = {
                (r["subj"], r["pred"], r["obj"])
                for r in sparql_query(tri, q).collect()
            }
            assert got == want, (
                trial,
                q,
                sorted(got - want)[:5],
                sorted(want - got)[:5],
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
