"""Differential SPARQL Update testing: random update SEQUENCES vs a
pure-Python quad-store model.

The W3C update suites run fixed scripts; this sweep composes random
``INSERT DATA`` / ``DELETE DATA`` / ``DELETE WHERE`` /
``DELETE {} INSERT {} WHERE {}`` sequences (joined with ``;``, each
operation seeing the previous one's output) and replays them through an
independent interpreter over a Python set of quads.  Semantics pinned
(reference: jena-arq sparql/modify/UpdateEngineWorker.java):

- a graph store is a SET — re-inserting an existing quad is a no-op,
  deleting an absent quad is a no-op;
- ``DELETE WHERE``'s pattern is also its template;
- in ``DELETE {} INSERT {} WHERE {}`` the WHERE matches the PRE-state,
  deletes apply before inserts, templates instantiate once per
  solution;
- operations in one request run in sequence, each against the previous
  result.

WHERE clauses here stay in the default graph (graph IS NULL rows);
named-graph data flows through the ground INSERT/DELETE DATA ops.
"""

import random

import pytest

VOCAB_S = [f"<http://e/s{i}>" for i in range(4)]
VOCAB_P = [f"<http://e/p{i}>" for i in range(3)]
VOCAB_O = VOCAB_S + ['"a"', '"b"', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>']
VOCAB_G = ["<http://e/g1>", "<http://e/g2>"]
VARS = ["?a", "?b", "?c"]


def _ground(rng):
    return (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))


def _pats(rng, n):
    out = []
    for _ in range(n):
        out.append(
            (
                rng.choice(VARS + VOCAB_S),
                rng.choice(VARS[:1] + VOCAB_P),
                rng.choice(VARS + VOCAB_O),
            )
        )
    return out


def _match(pats, triples):
    """brute-force BGP solutions over default-graph triples."""
    sols = [dict()]
    for pat in pats:
        nxt = []
        for b in sols:
            for row in triples:
                nb = dict(b)
                ok = True
                for term, val in zip(pat, row):
                    if term.startswith("?"):
                        if nb.get(term, val) != val:
                            ok = False
                            break
                        nb[term] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(nb)
        sols = nxt
    return sols


def _inst(tmpl, sol):
    return tuple(sol[t] if t.startswith("?") else t for t in tmpl)


def _valid(quad):
    """A template instantiation that would put a literal in subject
    position (or a non-IRI in predicate position) is silently SKIPPED
    (§3.1.3.1 'invalid RDF triples ... are ignored'), not an error."""
    _, s, p, _ = quad
    return not s.startswith('"') and p.startswith("<")


def _fmt(pats):
    return " . ".join(" ".join(p) for p in pats)


@pytest.mark.slow  # ~2-3 min: each sequence pays a full update compile
def test_random_update_sequences_match_model(spark):
    from jena_spark.ops.update import sparql_update

    rng = random.Random(59)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(18):
            store = {
                (rng.choice(VOCAB_G + [None, None]),) + _ground(rng)
                for _ in range(rng.randint(6, 20))
            }
            model = set(store)
            ops = []
            for _ in range(rng.randint(2, 4)):
                kind = rng.random()
                if kind < 0.3:  # INSERT DATA (mix of default + named)
                    quads = [
                        (rng.choice(VOCAB_G + [None]),) + _ground(rng)
                        for _ in range(rng.randint(1, 3))
                    ]
                    parts = [
                        f"GRAPH {g} {{ {s} {p} {o} }}" if g else f"{s} {p} {o}"
                        for g, s, p, o in quads
                    ]
                    ops.append("INSERT DATA { " + " . ".join(parts) + " }")
                    model |= set(quads)
                elif kind < 0.55:  # DELETE DATA, biased toward real rows
                    pool = sorted(
                        model, key=lambda q: tuple(x or "" for x in q)
                    )
                    quads = []
                    for _ in range(rng.randint(1, 2)):
                        if pool and rng.random() < 0.7:
                            quads.append(rng.choice(pool))
                        else:
                            quads.append((None,) + _ground(rng))
                    parts = [
                        f"GRAPH {g} {{ {s} {p} {o} }}" if g else f"{s} {p} {o}"
                        for g, s, p, o in quads
                    ]
                    ops.append("DELETE DATA { " + " . ".join(parts) + " }")
                    model -= set(quads)
                elif kind < 0.8:  # DELETE WHERE (pattern == template)
                    pats = _pats(rng, rng.randint(1, 2))
                    ops.append("DELETE WHERE { " + _fmt(pats) + " }")
                    dft = [q[1:] for q in model if q[0] is None]
                    dead = {
                        (None,) + _inst(p, sol)
                        for sol in _match(pats, dft)
                        for p in pats
                    }
                    model -= dead
                else:  # DELETE {} INSERT {} WHERE {}
                    pats = _pats(rng, rng.randint(1, 2))
                    pvars = [t for p in pats for t in p if t.startswith("?")]
                    if not pvars:
                        pvars = ["?a"]
                        pats.append(("?a", rng.choice(VOCAB_P), rng.choice(VOCAB_O)))
                    del_t = (
                        rng.choice(pvars),
                        rng.choice(VOCAB_P),
                        rng.choice(pvars + VOCAB_O),
                    )
                    ins_t = (
                        rng.choice(pvars + VOCAB_S),
                        rng.choice(VOCAB_P),
                        rng.choice(pvars + VOCAB_O),
                    )
                    ops.append(
                        "DELETE { " + " ".join(del_t) + " } "
                        "INSERT { " + " ".join(ins_t) + " } "
                        "WHERE { " + _fmt(pats) + " }"
                    )
                    dft = [q[1:] for q in model if q[0] is None]
                    sols = _match(pats, dft)
                    model -= {
                        q for s in sols
                        if _valid(q := (None,) + _inst(del_t, s))
                    }
                    model |= {
                        q for s in sols
                        if _valid(q := (None,) + _inst(ins_t, s))
                    }

            req = " ;\n".join(ops)
            df = spark.createDataFrame(
                sorted(store, key=lambda q: tuple(x or "" for x in q)),
                "graph string, subj string, pred string, obj string",
            )
            got = {
                (r["graph"], r["subj"], r["pred"], r["obj"])
                for r in sparql_update(df, req).collect()
            }
            assert got == model, (
                trial,
                req,
                sorted(got - model, key=str)[:5],
                sorted(model - got, key=str)[:5],
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
