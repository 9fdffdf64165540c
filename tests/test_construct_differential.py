"""Differential CONSTRUCT testing: random templates × random WHERE
BGPs vs a pure-Python instantiation model.

Semantics pinned (§16.2, reference: jena-arq
sparql/engine/QueryExecutionBase templateToTriples /
sparql/syntax/Template.java):

- the template instantiates once per WHERE solution;
- an instantiation with an unbound variable, a literal in subject
  position, or a non-IRI predicate is silently SKIPPED (not an error);
- the result graph is a SET — duplicate instantiations collapse.

Unbound template variables are manufactured deliberately: ~30% of
trials wrap one WHERE pattern in OPTIONAL and let the template use its
variables.
"""

import random

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


def _match(pats, triples, base=None):
    sols = [dict()] if base is None else base
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


def _left_join(base_sols, opt_pats, triples):
    """single well-designed OPTIONAL: per base solution, extend by the
    optional pattern's matches or keep the base solution unextended."""
    out = []
    for b in base_sols:
        ext = _match(opt_pats, triples, [b])
        out.extend(ext if ext else [b])
    return out


@pytest.mark.slow  # ~2 min
def test_random_construct_match_model(spark):
    from jena_spark.ops.sparql import sparql_construct

    rng = random.Random(71)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(20):
            rows = sorted(
                {
                    (rng.choice(VOCAB_S), rng.choice(VOCAB_P), rng.choice(VOCAB_O))
                    for _ in range(rng.randint(10, 45))
                }
            )
            where = _gen_pats(rng, 1, 2)
            optional = (
                _gen_pats(rng, 1, 1) if rng.random() < 0.3 else None
            )
            wvars = sorted(
                {
                    t
                    for pat in where + (optional or [])
                    for t in pat
                    if t.startswith("?")
                }
            )
            tmpl = []
            for _ in range(rng.randint(1, 3)):
                tmpl.append(
                    (
                        rng.choice(wvars + VOCAB_S),
                        rng.choice(wvars + VOCAB_P),
                        rng.choice(wvars + VOCAB_O),
                    )
                )

            sols = _match(where, rows)
            if optional:
                sols = _left_join(sols, optional, rows)
            want = set()
            for s in sols:
                for t in tmpl:
                    if any(x.startswith("?") and x not in s for x in t):
                        continue  # unbound template var → skip
                    inst = tuple(s.get(x, x) for x in t)
                    if inst[0].startswith('"') or not inst[1].startswith("<"):
                        continue  # invalid triple → skip
                    want.add(inst)

            q = (
                "CONSTRUCT { "
                + " . ".join(" ".join(t) for t in tmpl)
                + " } WHERE { "
                + " . ".join(" ".join(p) for p in where)
                + (
                    " OPTIONAL { " + " ".join(optional[0]) + " }"
                    if optional
                    else ""
                )
                + " }"
            )
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            got = {
                (r["subj"], r["pred"], r["obj"])
                for r in sparql_construct(tri, q).collect()
            }
            assert got == want, (
                trial,
                q,
                sorted(got - want)[:5],
                sorted(want - got)[:5],
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
