"""Differential RDFS-min materialization: random ontologies (diamonds,
deep chains, even subClassOf CYCLES) + random instance data vs a
pure-Python fixpoint of the fragment's six rules.

The fragment (reference: org.apache.jena.rdfs SetupRDFS/GraphIncRDFS;
engine: jena_spark/inference.py) is rdfs2/3/5/7/9/11 with NO meta
chasing — schema comes from the asserted schema triples only.  The
model below is a direct rule transcription:

- SP/SC = transitive closure (paths of length >= 1, so a cycle derives
  its self-pairs) of subPropertyOf / subClassOf;
- rdfs7 expands property triples by SP, and rdfs2/3 (domain/range)
  apply over the EXPANDED set (a domain on the super-property catches
  uses of the sub-property);
- rdfs9 applies SC over asserted AND derived type triples;
- rdfs5/11: the closures themselves are entailed schema triples;
- output = input ∪ inferred, distinct.

Instance objects stay IRIs (rdfs3 on a literal object would entail an
illegal literal-subject triple — out of the fragment's scope).
"""

import random

import pytest

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUBCLASS = f"<{RDFS}subClassOf>"
SUBPROP = f"<{RDFS}subPropertyOf>"
DOMAIN = f"<{RDFS}domain>"
RANGE = f"<{RDFS}range>"

CLASSES = [f"<http://e/C{i}>" for i in range(5)]
PROPS = [f"<http://e/p{i}>" for i in range(4)]
INDIVS = [f"<http://e/i{i}>" for i in range(5)]


def _trans_closure(edges):
    cl = set(edges)
    while True:
        new = {
            (a, d)
            for a, b in cl
            for c, d in cl
            if b == c and (a, d) not in cl
        }
        if not new:
            return cl
        cl |= new


def _model(triples):
    sp = _trans_closure(
        {(s, o) for s, p, o in triples if p == SUBPROP}
    )
    sc = _trans_closure(
        {(s, o) for s, p, o in triples if p == SUBCLASS}
    )
    dom = {(s, o) for s, p, o in triples if p == DOMAIN}
    rng_ = {(s, o) for s, p, o in triples if p == RANGE}
    schema_preds = {SUBCLASS, SUBPROP, DOMAIN, RANGE}
    props = {
        t for t in triples if t[1] != RDF_TYPE and t[1] not in schema_preds
    }
    # NB: the engine feeds ALL non-type triples (schema rows included)
    # through rdfs7/2/3 — but schema preds never appear in SP/dom/rng
    # sources here, so restricting to instance props is equivalent
    # unless the generator makes a schema pred a subproperty; it never
    # does.
    r7 = {(s, q, o) for s, p, o in props for pp, q in sp if pp == p}
    props_all = props | r7
    r2 = {
        (s, RDF_TYPE, c) for s, p, o in props_all for pp, c in dom if pp == p
    }
    r3 = {
        (o, RDF_TYPE, c) for s, p, o in props_all for pp, c in rng_ if pp == p
    }
    types = {t for t in triples if t[1] == RDF_TYPE} | r2 | r3
    r9 = {
        (s, RDF_TYPE, d) for s, p, c in types for cc, d in sc if cc == c
    }
    schema_out = {(a, SUBPROP, b) for a, b in sp} | {
        (a, SUBCLASS, b) for a, b in sc
    }
    return set(triples) | r7 | r2 | r3 | types | r9 | schema_out


@pytest.mark.slow  # ~1-2 min
def test_random_rdfs_closure_matches_rule_fixpoint(spark):
    from jena_spark.inference import rdfs_closure

    rng = random.Random(107)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(12):
            triples = set()
            # schema: random hierarchies — duplicates, diamonds and the
            # occasional cycle included
            for _ in range(rng.randint(2, 6)):
                a, b = rng.sample(CLASSES, 2)
                triples.add((a, SUBCLASS, b))
            if rng.random() < 0.3:  # force a cycle
                a, b = rng.sample(CLASSES, 2)
                triples.add((a, SUBCLASS, b))
                triples.add((b, SUBCLASS, a))
            for _ in range(rng.randint(1, 4)):
                a, b = rng.sample(PROPS, 2)
                triples.add((a, SUBPROP, b))
            for _ in range(rng.randint(1, 3)):
                triples.add((rng.choice(PROPS), DOMAIN, rng.choice(CLASSES)))
            for _ in range(rng.randint(1, 3)):
                triples.add((rng.choice(PROPS), RANGE, rng.choice(CLASSES)))
            # instance data
            for _ in range(rng.randint(4, 12)):
                triples.add(
                    (rng.choice(INDIVS), rng.choice(PROPS), rng.choice(INDIVS))
                )
            for _ in range(rng.randint(0, 4)):
                triples.add(
                    (rng.choice(INDIVS), RDF_TYPE, rng.choice(CLASSES))
                )

            want = _model(triples)
            df = spark.createDataFrame(
                sorted(triples), ["subj", "pred", "obj"]
            )
            got = {
                (r["subj"], r["pred"], r["obj"])
                for r in rdfs_closure(df).collect()
            }
            assert got == want, (
                trial,
                sorted(got - want)[:6],
                sorted(want - got)[:6],
                len(got),
                len(want),
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
