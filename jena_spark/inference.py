"""RDFS materialization — the reference's RDFS-min fragment, Spark-first.

Re-expresses org.apache.jena.rdfs (SetupRDFS.java / BaseSetupRDFS.java
compute the vocabulary closures; engine/GraphIncRDFS applies the rules;
InfStreamRDFS materializes a stream): the rdfs:subClassOf /
rdfs:subPropertyOf / rdfs:domain / rdfs:range fragment, i.e. entailment
rules rdfs2, rdfs3, rdfs5, rdfs7, rdfs9, rdfs11.  Like the reference's
engine (and unlike the full rule reasoner) the meta level is not
chased: schema triples derived FROM instance data do not feed back —
one schema-closure pass followed by single joins reaches the fixpoint
of this fragment.

Scale shape (100 TB corpus, small ontology — the standard case):
- the vocabulary closures (subClassOf+ / subPropertyOf+) run the
  engine's semi-naive ``closure`` operator over the (small) schema
  slice — rounds = hierarchy depth;
- instance-side inference is then FOUR broadcast joins (properties ×
  subPropertyOf, × domain, × range; types × subClassOf) — the corpus
  streams once per rule, never shuffles against itself;
- output dedups only the (delta-sized) inferred triples before a plain
  union with the input (which is distinct by store invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
SUBCLASS = f"<{RDFS}subClassOf>"
SUBPROP = f"<{RDFS}subPropertyOf>"
DOMAIN = f"<{RDFS}domain>"
RANGE = f"<{RDFS}range>"


def _closure_with_self(rel: DataFrame) -> DataFrame:
    """Transitive closure of (src, dst) — reflexive pairs NOT added
    (BaseSetupRDFS keeps strict super chains; X subClassOf X adds no
    entailment this fragment reports)."""
    from .ops.algebra import closure

    return closure(rel, what="rdfs schema closure")


def rdfs_closure(
    triples: DataFrame,
    schema: DataFrame | None = None,
    include_input: bool = True,
) -> DataFrame:
    """Materialize the RDFS-min entailments of a triples DataFrame.

    ``schema``: optional separate vocabulary (TBox) DataFrame; by
    default the schema triples are taken from ``triples`` itself.
    Returns input ∪ inferred (or inferred only), distinct."""
    src = schema if schema is not None else triples
    data = triples.select("subj", "pred", "obj")

    def rel(pred: str) -> DataFrame:
        return src.filter(F.col("pred") == pred).select(
            F.col("subj").alias("src"), F.col("obj").alias("dst")
        ).distinct()

    sub_class = _closure_with_self(rel(SUBCLASS)).localCheckpoint(eager=True)
    sub_prop = _closure_with_self(rel(SUBPROP)).localCheckpoint(eager=True)
    domain = rel(DOMAIN)
    rng = rel(RANGE)

    # rdfs7: (s p o), (p ⊑+ q) → (s q o)
    props = data.filter(F.col("pred") != RDF_TYPE)
    sp = F.broadcast(sub_prop.withColumnsRenamed({"src": "__p", "dst": "__q"}))
    r7 = props.join(sp, props["pred"] == sp["__p"]).select(
        "subj", F.col("__q").alias("pred"), "obj"
    )
    prop_triples = props.unionByName(r7)

    # rdfs2/rdfs3 over the rdfs7-EXPANDED property triples (a domain on
    # the super-property catches uses of the sub-property)
    dm = F.broadcast(domain.withColumnsRenamed({"src": "__p", "dst": "__c"}))
    r2 = prop_triples.join(dm, prop_triples["pred"] == dm["__p"]).select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("__c").alias("obj")
    )
    rg = F.broadcast(rng.withColumnsRenamed({"src": "__p", "dst": "__c"}))
    r3 = prop_triples.join(rg, prop_triples["pred"] == rg["__p"]).select(
        F.col("obj").alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.col("__c").alias("obj"),
    )

    # rdfs9: all type triples (asserted + derived) × subClassOf+
    types = (
        data.filter(F.col("pred") == RDF_TYPE)
        .unionByName(r2)
        .unionByName(r3)
    )
    sc = F.broadcast(sub_class.withColumnsRenamed({"src": "__c1", "dst": "__c2"}))
    r9 = types.join(sc, types["obj"] == sc["__c1"]).select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("__c2").alias("obj")
    )

    # rdfs5 / rdfs11: the schema closures themselves are entailments
    schema_out = sub_prop.select(
        F.col("src").alias("subj"), F.lit(SUBPROP).alias("pred"),
        F.col("dst").alias("obj"),
    ).unionByName(
        sub_class.select(
            F.col("src").alias("subj"), F.lit(SUBCLASS).alias("pred"),
            F.col("dst").alias("obj"),
        )
    )

    inferred = (
        r7.unionByName(r2).unionByName(r3).unionByName(r9)
        .unionByName(schema_out)
        .dropDuplicates()
    )
    if not include_input:
        return inferred
    # input is distinct by store invariant; only subtract overlap from
    # the (delta-sized) inferred side — the corpus itself never shuffles
    fresh = inferred.join(
        data.withColumnsRenamed(
            {"subj": "__s", "pred": "__p", "obj": "__o"}
        ),
        (F.col("subj") == F.col("__s"))
        & (F.col("pred") == F.col("__p"))
        & (F.col("obj") == F.col("__o")),
        "left_anti",
    )
    return data.unionByName(fresh)
