"""RDFS-min materialization tests (org.apache.jena.rdfs engine parity:
subClassOf/subPropertyOf/domain/range — rules rdfs2/3/5/7/9/11)."""

import pytest

from jena_spark.inference import rdfs_closure

RDFS = "http://www.w3.org/2000/01/rdf-schema#"
T = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
SC = f"<{RDFS}subClassOf>"
SP = f"<{RDFS}subPropertyOf>"


def rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def graph(spark):
    data = [
        # schema
        ("<http://e/Dog>", SC, "<http://e/Animal>"),
        ("<http://e/Animal>", SC, "<http://e/Thing>"),
        ("<http://e/hasPet>", SP, "<http://e/keeps>"),
        ("<http://e/hasPet>", f"<{RDFS}domain>", "<http://e/Person>"),
        ("<http://e/hasPet>", f"<{RDFS}range>", "<http://e/Animal>"),
        # instance
        ("<http://e/rex>", T, "<http://e/Dog>"),
        ("<http://e/ann>", "<http://e/hasPet>", "<http://e/rex>"),
    ]
    return spark.createDataFrame(data, ["subj", "pred", "obj"])


def test_rdfs_rules(graph):
    out = rows(rdfs_closure(graph))
    # rdfs11: subClassOf transitivity
    assert ("<http://e/Dog>", SC, "<http://e/Thing>") in out
    # rdfs9 over the closed hierarchy
    assert ("<http://e/rex>", T, "<http://e/Animal>") in out
    assert ("<http://e/rex>", T, "<http://e/Thing>") in out
    # rdfs7: super-property triple
    assert ("<http://e/ann>", "<http://e/keeps>", "<http://e/rex>") in out
    # rdfs2/rdfs3: domain/range types (and their subClassOf closure)
    assert ("<http://e/ann>", T, "<http://e/Person>") in out
    assert ("<http://e/rex>", T, "<http://e/Animal>") in out
    # no duplicates
    assert len(out) == len(set(out))


def test_inferred_only_excludes_asserted(graph):
    inf = rows(rdfs_closure(graph, include_input=False))
    assert ("<http://e/rex>", T, "<http://e/Dog>") not in inf  # asserted
    assert ("<http://e/rex>", T, "<http://e/Animal>") in inf


def test_separate_schema_dataframe(spark, graph):
    schema = graph.filter(graph["pred"].isin(SC, SP))
    inst = spark.createDataFrame(
        [("<http://e/x>", T, "<http://e/Dog>")], ["subj", "pred", "obj"]
    )
    out = rows(rdfs_closure(inst, schema=schema))
    assert ("<http://e/x>", T, "<http://e/Thing>") in out
    # domain/range not in the passed schema: no ann/Person entailment
    assert all(p != f"<{RDFS}domain>" for _, p, _ in out)


def test_deep_hierarchy_converges(spark):
    n = 20
    rows_ = [(f"<http://e/C{i}>", SC, f"<http://e/C{i+1}>") for i in range(n)]
    rows_.append(("<http://e/i>", T, "<http://e/C0>"))
    g = spark.createDataFrame(rows_, ["subj", "pred", "obj"])
    out = rows(rdfs_closure(g))
    assert ("<http://e/i>", T, f"<http://e/C{n}>") in out
