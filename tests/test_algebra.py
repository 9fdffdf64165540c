"""Unit tests for the SPARQL-algebra DataFrame layer."""

import pytest
from pyspark.sql import functions as F

from jena_spark.ops.algebra import (
    bgp,
    facet_counts,
    path_alt,
    path_inverse,
    path_negated,
    path_seq,
    path_transitive,
    path_zero_or_one,
)

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


@pytest.fixture(scope="module")
def tri(spark):
    rows = [
        ("<a>", RDF_TYPE, "<T>"),
        ("<b>", RDF_TYPE, "<T>"),
        ("<a>", "<knows>", "<b>"),
        ("<b>", "<knows>", "<c>"),
        ("<c>", "<knows>", "<d>"),
        ("<a>", "<name>", '"alice"'),
        ("<b>", "<name>", '"bob"'),
        ("<x>", "<likes>", "<a>"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"]).cache()


def test_bgp_two_patterns(tri):
    out = bgp(tri, [("?p", RDF_TYPE, "<T>"), ("?p", "<name>", "?n")])
    got = {(r["p"], r["n"]) for r in out.collect()}
    assert got == {("<a>", '"alice"'), ("<b>", '"bob"')}


def test_bgp_chain_join(tri):
    out = bgp(tri, [("?x", "<knows>", "?y"), ("?y", "<knows>", "?z")])
    got = {(r["x"], r["z"]) for r in out.collect()}
    assert got == {("<a>", "<c>"), ("<b>", "<d>")}


def test_bgp_same_var_twice(tri, spark):
    loops = spark.createDataFrame(
        [("<s>", "<p>", "<s>"), ("<s>", "<p>", "<o>")], ["subj", "pred", "obj"]
    )
    out = bgp(loops, [("?x", "<p>", "?x")])
    assert [r["x"] for r in out.collect()] == ["<s>"]


def test_path_seq(tri):
    out = path_seq(tri, ["<knows>", "<knows>"])
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {("<a>", "<c>"), ("<b>", "<d>")}


def test_path_alt_and_inverse(tri):
    alt = path_alt(tri, ["<knows>", "<likes>"])
    assert ("<x>", "<a>") in {(r["src"], r["dst"]) for r in alt.collect()}
    inv = path_inverse(tri, "<likes>")
    assert {(r["src"], r["dst"]) for r in inv.collect()} == {("<a>", "<x>")}


def test_path_transitive_plus(tri):
    out = path_transitive(tri, "<knows>")
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {
        ("<a>", "<b>"), ("<b>", "<c>"), ("<c>", "<d>"),
        ("<a>", "<c>"), ("<b>", "<d>"), ("<a>", "<d>"),
    }


def test_path_transitive_star_includes_reflexive(tri):
    out = path_transitive(tri, "<knows>", zero=True)
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert ("<d>", "<d>") in got and ("<a>", "<a>") in got


def test_path_zero_or_one(tri):
    out = path_zero_or_one(tri, "<knows>")
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert ("<a>", "<b>") in got and ("<c>", "<c>") in got


def test_path_negated(tri):
    out = path_negated(tri, [RDF_TYPE, "<name>"])
    preds_src = {(r["src"], r["dst"]) for r in out.collect()}
    assert ("<a>", "<b>") in preds_src and ("<x>", "<a>") in preds_src


def test_path_transitive_cycle_terminates(spark):
    rows = [("<a>", "<e>", "<b>"), ("<b>", "<e>", "<c>"), ("<c>", "<e>", "<a>")]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = path_transitive(tri, "<e>")
    assert out.count() == 9  # complete digraph over the 3-cycle


def test_facet_counts(tri):
    out = facet_counts(tri, RDF_TYPE).collect()
    assert [(r["facet_value"], r["facet_count"]) for r in out] == [("<T>", 2)]


def test_path_transitive_nonconvergence_raises(spark):
    # a 40-deep chain with max_iters=5 must raise, not silently truncate
    rows = [(f"<n{i}>", "<p>", f"<n{i+1}>") for i in range(40)]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        path_transitive(tri, "<p>", max_iters=5)
    # and with enough headroom it completes: n0 reaches all 40 successors
    full = path_transitive(tri, "<p>")
    assert full.filter(F.col("src") == "<n0>").count() == 40


def test_closure_driver_path_matches_distributed(spark):
    """Round 7's driver-small closure fast path must produce exactly the
    distributed fixpoint's row set — with and without per-graph keying,
    over a graph mixing cycles, branches and isolated edges."""
    from jena_spark.ops.algebra import closure

    rows = (
        [(f"<n{i}>", f"<n{i+1}>") for i in range(6)]          # chain
        + [("<c0>", "<c1>"), ("<c1>", "<c2>"), ("<c2>", "<c0>")]  # cycle
        + [("<b>", "<x>"), ("<b>", "<y>"), ("<z>", "<z>")]    # branch+self
    )
    rel = spark.createDataFrame(rows, ["src", "dst"])
    py = {tuple(r) for r in closure(rel).collect()}
    dist = {tuple(r) for r in closure(rel, driver_edge_cap=0).collect()}
    assert py == dist

    grows = [("g1",) + r for r in rows] + [("g2", "<n0>", "<q>")]
    grel = spark.createDataFrame(grows, ["g", "src", "dst"])
    gpy = {tuple(r) for r in closure(grel).collect()}
    gdist = {tuple(r) for r in closure(grel, driver_edge_cap=0).collect()}
    assert gpy == gdist
    assert ("g2", "<n0>", "<q>") in gpy and ("g1", "<n0>", "<q>") not in gpy


def test_closure_pair_cap_falls_back_to_distributed(spark):
    """A small edge set whose closure outgrows driver_pair_cap must fall
    back to the distributed loop and still be correct."""
    from jena_spark.ops.algebra import closure

    rows = [(f"<n{i}>", f"<n{i+1}>") for i in range(30)]  # closure = 465
    rel = spark.createDataFrame(rows, ["src", "dst"])
    out = closure(rel, driver_pair_cap=100)
    assert out.count() == 465
