"""SPARQL-lite SELECT subset → DataFrame compilation tests."""

import pytest

from jena_spark.ops.sparql import sparql_select
from jena_spark.terms import RDFSyntaxError

RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


@pytest.fixture(scope="module")
def tri(spark):
    rows = [
        ("<http://e/a>", RDF_TYPE, "<http://e/Person>"),
        ("<http://e/b>", RDF_TYPE, "<http://e/Person>"),
        ("<http://e/c>", RDF_TYPE, "<http://e/Robot>"),
        ("<http://e/a>", "<http://e/name>", '"alice"'),
        ("<http://e/b>", "<http://e/name>", '"bob"'),
        ("<http://e/a>", "<http://e/age>", '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://e/b>", "<http://e/age>", '"9"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://e/a>", "<http://e/knows>", "<http://e/b>"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"]).cache()


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_basic_bgp(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?n WHERE { ?p a e:Person . ?p e:name ?n }""",
    )
    assert rows(out) == [('"alice"',), ('"bob"',)]


def test_filter_numeric(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?p WHERE { ?p e:age ?a . FILTER(?a > 10) }""",
    )
    assert rows(out) == [("<http://e/a>",)]


def test_filter_string_fns(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?p WHERE { ?p e:name ?n .
             FILTER(STRSTARTS(STR(?n), "a") || CONTAINS(STR(?n), "ob")) }""",
    )
    assert rows(out) == [("<http://e/a>",), ("<http://e/b>",)]


def test_regex_and_logic(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?n WHERE { ?p e:name ?n . FILTER(REGEX(?n, "^al.*") && !ISBLANK(?p)) }""",
    )
    assert rows(out) == [('"alice"',)]


def test_optional(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?p ?n WHERE { ?p a e:Person . OPTIONAL { ?p e:knows ?n } }""",
    )
    got = dict(rows(out))
    assert got["<http://e/a>"] == "<http://e/b>"
    assert got["<http://e/b>"] is None


def test_union(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?p WHERE { { ?p a e:Person } UNION { ?p a e:Robot } }""",
    )
    assert rows(out) == [("<http://e/a>",), ("<http://e/b>",), ("<http://e/c>",)]


def test_values(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT ?p ?n WHERE { VALUES ?p { e:a e:c } ?p a ?n }""",
    )
    assert rows(out) == [
        ("<http://e/a>", "<http://e/Person>"),
        ("<http://e/c>", "<http://e/Robot>"),
    ]


def test_order_limit_distinct(tri):
    out = sparql_select(
        tri,
        """PREFIX e: <http://e/>
           SELECT DISTINCT ?t WHERE { ?p a ?t } ORDER BY ?t LIMIT 1""",
    )
    assert rows(out) == [("<http://e/Person>",)]


def test_filter_lang_datatype(tri, spark):
    extra = spark.createDataFrame(
        [("<http://e/x>", "<http://e/label>", '"hola"@es')],
        ["subj", "pred", "obj"],
    )
    out = sparql_select(
        tri.unionAll(extra),
        """PREFIX e: <http://e/>
           SELECT ?s WHERE { ?s e:label ?l . FILTER(LANG(?l) = "es") }""",
    )
    assert rows(out) == [("<http://e/x>",)]


def test_unsupported_raises(tri):
    with pytest.raises(RDFSyntaxError):
        sparql_select(tri, "SELECT ?x WHERE { ?x ?p ?o } GROUP BY ?x")
