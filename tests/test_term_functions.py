"""Tests for the SPARQL scalar function library over encoded terms."""

import pytest
from pyspark.sql import functions as F

from jena_spark.ops import functions as fn


@pytest.fixture(scope="module")
def terms(spark):
    rows = [
        ("<http://e/x>",),
        ("_:b1",),
        ('"plain"',),
        ('"hola"@es',),
        ('"42"^^<http://www.w3.org/2001/XMLSchema#integer>',),
        ('"3.5"^^<http://www.w3.org/2001/XMLSchema#decimal>',),
    ]
    return spark.createDataFrame(rows, ["t"]).cache()


def _col(df, expr, name="v"):
    return [r[name] for r in df.select(expr.alias(name)).collect()]


def test_kind_tests(terms):
    assert _col(terms, fn.is_iri(F.col("t"))) == [True, False, False, False, False, False]
    assert _col(terms, fn.is_bnode(F.col("t"))) == [False, True, False, False, False, False]
    assert _col(terms, fn.is_literal(F.col("t"))) == [False, False, True, True, True, True]
    assert _col(terms, fn.is_numeric(F.col("t"))) == [False, False, False, False, True, True]


def test_lex_lang_datatype(terms):
    assert _col(terms, fn.lex(F.col("t"))) == [
        "http://e/x", "b1", "plain", "hola", "42", "3.5",
    ]
    assert _col(terms, fn.lang(F.col("t"))) == [None, None, "", "es", "", ""]
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert _col(terms, fn.datatype(F.col("t"))) == [
        None,
        None,
        xsd + "string",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
        xsd + "integer",
        xsd + "decimal",
    ]


def test_numeric_value(terms):
    vals = _col(terms, fn.numeric_value(F.col("t")))
    assert vals[4] == 42.0 and vals[5] == 3.5
    assert vals[0] is None and vals[2] is None


def test_constructors(spark):
    df = spark.createDataFrame([("abc", "en", "http://dt")], ["s", "l", "d"])
    row = df.select(
        fn.mk_iri_col(F.col("s")).alias("i"),
        fn.str_lang(F.col("s"), F.col("l")).alias("sl"),
        fn.str_dt(F.col("s"), F.col("d")).alias("sd"),
    ).collect()[0]
    assert row["i"] == "<abc>"
    assert row["sl"] == '"abc"@en'
    assert row["sd"] == '"abc"^^<http://dt>'


def test_order_by_terms(spark):
    rows = [('"z"',), ("<http://a>",), ("_:b",), ('"a"',)]
    df = spark.createDataFrame(rows, ["t"])
    out = [r["t"] for r in fn.order_by_terms(df, "t").collect()]
    # SPARQL term order: bnodes < IRIs < literals
    assert out == ["_:b", "<http://a>", '"a"', '"z"']
