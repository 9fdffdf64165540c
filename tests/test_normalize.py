"""Opt-in literal canonicalization — corpus from the reference's
AbstractTestNormalization (TTL flavour, NormalizeRDFTerms.getTTL())."""

import pytest

from jena_spark.normalize import normalize_literal, normalize_triples

XSD = "http://www.w3.org/2001/XMLSchema#"


def lit(lex, dt):
    return f'"{lex}"^^<{XSD}{dt}>'


INT_CASES = [
    ("23", "23"), ("023", "23"), ("+23", "23"), ("+023", "23"),
    ("-23", "-23"), ("-0230", "-230"), ("0", "0"), ("00", "0"),
    ("+00", "0"), ("-0", "0"), ("-000", "0"),
]

DECIMAL_CASES = [
    ("0.0", "0.0"), ("1.0", "1.0"), ("1.1", "1.1"), ("0001.10", "1.1"),
    ("-0.0", "0.0"), ("+0.0", "0.0"), ("+00560.0", "560.0"),
    ("-1.0", "-1.0"), ("+1.0", "1.0"), ("+1.0001", "1.0001"),
    ("-1.000100", "-1.0001"), ("-1", "-1.0"), ("0", "0.0"),
]

DOUBLE_CASES = [
    ("1e0", "1.0e0"), ("0e0", "0.0e0"), ("00e0", "0.0e0"),
    ("0e00", "0.0e0"), ("10e0", "10.0e0"), ("1e1", "10.0e0"),
    ("-1e+0", "-1.0e0"), ("+0e01", "0.0e0"), ("1000", "1000.0e0"),
    ("+1.e4", "10000.0e0"), ("+12345.6789e+9", "1.23456789E13"),
    ("-12345.6789e+9", "-1.23456789E13"),
    ("+12345.6789e-9", "1.23456789E-5"),
    ("-12345.6789e-9", "-1.23456789E-5"),
    ("1e7", "1.0E7"), ("-1e7", "-1.0E7"), ("1e-3", "0.001e0"),
    ("1e-4", "1.0E-4"),
    ("-1.23456789012345678901234", "-1.2345678901234567e0"),
    ("NaN", "NaN"), ("INF", "INF"), ("+INF", "INF"), ("-INF", "-INF"),
    ("-0", "-0.0e0"), ("+0", "0.0e0"),
]

FLOAT_CASES = [
    ("1e0", "1.0"), ("0e0", "0.0"), ("00e0", "0.0"), ("0e00", "0.0"),
    ("10e0", "10.0"), ("1e01", "10.0"), ("1e7", "1.0E7"),
    ("-1e7", "-1.0E7"), ("1e-3", "0.001"), ("1e-4", "1.0E-4"),
    ("1.234567890", "1.2345679"), ("NaN", "NaN"), ("INF", "INF"),
    ("+INF", "INF"), ("-INF", "-INF"), ("-0", "-0.0"), ("+0", "0.0"),
]

DATETIME_CASES = [
    ("1984-01-01T07:07:07", "1984-01-01T07:07:07"),
    ("1984-01-01T07:07:07.0", "1984-01-01T07:07:07"),
    ("1984-01-01T07:07:07.00", "1984-01-01T07:07:07"),
    ("1984-01-01T07:07:07.01", "1984-01-01T07:07:07.01"),
    ("1984-01-01T07:07:07.010", "1984-01-01T07:07:07.01"),
    ("1984-01-01T07:07:07.500+05:00", "1984-01-01T07:07:07.5+05:00"),
    ("1984-01-01T07:07:07.000Z", "1984-01-01T07:07:07Z"),
]


@pytest.mark.parametrize("src,want", INT_CASES)
def test_normalize_integer(src, want):
    assert normalize_literal(lit(src, "integer")) == lit(want, "integer")


def test_normalize_integer_derived():
    assert normalize_literal(lit("-000", "int")) == lit("0", "int")
    assert normalize_literal(lit("0100", "unsignedInt")) == lit("100", "unsignedInt")
    assert normalize_literal(lit("+100", "positiveInteger")) == lit("100", "positiveInteger")
    assert normalize_literal(lit("1", "long")) == lit("1", "long")


@pytest.mark.parametrize("src,want", DECIMAL_CASES)
def test_normalize_decimal(src, want):
    assert normalize_literal(lit(src, "decimal")) == lit(want, "decimal")


@pytest.mark.parametrize("src,want", DOUBLE_CASES)
def test_normalize_double(src, want):
    assert normalize_literal(lit(src, "double")) == lit(want, "double")


@pytest.mark.parametrize("src,want", FLOAT_CASES)
def test_normalize_float(src, want):
    assert normalize_literal(lit(src, "float")) == lit(want, "float")


@pytest.mark.parametrize("src,want", DATETIME_CASES)
def test_normalize_datetime(src, want):
    assert normalize_literal(lit(src, "dateTime")) == lit(want, "dateTime")


def test_normalize_boolean_and_passthrough():
    assert normalize_literal(lit("1", "boolean")) == lit("true", "boolean")
    assert normalize_literal(lit("0", "boolean")) == lit("false", "boolean")
    assert normalize_literal(lit("true", "boolean")) == lit("true", "boolean")
    # non-literals, plain strings, unknown datatypes: untouched
    assert normalize_literal("<http://e/a>") == "<http://e/a>"
    assert normalize_literal('"x"') == '"x"'
    assert normalize_literal('"x"@en') == '"x"@en'
    assert normalize_literal('"07"^^<http://e/custom>') == '"07"^^<http://e/custom>'
    # invalid lexical: reference handlers return the node unchanged
    assert normalize_literal(lit("zz", "integer")) == lit("zz", "integer")


def test_normalize_triples_transform(spark):
    rows = [
        ("<http://e/a>", "<http://e/p>", lit("+023", "integer")),
        ("<http://e/a>", "<http://e/p>", lit("1e1", "double")),
        ("<http://e/a>", "<http://e/p>", '"plain"'),
        ("<http://e/a>", "<http://e/p>", "<http://e/b>"),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = {r["obj"] for r in normalize_triples(df).collect()}
    assert out == {
        lit("23", "integer"), lit("10.0e0", "double"), '"plain"', "<http://e/b>",
    }
