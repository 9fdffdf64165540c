"""Result-set / triple serializer tests (sinks, SURVEY.md §2.1) —
round-tripped through the W3C harness readers where a reader exists."""

import json

from pyspark.sql import functions as F

from jena_spark import results as rw


def _df(spark):
    rows = [
        ("<http://e/a>", '"alice"', '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://e/b>", '"bob, jr"@en', None),
        ("_:b0", '"say \\"hi\\""', None),
    ]
    return spark.createDataFrame(rows, ["s", "name", "age"])


def test_json_roundtrips_through_harness_reader(spark, tmp_path):
    from jena_spark.w3c_sparql import read_srj

    df = _df(spark)
    doc = rw.results_to_json(df)
    p = tmp_path / "r.srj"
    p.write_text(doc, encoding="utf-8")
    kind, (vars_, rows) = read_srj(str(p))
    assert kind == "rows" and set(vars_) == {"s", "name", "age"}
    assert {"s": "<http://e/a>", "name": '"alice"',
            "age": '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'} in rows
    assert any(r.get("name") == '"bob, jr"@en' for r in rows)


def test_xml_roundtrips_through_harness_reader(spark, tmp_path):
    from jena_spark.w3c_sparql import read_srx

    df = _df(spark)
    doc = rw.results_to_xml(df)
    p = tmp_path / "r.srx"
    p.write_text(doc, encoding="utf-8")
    kind, (vars_, rows) = read_srx(str(p))
    assert kind == "rows"
    assert any(r.get("s") == "_:b0" for r in rows)
    assert any(r.get("name") == '"bob, jr"@en' for r in rows)


def test_csv_plain_values_and_quoting(spark):
    df = _df(spark)
    lines = [r.value for r in rw.results_to_csv(df).collect()]
    assert "http://e/a,alice,30" in lines
    assert any('"bob, jr"' in l for l in lines)  # comma → quoted
    assert any(l.endswith(",") for l in lines)   # unbound → empty cell


def test_tsv_keeps_encoded_terms(spark):
    df = _df(spark)
    lines = [r.value for r in rw.results_to_tsv(df).collect()]
    assert "<http://e/a>\t\"alice\"\t\"30\"^^<http://www.w3.org/2001/XMLSchema#integer>" in lines


def test_ntriples_writer_reparses_identically(spark, tmp_path):
    from jena_spark.parsers.ntriples import parse_ntriples
    from jena_spark.skolem import BNodeAllocator, doc_seed

    tri = spark.createDataFrame(
        [
            ("<http://e/a>", "<http://e/p>", '"x\\ny"'),
            ("_:b1", "<http://e/p>", "<http://e/b>"),
        ],
        ["subj", "pred", "obj"],
    )
    text = "\n".join(r.value for r in rw.triples_to_ntriples(tri).collect())
    back = parse_ntriples(text + "\n", BNodeAllocator(doc_seed("t", "t", "t")))
    assert len(back) == 2
    assert ("<http://e/a>", "<http://e/p>", '"x\\ny"') in back


def test_nquads_writer_default_and_named(spark):
    q = spark.createDataFrame(
        [
            (None, "<http://e/a>", "<http://e/p>", "<http://e/b>"),
            ("<http://e/g>", "<http://e/a>", "<http://e/p>", "<http://e/c>"),
        ],
        "graph string, subj string, pred string, obj string",
    )
    lines = sorted(r.value for r in rw.quads_to_nquads(q).collect())
    assert lines == [
        "<http://e/a> <http://e/p> <http://e/b> .",
        "<http://e/a> <http://e/p> <http://e/c> <http://e/g> .",
    ]


def test_csv_unescapes_control_chars_roundtrip(spark):
    """ADVICE r2: a literal containing a raw newline/quote/backslash must
    serialize as the RAW characters (RFC 4180-quoted), not the two-char
    NT escape sequences — verified through Python's csv reader."""
    import csv as _csv
    import io

    df = spark.createDataFrame(
        [('"line1\\nline2"', '"has \\"quote\\""', '"back\\\\slash"')],
        ["a", "b", "c"],
    )
    text = "\n".join(
        [",".join(df.columns)]
        + [r.value for r in rw.results_to_csv(df).collect()]
    )
    rows = list(_csv.reader(io.StringIO(text)))
    assert rows[0] == ["a", "b", "c"]
    assert rows[1] == ["line1\nline2", 'has "quote"', "back\\slash"]


def test_json_xml_triple_term_nested(spark):
    """ADVICE r2: RDF 1.2 triple-term bindings serialize as the nested
    'triple' object, not a fake string literal."""
    df = spark.createDataFrame(
        [('<<(<http://e/s> <http://e/p> "o")>>',)], ["t"]
    )
    doc = json.loads(rw.results_to_json(df))
    cell = doc["results"]["bindings"][0]["t"]
    assert cell["type"] == "triple"
    assert cell["value"]["subject"] == {"type": "uri", "value": "http://e/s"}
    assert cell["value"]["object"] == {"type": "literal", "value": "o"}
    # XML: parses back through the harness SRX reader
    from jena_spark.w3c_sparql import read_srx
    import tempfile, os
    xml = rw.results_to_xml(df)
    with tempfile.NamedTemporaryFile("w", suffix=".srx", delete=False) as f:
        f.write(xml)
        p = f.name
    try:
        kind, (_, rows) = read_srx(p)
    finally:
        os.unlink(p)
    assert kind == "rows"
    assert rows[0]["t"] == '<<(<http://e/s> <http://e/p> "o")>>'


def test_boolean_json_xml(spark):
    assert json.loads(rw.boolean_to_json(True)) == {"head": {}, "boolean": True}
    assert "<boolean>false</boolean>" in rw.boolean_to_xml(False)
