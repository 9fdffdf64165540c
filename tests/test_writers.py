"""Turtle/TriG writer round-trip tests (riot/writer/TurtleShell.java
semantics: subject blocks, ';'/',' grouping, prefix compaction, bare
numeric abbreviation; every emitted document must re-parse to the SAME
triples through our own conformance-tested parser)."""

from jena_spark.parsers.turtle import parse_trig, parse_turtle
from jena_spark.skolem import BNodeAllocator, doc_seed
from jena_spark.writers import trig_lines, turtle_lines

TRIPLES = [
    ("<http://e/a>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
     "<http://e/T>"),
    ("<http://e/a>", "<http://e/p>", '"plain"'),
    ("<http://e/a>", "<http://e/p>", '"hola"@es'),
    ("<http://e/a>", "<http://e/n>",
     '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ("<http://e/a>", "<http://e/n>",
     '"4.5"^^<http://www.w3.org/2001/XMLSchema#decimal>'),
    ("<http://e/b>", "<http://e/esc>", '"line\\nbreak \\"q\\""'),
    ("_:x", "<http://e/ref>", "_:y"),
    ("<http://e/b>", "<http://e/t>",
     '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'),
    ("<http://e/b>", "<http://e/dt>",
     '"z"^^<http://e/custom#dt>'),
]


def _reparse(text):
    alloc = BNodeAllocator(doc_seed("wr", "t", "x"))
    return parse_turtle(text, "http://base/", alloc)


def test_turtle_roundtrip_and_compaction(spark):
    tri = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    text = "".join(
        r["value"] for r in turtle_lines(
            tri, {"e": "http://e/"}
        ).collect()
    )
    assert "e:a" in text and " a e:T" in text       # pname + 'a'
    assert " 42" in text and " 4.5" in text and " true" in text
    assert '"z"^^<http://e/custom#dt>' in text      # non-compactable dt
    got = sorted(_reparse(text))
    want = sorted(
        (s.replace("_:x", "").replace("_:y", ""), p, o) if False else (s, p, o)
        for s, p, o in TRIPLES
    )
    # bnode labels are allocator-renamed on reparse: compare modulo labels
    def norm(trs):
        out = []
        for s, p, o in trs:
            out.append((
                "_:" if s.startswith("_:") else s,
                p,
                "_:" if o.startswith("_:") else o,
            ))
        return sorted(out)
    assert norm(got) == norm(want)


def test_turtle_writer_distributed_parts(spark):
    rows = [
        (f"<http://e/s{i}>", "<http://e/p>", f'"v{i}"') for i in range(500)
    ]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"]).repartition(8)
    parts = turtle_lines(tri).collect()
    text = "".join(r["value"] for r in parts)
    # each non-empty partition carries its own header; the concatenation
    # still parses as one document
    assert text.count("@prefix rdf:") >= 1
    got = _reparse(text)
    assert sorted(got) == sorted(rows)


def test_trig_roundtrip(spark):
    quads = spark.createDataFrame(
        [
            (None, "<http://e/a>", "<http://e/p>", '"default"'),
            ("<http://e/g1>", "<http://e/a>", "<http://e/p>", '"one"'),
            ("<http://e/g1>", "<http://e/b>", "<http://e/p>", '"two"'),
            ("<http://e/g2>", "<http://e/a>", "<http://e/p>", '"three"'),
        ],
        "graph string, subj string, pred string, obj string",
    )
    text = "".join(r["value"] for r in trig_lines(quads).collect())
    alloc = BNodeAllocator(doc_seed("wr", "t", "x"))
    got = sorted(
        (g or "", s, p, o)
        for g, s, p, o in parse_trig(text, "http://base/", alloc)
    )
    want = sorted(
        (g or "", s, p, o)
        for g, s, p, o in [tuple(r) for r in quads.collect()]
    )
    assert got == want


def test_jsonld_roundtrip(spark):
    """Flattened JSON-LD lines re-parse (through our conformance-tested
    JSON-LD reader) to the original triples."""
    import json

    from jena_spark.parsers.jsonld import parse_jsonld
    from jena_spark.writers import jsonld_lines

    tri = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    lines = [r["value"] for r in jsonld_lines(tri).collect()]
    doc = json.dumps({"@graph": [json.loads(l) for l in lines]})
    alloc = BNodeAllocator(doc_seed("wr", "j", "x"))
    got = [(s, p, o) for _g, s, p, o in parse_jsonld(doc, None, alloc)]

    def norm(trs):
        return sorted(
            ("_:" if s.startswith("_:") else s, p,
             "_:" if o.startswith("_:") else o)
            for s, p, o in trs
        )
    assert norm(got) == norm(TRIPLES)


# ---- RDF/XML writer (jena-core rdfxml/xmloutput/impl/RDFXML_Basic.java) ----

def _reparse_xml(text):
    from jena_spark.parsers.rdfxml import parse_rdfxml

    alloc = BNodeAllocator(doc_seed("wr", "x", "x"))
    return parse_rdfxml(text, "http://base/", alloc)


def _norm_bnodes(trs):
    return sorted(
        (
            "_:" if s.startswith("_:") else s,
            p,
            "_:" if o.startswith("_:") else o,
        )
        for s, p, o in trs
    )


def test_rdfxml_roundtrip(spark):
    from jena_spark.writers import rdfxml_lines

    tri = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"]).coalesce(1)
    text = "".join(r["value"] for r in rdfxml_lines(tri).collect())
    assert text.startswith('<?xml version="1.0"')
    assert 'rdf:datatype="http://e/custom#dt"' in text
    assert 'xml:lang="es"' in text
    assert 'rdf:nodeID=' in text
    got = _reparse_xml(text)
    assert _norm_bnodes(got) == _norm_bnodes(TRIPLES)


def test_rdfxml_escaping_roundtrip(spark):
    from jena_spark.writers import rdfxml_lines

    rows = [
        ("<http://e/s>", "<http://e/p>", '"a<b> & \\"c\\" \'d\'"'),
        ("<http://e/s&x>", "<http://e/p>", "<http://e/o?a=1&b=2>"),
    ]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"]).coalesce(1)
    text = "".join(r["value"] for r in rdfxml_lines(tri).collect())
    assert "&amp;" in text and "&lt;" in text
    got = _reparse_xml(text)
    assert sorted(got) == sorted(rows)


def test_rdfxml_distributed_parts_each_valid(spark):
    """Every partition emits a COMPLETE document (XML has one root, so
    part files can't concatenate); the graph is the union of parts."""
    import xml.etree.ElementTree as ET

    from jena_spark.writers import rdfxml_lines

    rows = [
        (f"<http://e/s{i}>", "<http://e/p>", f'"v{i}"') for i in range(200)
    ]
    tri = spark.createDataFrame(rows, ["subj", "pred", "obj"]).repartition(4)
    # group emitted fragments back into per-partition documents
    frags = [
        r["value"]
        for r in rdfxml_lines(tri).collect()
    ]
    docs, cur = [], []
    for f in frags:
        cur.append(f)
        if f.startswith("</rdf:RDF"):
            docs.append("".join(cur))
            cur = []
    assert not cur and len(docs) >= 1
    got = []
    for d in docs:
        ET.fromstring(d)  # well-formed XML, single root
        got.extend(_reparse_xml(d))
    assert sorted(got) == sorted(rows)


def test_rdfxml_unsplittable_predicate_raises(spark):
    from jena_spark.writers import _split_pred

    import pytest

    with pytest.raises(ValueError):
        _split_pred("http://e/123/456/")  # no NCName suffix
    ns, local = _split_pred("http://e/ns#name1")
    assert (ns, local) == ("http://e/ns#", "name1")


# ---------------------------------------------------------------------------
# Binary RDF sinks (RDF-Thrift / RDF-Protobuf chunk streams)
# ---------------------------------------------------------------------------

QUADS = [
    (None, "<http://e/a>", "<http://e/p>", '"v1"'),
    (None, "<http://e/a>", "<http://e/n>",
     '"7"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ("<http://e/g1>", "<http://e/b>", "<http://e/p>", '"hola"@es'),
    ("<http://e/g1>", "_:x", "<http://e/ref>", "_:y"),
    ("<http://e/g2>", "<http://e/c>", "<http://e/p>",
     '"3.5"^^<http://www.w3.org/2001/XMLSchema#double>'),
]


def _parse_binary(fmt, blob):
    from jena_spark.parsers.binrdf import parse_rdf_protobuf, parse_rdf_thrift

    return (parse_rdf_thrift if fmt == "thrift" else parse_rdf_protobuf)(blob)


def _qsort(quads):
    return sorted(quads, key=lambda q: (q[0] or "", q[1], q[2], q[3]))


def test_binary_chunks_roundtrip_quads(spark):
    import pytest

    from jena_spark.writers import binary_chunks

    df = spark.createDataFrame(
        QUADS, ["graph", "subj", "pred", "obj"]
    ).repartition(4)
    for fmt in ("thrift", "protobuf"):
        chunks = [bytes(r["value"]) for r in binary_chunks(df, fmt).collect()]
        assert chunks
        # concatenation in ANY order is one valid self-delimiting stream
        got = _parse_binary(fmt, b"".join(reversed(chunks)))
        assert _qsort(got) == _qsort(QUADS)
        # each chunk is independently decodable
        per_chunk = [q for c in chunks for q in _parse_binary(fmt, c)]
        assert _qsort(per_chunk) == _qsort(QUADS)
    with pytest.raises(KeyError):
        binary_chunks(df, "cbor")


def test_binary_chunks_triples_prefixes_and_chunking(spark):
    from jena_spark.writers import binary_chunks

    rows = [
        (f"<http://e/s{i}>", "<http://e/p>",
         f'"{i}"^^<http://www.w3.org/2001/XMLSchema#integer>')
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"]).coalesce(1)
    for fmt in ("thrift", "protobuf"):
        chunks = [
            bytes(r["value"])
            for r in binary_chunks(
                df, fmt, encode_values=True,
                prefixes={"e": "http://e/"}, rows_per_chunk=10,
            ).collect()
        ]
        assert len(chunks) == 3  # 10 + 10 + 5
        for c in chunks:  # prefix table re-declared per chunk
            got = _parse_binary(fmt, c)
            assert all(g is None for g, *_ in got)
        got = _parse_binary(fmt, b"".join(chunks))
        assert sorted((s, p, o) for _, s, p, o in got) == sorted(rows)


def test_write_binary_rdf_file(spark, tmp_path):
    from jena_spark.writers import write_binary_rdf

    df = spark.createDataFrame(
        QUADS, ["graph", "subj", "pred", "obj"]
    ).repartition(3)
    for fmt, ext in (("thrift", "trdf"), ("protobuf", "rpb")):
        path = str(tmp_path / f"out.{ext}")
        write_binary_rdf(df, path, fmt, prefixes={"e": "http://e/"})
        with open(path, "rb") as f:
            got = _parse_binary(fmt, f.read())
        assert _qsort(got) == _qsort(QUADS)


def test_rdfxml_dirlang_literal_raises(spark):
    """RDF/XML has no base-direction syntax; emitting xml:lang="en--ltr"
    would round-trip to a DIFFERENT literal — refuse like triple terms."""
    import pytest

    from jena_spark.writers import rdfxml_lines

    df = spark.createDataFrame(
        [("<http://t.example/s>", "<http://t.example/p#q>", '"x"@en--ltr')],
        ["subj", "pred", "obj"],
    )
    with pytest.raises(Exception, match="directional language"):
        rdfxml_lines(df.coalesce(1)).collect()
