import pytest

from jena_spark.skolem import BNodeAllocator, doc_seed
from jena_spark.terms import RDFSyntaxError
from jena_spark.parsers.rdfjson import parse_rdfjson, parse_trix
from jena_spark.parsers.registry import parse_document


def alloc():
    return BNodeAllocator(doc_seed("r", "p", "c"))


def test_rdfjson_basic():
    doc = """{"http://e/s": {"http://e/p": [
        {"type": "literal", "value": "x", "lang": "en"},
        {"type": "uri", "value": "http://e/o"},
        {"type": "bnode", "value": "_:b1"}]}}"""
    out = parse_rdfjson(doc, None, alloc())
    assert ("<http://e/s>", "<http://e/p>", '"x"@en') in out
    assert ("<http://e/s>", "<http://e/p>", "<http://e/o>") in out
    assert len(out) == 3


def test_rdfjson_bad():
    with pytest.raises(RDFSyntaxError):
        parse_rdfjson('{"http://e/s": []}', None, alloc())


def test_trix_basic():
    doc = """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph><uri>http://e/g</uri>
        <triple><uri>http://e/s</uri><uri>http://e/p</uri>
          <plainLiteral xml:lang="en-GB">text</plainLiteral></triple>
        <triple><id>b</id><uri>http://e/p</uri>
          <typedLiteral datatype="http://e/dt">v</typedLiteral></triple>
      </graph>
    </TriX>"""
    out = parse_trix(doc, None, alloc())
    assert ("<http://e/g>", "<http://e/s>", "<http://e/p>", '"text"@en-GB') in out
    assert any(s.startswith("_:") and o == '"v"^^<http://e/dt>' for _, s, _, o in out)


def test_registry_dispatch():
    quads, err = parse_document(
        "r", "f.rj", "c", None,
        '{"http://e/s": {"http://e/p": [{"type": "uri", "value": "http://e/o"}]}}',
    )
    assert err is None and len(quads) == 1
    quads, err = parse_document(
        "r", "f.trix", "c", None,
        '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/"><graph>'
        "<triple><uri>http://e/s</uri><uri>http://e/p</uri><uri>http://e/o</uri></triple>"
        "</graph></TriX>",
    )
    assert err is None and quads == [(None, "<http://e/s>", "<http://e/p>", "<http://e/o>")]
