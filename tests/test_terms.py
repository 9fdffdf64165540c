import pytest
from hypothesis import given, strategies as st

from jena_spark.terms import (
    RDFSyntaxError,
    Term,
    canonical_langtag,
    decode_term,
    encode_term,
    escape_literal,
    mk_bnode,
    mk_iri,
    mk_literal,
    unescape_string,
    XSD_STRING,
)


def test_unescape_basic():
    assert unescape_string(r"a\tb\nc") == "a\tb\nc"
    assert unescape_string(r"A\U00000042") == "AB"
    assert unescape_string(r"say \"hi\"") == 'say "hi"'


def test_unescape_bad():
    with pytest.raises(RDFSyntaxError):
        unescape_string(r"\x41")
    with pytest.raises(RDFSyntaxError):
        unescape_string("bad\\")
    with pytest.raises(RDFSyntaxError):
        unescape_string(r"\uD800")  # surrogate


def test_langtag_casing():
    # RFC 5646 canonical case (LangTags.basicFormat parity)
    assert canonical_langtag("EN") == "en"
    assert canonical_langtag("en-gb") == "en-GB"
    assert canonical_langtag("zh-hant-cn") == "zh-Hant-CN"
    assert canonical_langtag("de-CH-1901") == "de-CH-1901"
    assert canonical_langtag("en-a-BBB-x-CCC") == "en-a-bbb-x-ccc"


def test_literal_xsd_string_collapses():
    # "x" and "x"^^xsd:string are the same RDF 1.1 term
    assert mk_literal("x", datatype=XSD_STRING) == mk_literal("x")
    assert encode_term(mk_literal("x")) == '"x"'


def test_encode_decode_examples():
    t = mk_literal("a\nb", lang="en-GB")
    assert encode_term(t) == '"a\\nb"@en-GB'
    assert decode_term(encode_term(t)) == t
    i = mk_iri("http://example.org/x")
    assert encode_term(i) == "<http://example.org/x>"
    b = mk_bnode("abc")
    assert encode_term(b) == "_:abc"


@given(st.text(max_size=50))
def test_literal_roundtrip(s):
    t = mk_literal(s)
    assert decode_term(encode_term(t)) == t


@given(st.text(alphabet=st.characters(blacklist_characters='<>"{}|^`\\', min_codepoint=0x21), min_size=1, max_size=30))
def test_iri_roundtrip(s):
    t = mk_iri("http://e/" + s)
    assert decode_term(encode_term(t)) == t


def test_escape_controls():
    assert escape_literal("\x01") == "\\u0001"
    assert escape_literal('"q"') == '\\"q\\"'
