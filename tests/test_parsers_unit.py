import pytest

from jena_spark.skolem import BNodeAllocator, doc_seed
from jena_spark.terms import RDFSyntaxError
from jena_spark.parsers.ntriples import parse_ntriples, parse_nquads
from jena_spark.parsers.turtle import parse_turtle, parse_trig
from jena_spark.parsers.rdfxml import parse_rdfxml
from jena_spark.parsers.jsonld import parse_jsonld
from jena_spark.parsers.registry import parse_document, detect_lang


def alloc():
    return BNodeAllocator(doc_seed("r", "p", "c"))


def test_nt_basic():
    out = parse_ntriples('<http://e/s> <http://e/p> "x" .\n', alloc())
    assert out == [("<http://e/s>", "<http://e/p>", '"x"')]


def test_nt_rejects_relative():
    with pytest.raises(RDFSyntaxError):
        parse_ntriples("<s> <http://e/p> <http://e/o> .", alloc())


def test_nq_graph():
    out = parse_nquads("<http://e/s> <http://e/p> <http://e/o> <http://e/g> .", alloc())
    assert out[0][0] == "<http://e/g>"


def test_turtle_numbers_keep_lexical_form():
    # bare tokens typed, lexical form preserved verbatim
    # (ParserProfileStd.java:307-312)
    out = parse_turtle("<http://e/s> <http://e/p> 01, 1.50, 1e0, true .", None, alloc())
    objs = {o for _, _, o in out}
    assert objs == {
        '"01"^^<http://www.w3.org/2001/XMLSchema#integer>',
        '"1.50"^^<http://www.w3.org/2001/XMLSchema#decimal>',
        '"1e0"^^<http://www.w3.org/2001/XMLSchema#double>',
        '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>',
    }


def test_turtle_collection_expansion():
    out = parse_turtle("<http://e/s> <http://e/p> (1) .", None, alloc())
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    preds = sorted(p for _, p, _ in out)
    assert preds == sorted([f"<{rdf}first>", f"<{rdf}rest>", "<http://e/p>"])
    assert len(out) == 3


def test_turtle_prefix_reassignment():
    ttl = "@prefix p: <http://a/> . p:x p:y p:z .\n@prefix p: <http://b/> . p:x p:y p:z ."
    out = parse_turtle(ttl, None, alloc())
    assert ("<http://a/x>", "<http://a/y>", "<http://a/z>") in out
    assert ("<http://b/x>", "<http://b/y>", "<http://b/z>") in out


def test_turtle_undefined_prefix_fatal():
    with pytest.raises(RDFSyntaxError):
        parse_turtle("q:x <http://e/p> <http://e/o> .", None, alloc())


def test_trig_quads():
    out = parse_trig(
        "@prefix e: <http://e/> . GRAPH e:g { e:s e:p e:o . } e:s e:q e:o .",
        None,
        alloc(),
    )
    assert ("<http://e/g>", "<http://e/s>", "<http://e/p>", "<http://e/o>") in out
    assert (None, "<http://e/s>", "<http://e/q>", "<http://e/o>") in out


def test_rdfxml_basic():
    xml = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:e="http://e/"><e:Thing rdf:about="http://e/s"><e:p>v</e:p></e:Thing></rdf:RDF>"""
    out = parse_rdfxml(xml, "http://base/", alloc())
    assert ("<http://e/s>", "<http://e/p>", '"v"') in out
    assert (
        "<http://e/s>",
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
        "<http://e/Thing>",
    ) in out


def test_jsonld_expanded():
    doc = '{"@id": "http://e/s", "http://e/p": [{"@value": "x", "@language": "en"}]}'
    out = parse_jsonld(doc, None, alloc())
    assert out == [(None, "<http://e/s>", "<http://e/p>", '"x"@en')]


def test_registry_negative_yields_zero():
    quads, err = parse_document("r", "f.ttl", "c", "turtle", "<bad .")
    assert quads == [] and err is not None and err.startswith("syntax")


def test_registry_detect():
    assert detect_lang("a/b.ttl") == "turtle"
    assert detect_lang("a/b.owl") == "rdfxml"
    assert detect_lang("a/b.py") is None
    assert detect_lang("a/b.py", "turtle") == "turtle"


def test_skolem_determinism_and_scope():
    a1 = BNodeAllocator(doc_seed("r", "p", "c"))
    a2 = BNodeAllocator(doc_seed("r", "p", "c"))
    other = BNodeAllocator(doc_seed("r", "p2", "c"))
    assert a1.get("x") == a2.get("x")
    assert a1.fresh() == a2.fresh()
    assert a1.get("x") != other.get("x")  # per-document scope


# --- round 2: widened JSON-LD subset ----------------------------------------


def _jl(doc):
    import json as _json

    return parse_jsonld(_json.dumps(doc), None, alloc())


def test_jsonld_term_definitions_and_id_coercion():
    out = _jl({
        "@context": {
            "ex": "http://ex/",
            "knows": {"@id": "http://ex/knows", "@type": "@id"},
            "age": {"@id": "http://ex/age",
                    "@type": "http://www.w3.org/2001/XMLSchema#integer"},
        },
        "@id": "http://ex/a",
        "knows": "http://ex/b",
        "age": "30",
    })
    trs = {(s, p, o) for _, s, p, o in out}
    assert ("<http://ex/a>", "<http://ex/knows>", "<http://ex/b>") in trs
    assert (
        "<http://ex/a>", "<http://ex/age>",
        '"30"^^<http://www.w3.org/2001/XMLSchema#integer>',
    ) in trs


def test_jsonld_list_container_and_value_form():
    out = _jl({
        "@context": {
            "items": {"@id": "http://ex/items", "@container": "@list"},
            "more": "http://ex/more",
        },
        "@id": "http://ex/a",
        "items": ["x", "y"],
        "more": {"@list": ["z"]},
    })
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    preds = [p for _, _, p, _ in out]
    assert preds.count(f"<{rdf}first>") == 3
    assert sum(1 for _, _, p, o in out
               if p == f"<{rdf}rest>" and o == f"<{rdf}nil>") == 2
    firsts = sorted(o for _, _, p, o in out if p == f"<{rdf}first>")
    assert firsts == ['"x"', '"y"', '"z"']


def test_jsonld_reverse_keyword_and_term():
    out = _jl({
        "@context": {
            "ex": "http://ex/",
            "parentOf": {"@reverse": "http://ex/childOf"},
        },
        "@id": "http://ex/dad",
        "parentOf": {"@id": "http://ex/kid"},
        "@reverse": {"ex:knows": {"@id": "http://ex/friend"}},
    })
    trs = {(s, p, o) for _, s, p, o in out}
    assert ("<http://ex/kid>", "<http://ex/childOf>", "<http://ex/dad>") in trs
    assert ("<http://ex/friend>", "<http://ex/knows>", "<http://ex/dad>") in trs


def test_jsonld_context_array_null_reset_and_language():
    out = _jl({
        "@context": [
            {"@vocab": "http://v1/", "@language": "en"},
            {"name": "http://ex/name"},
        ],
        "@id": "http://ex/a",
        "name": "hello",
        "other": "plain",
    })
    trs = {(s, p, o) for _, s, p, o in out}
    assert ("<http://ex/a>", "<http://ex/name>", '"hello"@en') in trs
    assert ("<http://ex/a>", "<http://v1/other>", '"plain"@en') in trs


def test_jsonld_keyword_aliases():
    out = _jl({
        "@context": {"id": "@id", "type": "@type", "ex": "http://ex/"},
        "id": "http://ex/a",
        "type": "ex:Thing",
    })
    trs = {(s, p, o) for _, s, p, o in out}
    assert (
        "<http://ex/a>",
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
        "<http://ex/Thing>",
    ) in trs


def test_jsonld_remote_context_raises():
    import pytest as _pytest

    with _pytest.raises(RDFSyntaxError, match="remote @context"):
        _jl({"@context": "http://example.org/ctx.jsonld", "@id": "http://e/a"})


def test_jsonld_base_resolves_relative_ids():
    import json as _json

    out = parse_jsonld(
        _json.dumps({
            "@context": {"ex": "http://ex/"},
            "@id": "doc/1",
            "ex:p": {"@id": "doc/2"},
        }),
        "http://host/root/",
        alloc(),
    )
    trs = {(s, p, o) for _, s, p, o in out}
    assert ("<http://host/root/doc/1>", "<http://ex/p>",
            "<http://host/root/doc/2>") in trs


# --- round 3: JSON-LD @json / @direction / @index / @nest / loader ----------


def _jl_ctx(doc, ctxdocs):
    import json as _json

    return parse_jsonld(_json.dumps(doc), None, alloc(), context_documents=ctxdocs)


def test_jsonld_remote_context_injected():
    ctx = {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}
    out = _jl_ctx(
        {"@context": "http://example.org/ctx.jsonld",
         "@id": "http://e/a", "name": "Alice"},
        {"http://example.org/ctx.jsonld": ctx},
    )
    assert out == [(None, "<http://e/a>", "<http://xmlns.com/foaf/0.1/name>", '"Alice"')]


def test_jsonld_remote_context_missing_still_raises():
    import pytest as _pytest

    with _pytest.raises(RDFSyntaxError, match="remote @context"):
        _jl({"@context": "http://example.org/nope.jsonld", "@id": "http://e/a"})


def test_jsonld_json_literal():
    out = _jl({
        "@context": {"cfg": {"@id": "http://e/cfg", "@type": "@json"}},
        "@id": "http://e/a",
        "cfg": {"b": [2, 1], "a": True},
    })
    assert out == [(
        None, "<http://e/a>", "<http://e/cfg>",
        '"{\\"a\\":true,\\"b\\":[2,1]}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON>',
    )]


def test_jsonld_direction_value_and_default():
    out = _jl({
        "@context": {"@direction": "rtl", "@language": "ar",
                     "p": "http://e/p", "q": "http://e/q"},
        "@id": "http://e/a",
        "p": "x",
        "q": {"@value": "y", "@language": "he", "@direction": "ltr"},
    })
    assert (None, "<http://e/a>", "<http://e/p>", '"x"@ar--rtl') in out
    assert (None, "<http://e/a>", "<http://e/q>", '"y"@he--ltr') in out


def test_jsonld_direction_without_language_ignored():
    out = _jl({
        "@context": {"@direction": "rtl", "p": "http://e/p"},
        "@id": "http://e/a",
        "p": "x",
    })
    assert out == [(None, "<http://e/a>", "<http://e/p>", '"x"')]


def test_jsonld_index_container_flattens():
    out = _jl({
        "@context": {"p": {"@id": "http://e/p", "@container": "@index"}},
        "@id": "http://e/a",
        "p": {"k2": "b", "k1": ["a"]},
    })
    assert sorted(o for _, _, _, o in out) == ['"a"', '"b"']
    # node-object @index is an ignored annotation
    out2 = _jl({"@id": "http://e/a", "@index": "x",
                "http://e/p": [{"@value": "v", "@index": "y"}]})
    assert out2 == [(None, "<http://e/a>", "<http://e/p>", '"v"')]


def test_jsonld_nest_transparent():
    out = _jl({
        "@context": {"meta": "@nest", "p": "http://e/p", "q": "http://e/q"},
        "@id": "http://e/a",
        "meta": {"p": "x", "@nest": {"q": "y"}},
    })
    assert (None, "<http://e/a>", "<http://e/p>", '"x"') in out
    assert (None, "<http://e/a>", "<http://e/q>", '"y"') in out
    assert len(out) == 2


def test_jsonld_included():
    out = _jl({
        "@context": {"p": "http://e/p"},
        "@id": "http://e/a",
        "p": "x",
        "@included": [
            {"@id": "http://e/b", "p": "y"},
            {"@id": "http://e/c", "p": "z"},
        ],
    })
    assert (None, "<http://e/a>", "<http://e/p>", '"x"') in out
    assert (None, "<http://e/b>", "<http://e/p>", '"y"') in out
    assert (None, "<http://e/c>", "<http://e/p>", '"z"') in out
    assert len(out) == 3
