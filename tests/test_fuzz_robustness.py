"""Parser robustness fuzz: garbage can NEVER escape as anything but
``RDFSyntaxError``.

``parse_document`` (parsers/registry.py) converts ``RDFSyntaxError`` into
a lineage error row; any OTHER exception type escapes the mapInPandas UDF
and kills the whole Spark stage — at corpus scale, one corrupt document
must never take down a job.  The reference's parsers sit behind the same
contract (riot/system/ErrorHandlerFactory: all reader errors funnel
through RiotException).

Three real crashes found by this fuzz (binary readers leaking
IndexError / AttributeError / TypeError on corrupt bytes) and one hang
(a crafted thrift collection header with a zero-consume element type and
a 2^40 size looping forever) are pinned individually below; the sweeps
keep the whole surface honest.
"""

import random

import pytest

from jena_spark.parsers.binrdf import (
    parse_rdf_protobuf,
    parse_rdf_thrift,
    read_patch_rows_thrift,
    read_result_tuples_protobuf,
    read_result_tuples_thrift,
    write_patch_rows_thrift,
    write_rdf_protobuf,
    write_rdf_thrift,
    write_result_tuples_protobuf,
    write_result_tuples_thrift,
)
from jena_spark.parsers.registry import parse_document
from jena_spark.terms import RDFSyntaxError

LANGS = [
    "turtle", "ntriples", "nquads", "trig", "rdfxml",
    "jsonld", "rdfjson", "trix", "rdfthrift", "rdfprotobuf",
]

# fragments chosen to reach deep parser states: directives, quoting,
# RDF-star, XML/JSON structure, binary-looking bytes, escapes
FRAGS = [
    '@prefix ', 'p: <http://e/>', '.', '<<(', ')>>', '"""', '"', '@en--ltr',
    '^^', '<a xmlns="x">', '</a>', '{"@id":"a"', '}', '[', ']', '(', ')',
    'GRAPH', '_:b', '\\u00', '%2', '{"a":{"b":{', 'true', '1e', '<rdf:RDF',
    'BASE', 'PREFIX : <>', '\x00', '\x82', '\xff', '0.', ';', ',', 'a ',
    '<s> <p> ', '\n', '\t', '<?xml version="1.0"?>', '<!--', '-->',
    '<![CDATA[', 'rdf:parseType="Collection"', 'rdf:li', '&amp;', '&x;',
    '\x19', '\x1c', '\xf0', '\x0b',
]


def test_garbage_never_escapes_parse_document():
    rng = random.Random(7)
    for _ in range(6000):
        lang = rng.choice(LANGS)
        r = rng.random()
        if r < 0.35:
            content = "".join(
                chr(rng.randint(0, 255)) for _ in range(rng.randint(0, 80))
            )
        elif r < 0.45:
            content = "".join(
                chr(rng.randint(0, 0x2FFF)) for _ in range(rng.randint(0, 40))
            )
        else:
            content = "".join(
                rng.choice(FRAGS) for _ in range(rng.randint(0, 12))
            )
        # must return (quads, err) — never raise
        quads, err = parse_document("r", "f.bin", "c", lang, content)
        assert err is None or isinstance(err, str)


def _mutation_sweep(parse, blob, rng, n_mut=1200):
    # every truncation point, then random flip/delete/insert mutations
    for i in range(len(blob) + 1):
        try:
            parse(blob[:i])
        except RDFSyntaxError:
            pass
    for _ in range(n_mut):
        b = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            op = rng.random()
            if op < 0.5 and b:
                b[rng.randrange(len(b))] = rng.randrange(256)
            elif op < 0.8 and b:
                del b[rng.randrange(len(b))]
            else:
                b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
        try:
            parse(bytes(b))
        except RDFSyntaxError:
            pass


QUADS = [
    (None, "<http://ex/s>", "<http://ex/p>", '"plain"'),
    ("<http://ex/g>", "_:b0", "<http://ex/p>", '"chat"@fr--ltr'),
    (None, "<http://ex/s>", "<http://ex/p>",
     '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    (None, '<<(<http://ex/a> <http://ex/p> "o")>>',
     "<http://ex/says>", "<http://ex/b>"),
]


@pytest.mark.parametrize(
    "parse,blob",
    [
        (parse_rdf_thrift,
         write_rdf_thrift(QUADS, encode_values=True, prefixes={"ex": "http://ex/"})),
        (parse_rdf_protobuf,
         write_rdf_protobuf(QUADS, encode_values=True, prefixes={"ex": "http://ex/"})),
        (read_patch_rows_thrift,
         write_patch_rows_thrift([
             ("TX",), ("A", None, "<s>", "<p>", '"o"@en'),
             ("PA", None, "ex", "http://ex/"), ("TC",),
         ])),
        (read_result_tuples_thrift,
         write_result_tuples_thrift(["x", "y"], [["<a>", None], ['"v"', "_:b"]])),
        (read_result_tuples_protobuf,
         write_result_tuples_protobuf(["x", "y"], [["<a>", None], ['"v"', "_:b"]])),
    ],
    ids=["thrift", "protobuf", "patch", "res_thrift", "res_proto"],
)
def test_binary_mutations_never_escape(parse, blob):
    _mutation_sweep(parse, blob, random.Random(99))


# ---------------------------------------------------------------------------
# Pins for the specific crashes/hang the sweep originally found
# ---------------------------------------------------------------------------

def test_thrift_type_confused_field_is_syntax_error():
    # triple row whose subject field is a BOOL instead of a struct
    # (was AttributeError: 'bool' object has no attribute 'get')
    with pytest.raises(RDFSyntaxError):
        parse_rdf_thrift(b"rdf:li")
    with pytest.raises(RDFSyntaxError):
        parse_rdf_thrift('"""\x00PREFIX : <>,<![CDATA[.-->BASE')


def test_protobuf_bad_span_is_syntax_error():
    # was TypeError: _p_read_message() takes 3 positional arguments...
    blob = bytes([0x05, 0x15, 0x72, 0x03, 0x8B]) + bytes(range(40))
    with pytest.raises(RDFSyntaxError):
        parse_rdf_protobuf(blob)


def test_thrift_huge_collection_size_raises_fast():
    # field 1 = LIST of BOOL_TRUE (consumes 0 bytes/element) with a 2^40
    # size — before the cap this looped ~forever instead of raising
    huge = bytearray([0x19, 0xF1])
    u = 1 << 40
    while True:
        b = u & 0x7F
        u >>= 7
        huge.append(b | 0x80 if u else b)
        if not u:
            break
    with pytest.raises(RDFSyntaxError):
        parse_rdf_thrift(bytes(huge))


# ---------------------------------------------------------------------------
# Query-side parsers: SPARQL text and CDT literal lexical forms
# ---------------------------------------------------------------------------

def test_garbage_sparql_never_escapes():
    """Malformed query text must raise RDFSyntaxError (the API contract
    verified by the driver harness), never a stray exception type."""
    from jena_spark.ops.sparql import _parse_query

    frags = [
        'SELECT ', '?x', ' WHERE ', '{', '}', '?s ?p ?o', '.', 'FILTER',
        '(', ')', 'OPTIONAL', 'UNION', 'GRAPH', '?g', 'PREFIX : <>',
        'BASE <http://e/>', 'ORDER BY', 'GROUP BY', 'HAVING', 'LIMIT',
        '10', 'OFFSET', 'ASK', 'CONSTRUCT', 'DESCRIBE', 'BIND', 'AS',
        'VALUES', 'UNDEF', '"lit"', "'''q'''", '@en', '^^xsd:int', '<<',
        '>>', '{|', '|}', '~', 'EXISTS', 'NOT', 'MINUS', 'SERVICE',
        'SILENT', 'COUNT(*)', 'DISTINCT', '*', '/', '|', '^', '+', '!',
        'a', '0.5e', ';', ',', '\\u0041', '#c\n', 'INSERT DATA',
        'DELETE', 'WITH', 'USING', 'LOAD', '\x00', 'π',
    ]
    rng = random.Random(5)
    for _ in range(8000):
        q = " ".join(rng.choice(frags) for _ in range(rng.randint(0, 14)))
        if rng.random() < 0.15:
            q = "".join(chr(rng.randint(0, 0x2FF)) for _ in range(rng.randint(0, 60)))
        try:
            _parse_query(q, "http://base/")
        except RDFSyntaxError:
            pass


def test_garbage_cdt_literals_raise_only_cdterror():
    """cdt:List/Map lexical forms come from DATA (documents), parsed
    inside pandas UDFs at query time; the eval sites turn CdtError into
    SPARQL expression errors (nulls) — any other type would kill the
    stage."""
    from jena_spark.cdt import CdtError, parse_list_lexical, parse_map_lexical

    frags = [
        '[', ']', '{', '}', ',', ':', '"a"', "'b'", '1', '0.5', 'true',
        'null', '<http://e/i>', '_:b', '"x"@en', '"1"^^xsd:int', '\\"',
        '\\\\', ' ', '<<(', ')>>', 'π', '\x00', '"unterminated', '^^<',
        '@', '--', '[[[[', '{}{}',
    ]
    rng = random.Random(11)
    for _ in range(8000):
        s = "".join(rng.choice(frags) for _ in range(rng.randint(0, 14)))
        if rng.random() < 0.25:
            s = "".join(chr(rng.randint(0, 0x2FF)) for _ in range(rng.randint(0, 60)))
        for fn in (parse_list_lexical, parse_map_lexical):
            try:
                fn(s)
            except (CdtError, RecursionError):
                pass


def test_unterminated_update_quad_block_raises():
    """'DELETE WHERE {' used to spin forever in _quad_block (the EOF
    token satisfies neither the '}' loop exit nor any consumer) —
    a malformed update could hang the driver."""
    from jena_spark.ops.update import UpdateParser

    for q in ["DELETE WHERE {", "INSERT DATA {", "INSERT DATA { GRAPH <g> {"]:
        with pytest.raises(RDFSyntaxError):
            UpdateParser(q, "http://base/").parse_update()


def test_garbage_update_and_patch_never_escape():
    from jena_spark.ops.update import UpdateParser
    from jena_spark.rdfpatch import PatchException, parse_patch

    ufrags = [
        'INSERT DATA', 'DELETE DATA', 'DELETE WHERE', 'INSERT', 'DELETE',
        'WHERE', '{', '}', '<s> <p> "o" .', 'GRAPH <g>', ';', 'WITH <g>',
        'USING', 'NAMED', 'CLEAR', 'DROP', 'CREATE', 'COPY', 'MOVE', 'ADD',
        'LOAD', 'SILENT', 'ALL', 'DEFAULT', 'GRAPH', 'TO', 'INTO',
        'PREFIX : <>', 'BASE <http://e/>', '?v', '"lit"@en', '_:b', '.',
        'FILTER(1)', '\x00', 'π', '<<(', ')>>',
    ]
    pfrags = [
        'TX .', 'TC .', 'TA .', 'H', 'A', 'D', 'PA', 'PD', '.', '<s>',
        '<p>', '"o"', '_:b', '"x"@en--ltr', 'id', '<uuid:x>', 'prev',
        '\n', '\x00', 'π', '"""', '<<(',
    ]
    rng = random.Random(3)
    for _ in range(6000):
        q = " ".join(rng.choice(ufrags) for _ in range(rng.randint(0, 12)))
        if rng.random() < 0.15:
            q = "".join(chr(rng.randint(0, 0x2FF)) for _ in range(rng.randint(0, 60)))
        try:
            UpdateParser(q, "http://base/").parse_update()
        except RDFSyntaxError:
            pass
    for _ in range(6000):
        t = " ".join(rng.choice(pfrags) for _ in range(rng.randint(0, 12)))
        if rng.random() < 0.15:
            t = "".join(chr(rng.randint(0, 0x2FF)) for _ in range(rng.randint(0, 60)))
        try:
            parse_patch(t)
        except (PatchException, RDFSyntaxError):
            pass


def test_garbage_iri_and_term_codec_never_escape():
    from jena_spark.iri import resolve
    from jena_spark.terms import decode_term, encode_term

    rng = random.Random(13)
    ifr = ['http://', 'a/b', '../', './', '//h', '?q', '#f', ':', '%2',
           '%zz', 'π', '\x00', 'file:', 'urn:x', '[::1]', '@', ' ', '\\',
           'mailto:a', '..', 'a:b:c']
    tfr = ['<http://e/a>', '_:b', '"x"', '"x"@en', '"x"@en--ltr',
           '^^<http://e/d>', '<<(', ')>>', '"', '\\', '\\u00', '@', '--',
           'π', '\x00', '<', '>', ' ', '"""', "'", '<a b>']
    for _ in range(6000):
        base = "".join(rng.choice(ifr) for _ in range(rng.randint(0, 6))) or "http://e/"
        ref = "".join(rng.choice(ifr) for _ in range(rng.randint(0, 6)))
        try:
            resolve(base, ref)
        except RDFSyntaxError:
            pass
    for _ in range(6000):
        s = "".join(rng.choice(tfr) for _ in range(rng.randint(0, 8)))
        try:
            encode_term(decode_term(s))
        except RDFSyntaxError:
            pass
