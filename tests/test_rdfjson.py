"""RDF/JSON reader: parses into the identical triple set as its Turtle
twin (last DataFormats entry, reference DataFormats.scala:8-29)."""

import pytest

from shaclex_ray.rdfio import parse_rdfjson, parse_turtle
from shaclex_ray.rdfio.rdfjson import RdfJsonError

RJ_DOC = """
{
  "http://ex.org/alice": {
    "http://www.w3.org/1999/02/22-rdf-syntax-ns#type": [
      {"type": "uri", "value": "http://ex.org/Person"}
    ],
    "http://ex.org/nick": [
      {"type": "literal", "value": "Al"}
    ],
    "http://ex.org/knows": [
      {"type": "uri", "value": "http://ex.org/bob"},
      {"type": "bnode", "value": "_:b0"}
    ],
    "http://ex.org/name": [
      {"type": "literal", "value": "Alice", "lang": "en"}
    ],
    "http://ex.org/age": [
      {"type": "literal", "value": "30",
       "datatype": "http://www.w3.org/2001/XMLSchema#integer"}
    ]
  },
  "_:b0": {
    "http://ex.org/name": [
      {"type": "literal", "value": "Bob"}
    ]
  }
}
"""

TTL_TWIN = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:alice a ex:Person ;
  ex:nick "Al" ;
  ex:knows ex:bob , _:b0 ;
  ex:name "Alice"@en ;
  ex:age "30"^^xsd:integer .
_:b0 ex:name "Bob" .
"""


def test_rdfjson_matches_turtle_twin():
    got = set(parse_rdfjson(RJ_DOC))
    exp = set(parse_turtle(TTL_TWIN))
    assert got == exp


def test_rdfjson_base_resolution():
    ts = parse_rdfjson(
        '{"alice": {"http://ex.org/p": [{"type": "uri", "value": "bob"}]}}',
        base="http://base.org/",
    )
    assert ts == [
        (("iri", "http://base.org/alice"), "http://ex.org/p",
         ("iri", "http://base.org/bob"))
    ]


def test_rdfjson_bnode_prefix_scoping():
    a = parse_rdfjson(RJ_DOC, bnode_prefix="fileA#")
    b = parse_rdfjson(RJ_DOC, bnode_prefix="fileB#")
    bn_a = {t[0][1] for t in a if t[0][0] == "bnode"}
    bn_b = {t[0][1] for t in b if t[0][0] == "bnode"}
    assert bn_a and bn_a.isdisjoint(bn_b)


def test_rdfjson_rejects_malformed():
    with pytest.raises(RdfJsonError):
        parse_rdfjson('["not", "an", "object"]')
    with pytest.raises(RdfJsonError):
        parse_rdfjson('{"s": {"p": [{"type": "mystery", "value": "x"}]}}')
    with pytest.raises(RdfJsonError):
        parse_rdfjson('{"s": {"p": {"type": "uri", "value": "x"}}}')


def test_parse_rdf_text_sniffs_rdfjson():
    from shaclex_ray.sources.rdf_source import parse_rdf_text

    ts = parse_rdf_text(RJ_DOC)
    assert set(ts) == set(parse_turtle(TTL_TWIN))
    # JSON-LD still sniffs as JSON-LD
    ts2 = parse_rdf_text('{"@id": "http://e/s", "http://e/p": {"@id": "http://e/o"}}')
    assert (("iri", "http://e/s"), "http://e/p", ("iri", "http://e/o")) in set(ts2)


def test_read_rdfjson_files(ray_session, tmp_path):
    from shaclex_ray.sources.rdf_source import read_rdfjson_files

    p = tmp_path / "doc.rj"
    p.write_text(RJ_DOC)
    ds = read_rdfjson_files([str(p)])
    rows = ds.take_all()
    assert len(rows) == 7
    preds = {r["pred"] for r in rows}
    assert "http://ex.org/knows" in preds
