"""JSON-LD and TriG readers parse into the same triple sets as their
Turtle twins (S1 format parity with the reference's DataFormats)."""

from shaclex_ray.rdfio import parse_jsonld, parse_turtle


def _canon(triples):
    return sorted(
        (
            ("bnode", "B") if s[0] == "bnode" else s,
            p,
            ("bnode", "B") if o[0] == "bnode" else o,
        )
        for s, p, o in triples
    )


def test_jsonld_matches_turtle_twin():
    doc = """
    {
     "@context": {
       "ex": "http://ex.org/",
       "name": "ex:name",
       "knows": {"@id": "ex:knows", "@type": "@id"},
       "age": {"@id": "ex:age", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
       "tags": {"@id": "ex:tags", "@container": "@list"},
       "id": "@id", "type": "@type"
     },
     "@graph": [
      {"id": "ex:alice", "type": "ex:Person",
       "name": {"@value": "Alice", "@language": "en"},
       "knows": "ex:bob",
       "age": 30,
       "tags": ["a", "b"],
       "ex:flag": true},
      {"id": "ex:bob", "name": "Bob", "ex:nested": {"name": "Anon"}}
     ]
    }
    """
    ttl = """
    @prefix ex: <http://ex.org/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:alice a ex:Person ; ex:name "Alice"@en ; ex:knows ex:bob ;
      ex:age "30"^^xsd:integer ; ex:tags ("a" "b") ;
      ex:flag "true"^^xsd:boolean .
    ex:bob ex:name "Bob" ; ex:nested [ ex:name "Anon" ] .
    """
    assert _canon(parse_jsonld(doc)) == _canon(parse_turtle(ttl))


def test_jsonld_vocab_and_base():
    doc = """
    {"@context": {"@vocab": "http://v.org/", "@base": "http://b.org/"},
     "@id": "n1", "p": {"@id": "n2"}}
    """
    ts = parse_jsonld(doc)
    assert ("iri", "http://b.org/n1") in [t[0] for t in ts]
    assert any(
        p == "http://v.org/p" and o == ("iri", "http://b.org/n2") for _s, p, o in ts
    )


def test_trig_flattens_to_union_graph():
    trig = """
    @prefix ex: <http://ex.org/> .
    ex:s0 ex:p ex:o0 .
    GRAPH ex:g1 { ex:s1 ex:p ex:o1 . ex:s2 ex:p "lit" }
    ex:g2 { ex:s3 ex:p ex:o3 }
    { ex:s4 ex:p ex:o4 . }
    """
    ttl = """
    @prefix ex: <http://ex.org/> .
    ex:s0 ex:p ex:o0 . ex:s1 ex:p ex:o1 . ex:s2 ex:p "lit" .
    ex:s3 ex:p ex:o3 . ex:s4 ex:p ex:o4 .
    """
    assert sorted(parse_turtle(trig)) == sorted(parse_turtle(ttl))


def test_jsonld_id_does_not_use_term_definitions():
    """@id values resolve document-relatively even when they collide with
    a defined term (terms apply only in vocab position)."""
    doc = (
        '{"@context": {"label": "http://ex/label", "@base": "http://doc/"},'
        ' "@id": "label", "label": "x"}'
    )
    from shaclex_ray.rdfio import parse_jsonld

    ts = parse_jsonld(doc)
    assert ts[0][0] == ("iri", "http://doc/label")
    assert ts[0][1] == "http://ex/label"


def test_format_sniffing_keeps_turtle_bracket_starts():
    """parse_rdf_text: '[' / '{' that are not JSON stay Turtle/TriG."""
    from shaclex_ray.sources.rdf_source import parse_rdf_text

    ts = parse_rdf_text("[ <http://e/p> <http://e/o> ] .")
    assert len(ts) == 1 and ts[0][1] == "http://e/p"
    ts2 = parse_rdf_text("{ <http://e/s> <http://e/p> <http://e/o> . }")
    assert len(ts2) == 1
    ts3 = parse_rdf_text('{"@id": "http://e/s", "http://e/p": {"@id": "http://e/o"}}')
    assert ts3 == [(("iri", "http://e/s"), "http://e/p", ("iri", "http://e/o"))]
