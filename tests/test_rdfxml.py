"""RDF/XML reader: parses into the identical triple set as its Turtle twin
(S1 format-gap closure; DataFormats parity)."""

from shaclex_ray.rdfio import parse_rdfxml, parse_turtle

XML_DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.org/" xml:base="http://base.org/">
 <ex:Person rdf:about="alice" ex:nick="Al">
   <ex:knows rdf:resource="http://ex.org/bob"/>
   <ex:name xml:lang="en">Alice</ex:name>
   <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
 </ex:Person>
 <rdf:Description rdf:about="http://ex.org/bob">
   <ex:name>Bob</ex:name>
 </rdf:Description>
</rdf:RDF>
"""

TTL_TWIN = """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
<http://base.org/alice> a ex:Person ;
  ex:nick "Al" ;
  ex:knows ex:bob ;
  ex:name "Alice"@en ;
  ex:age "30"^^xsd:integer .
ex:bob ex:name "Bob" .
"""


def test_rdfxml_matches_turtle_twin():
    got = set(parse_rdfxml(XML_DOC, base="http://base.org/"))
    exp = set(parse_turtle(TTL_TWIN))
    assert got == exp


def test_rdfxml_collection_and_nested():
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.org/">
 <rdf:Description rdf:about="http://ex.org/s">
   <ex:items rdf:parseType="Collection">
     <rdf:Description rdf:about="http://ex.org/i1"/>
     <rdf:Description rdf:about="http://ex.org/i2"/>
   </ex:items>
   <ex:addr rdf:parseType="Resource">
     <ex:city>Oz</ex:city>
   </ex:addr>
   <ex:seq><rdf:Seq><rdf:li>a</rdf:li><rdf:li>b</rdf:li></rdf:Seq></ex:seq>
 </rdf:Description>
</rdf:RDF>
"""
    ttl = """
@prefix ex: <http://ex.org/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
<http://ex.org/s> ex:items (<http://ex.org/i1> <http://ex.org/i2>) ;
  ex:addr [ ex:city "Oz" ] ;
  ex:seq [ a rdf:Seq ; rdf:_1 "a" ; rdf:_2 "b" ] .
"""
    got = parse_rdfxml(xml)
    exp = parse_turtle(ttl)

    def canon(triples):
        """Compare modulo bnode ids: replace each bnode with a stable
        signature of its non-bnode neighborhood."""
        out = set()
        for s, p, o in triples:
            sk = "B" if s[0] == "bnode" else s
            ok = "B" if o[0] == "bnode" else o
            out.add((sk, p, ok))
        return out

    assert canon(got) == canon(exp)
    assert len(got) == len(exp)


def test_rdfxml_via_engine_validation(ray_session):
    """An RDF/XML data file validates through the engine facade just like
    its Turtle twin (the first format a real user would hit)."""
    import ray.data as rd

    from shaclex_ray.engine import validate_shacl
    from shaclex_ray.terms import triples_to_table

    shapes_ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://ex.org/> .
    ex:PersonShape a sh:NodeShape ;
      sh:targetClass ex:Person ;
      sh:property [ sh:path ex:name ; sh:minCount 1 ] .
    """
    ds = rd.from_arrow(triples_to_table(parse_rdfxml(XML_DOC, base="http://base.org/")))
    typing, report, summary = validate_shacl(ds, shapes_ttl, nbuckets=2)
    assert summary["conforms"] is True
    assert summary["focus_pairs"] == 1


def test_rdfli_counter_restarts_per_node_element():
    """Two node elements about the same subject each restart rdf:li at _1
    (RDF/XML liCounter is element-scoped)."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
 <rdf:Description rdf:about="http://e/bag"><rdf:li>a</rdf:li><rdf:li>b</rdf:li></rdf:Description>
 <rdf:Description rdf:about="http://e/bag"><rdf:li>c</rdf:li></rdf:Description>
</rdf:RDF>"""
    preds = sorted(p for _s, p, _o in parse_rdfxml(xml))
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert preds == [RDF + "_1", RDF + "_1", RDF + "_2"]
