from shaclex_ray.rdfio import parse_turtle
from shaclex_ray.terms import RDF_TYPE, XSD_INTEGER


def test_basic_turtle():
    ttl = """
    @prefix ex: <http://ex.org/> .
    ex:a a ex:T ; ex:p "lit"@en , 42 ; ex:q [ ex:r ex:b ] .
    """
    trips = parse_turtle(ttl)
    assert (("iri", "http://ex.org/a"), RDF_TYPE, ("iri", "http://ex.org/T")) in trips
    assert (
        ("iri", "http://ex.org/a"),
        "http://ex.org/p",
        ("lit", "42", XSD_INTEGER, ""),
    ) in trips
    langs = [o for s, p, o in trips if p == "http://ex.org/p" and o[0] == "lit" and o[3]]
    assert langs == [("lit", "lit", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en")]


def test_collections_and_base():
    ttl = """
    @base <http://ex.org/doc> .
    @prefix ex: <http://ex.org/> .
    <#me> ex:list ( 1 2 ) .
    """
    trips = parse_turtle(ttl)
    subjects = {s for s, p, o in trips}
    assert ("iri", "http://ex.org/doc#me") in subjects
    firsts = [o for s, p, o in trips if p.endswith("#first")]
    assert [f[1] for f in firsts] == ["1", "2"]


def test_string_escapes_and_long_strings():
    ttl = r'''<http://s> <http://p> """multi
line\t tab""" .'''
    trips = parse_turtle(ttl)
    assert trips[0][2][1] == "multi\nline\t tab"
