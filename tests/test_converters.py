"""Schema converters (SURVEY.md C1/C2/C3): cross-language equivalence on
the reference's example fixtures."""

from shaclex_ray.rdfio import parse_turtle
from shaclex_ray.shapes.convert import (
    count_usages,
    lint_inline_single_use,
    shacl_to_shex,
    shex_to_shacl,
)
from shaclex_ray.shapes.shacl import compile_shacl
from shaclex_ray.shapes.shexc import parse_shexc
from shaclex_ray.terms import term_key
from shaclex_ray.validate.local import Graph, ShExValidator
from shaclex_ray.validate.shacl_local import ShaclValidator

EX = "/root/reference/examples"


def test_shex_to_shacl_equivalent_verdicts():
    """ShEx datatype example -> SHACL: conformance verdicts agree on every
    focus node (the converter golden-test pattern, shex2shaclTest.scala)."""
    shex = parse_shexc(open(f"{EX}/shex/datatype.shex").read())
    shacl = shex_to_shacl(shex)
    data = parse_turtle(open(f"{EX}/shex/datatype.ttl").read())
    g = Graph(data)
    sv = ShExValidator(shex, g)
    cv = ShaclValidator(shacl, g)
    for node in ("good", "bad1", "bad2", "bad3", "bad4", "bad5"):
        term = ("iri", f"http://example.org/{node}")
        expected = sv.satisfies_label(term, "http://example.org/S")
        got = cv.conforms(term_key(term), "Ihttp://example.org/S")
        assert got == expected, node


def test_shacl_to_shex_equivalent_verdicts():
    """SHACL good1 example -> ShEx: per-focus verdicts agree."""
    ttl = open(f"{EX}/shacl/good1.ttl").read()
    triples = parse_turtle(ttl)
    shacl = compile_shacl(triples)
    shex, selectors = shacl_to_shex(shacl)
    assert any("x" in s for s in selectors)
    g = Graph(triples)
    cv = ShaclValidator(compile_shacl(triples), g)
    sv = ShExValidator(shex, g)
    for node in ("x", "y"):
        term = ("iri", f"http://example.org/{node}")
        expected = cv.conforms(term_key(term), "Ihttp://example.org/S")
        got = sv.satisfies_label(term, "http://example.org/S")
        assert got == expected, node


def test_linter_counts_and_inline():
    schema = parse_shexc(
        """
        prefix : <http://e/>
        :A { :p @_:b1 ; :q @:C }
        _:b1 { :r . }
        :C { :s . }
        """
    )
    counts = count_usages(schema)
    assert counts["_:b1"] == 1
    assert counts["http://e/C"] == 1
    linted = lint_inline_single_use(schema)
    assert "_:b1" not in linted["shapes"]  # inlined
    assert "http://e/C" in linted["shapes"]  # IRI labels stay
    # inlined schema still validates identically
    data = parse_turtle(
        "@prefix : <http://e/> . :x :p [:r 1] ; :q :c1 . :c1 :s 2 ."
    )
    g = Graph(data)
    assert ShExValidator(schema, g).satisfies_label(("iri", "http://e/x"), "http://e/A")
    assert ShExValidator(linted, g).satisfies_label(("iri", "http://e/x"), "http://e/A")


def test_facet_bound_exponent_and_garbage():
    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.shapes.convert import ConversionError, shacl_to_shex
    from shaclex_ray.shapes.shacl import compile_shacl

    ttl = """
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <http://ex.org/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:S a sh:NodeShape ;
      sh:property [ sh:path ex:p ; sh:minInclusive "1e2"^^xsd:double ] .
    """
    shex, _sel = shacl_to_shex(compile_shacl(parse_turtle(ttl)))
    tc = shex["shapes"]["http://ex.org/S"]["expression"]
    assert tc["valueExpr"]["mininclusive"] == 100.0
