"""Schema converters (SURVEY.md C1/C2/C3): cross-language equivalence on
the reference's example fixtures."""

import pytest

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


# ---------------------------------------------------------------- C6


def test_shex_to_jsonschema_flat_shape():
    """C6: the reference declares ShEx->JSON Schema but leaves it `???`
    (ShEx2JsonSchema.scala:11-15); we define the natural mapping over the
    flat fragment and pin it with the real jsonschema validator."""
    import jsonschema

    from shaclex_ray.shapes.convert import shex_to_jsonschema
    from shaclex_ray.shapes.shexc import parse_shexc

    sch = parse_shexc(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "start = @ex:Person\n"
        "ex:Person CLOSED {\n"
        "  ex:name xsd:string MINLENGTH 1 ;\n"
        "  ex:age xsd:integer MININCLUSIVE 0 ;\n"
        "  ex:email xsd:string /@/ ? ;\n"
        "  ex:knows @ex:Person *\n"
        "}\n"
    )
    js = shex_to_jsonschema(sch)
    assert js["$ref"] == "#/$defs/Person"
    person = js["$defs"]["Person"]
    assert person["additionalProperties"] is False
    assert sorted(person["required"]) == ["age", "name"]
    assert person["properties"]["knows"] == {
        "type": "array",
        "items": {"$ref": "#/$defs/Person"},
    }

    ok = {"name": "Ada", "age": 36, "knows": [{"name": "Bob", "age": 1}]}
    jsonschema.validate(ok, js)
    for bad in (
        {"age": 3},                              # name required
        {"name": "", "age": 3},                  # minLength 1
        {"name": "x", "age": -1},                # minimum 0
        {"name": "x", "age": 3, "email": "no"},  # pattern
        {"name": "x", "age": 3, "other": 1},     # closed
        {"name": "x", "age": "3"},               # integer
    ):
        with pytest.raises(jsonschema.ValidationError):
            jsonschema.validate(bad, js)


def test_shex_to_jsonschema_logic_and_valuesets():
    import jsonschema

    from shaclex_ray.shapes.convert import shex_to_jsonschema
    from shaclex_ray.shapes.shexc import parse_shexc

    sch = parse_shexc(
        "PREFIX ex: <http://e/>\n"
        'ex:V IRI OR ["red" "green"]\n'
        "ex:N NOT IRI\n"
    )
    js = shex_to_jsonschema(sch)
    v = js["$defs"]["V"]
    assert "anyOf" in v
    jsonschema.validate("red", v if "$defs" not in v else v)
    jsonschema.validate("red", {**v, "$defs": js["$defs"]})
    with pytest.raises(jsonschema.ValidationError):
        jsonschema.validate(7, {**v, "$defs": js["$defs"]})
    assert js["$defs"]["N"] == {"not": {"type": "string", "format": "iri"}}


def test_shex_to_jsonschema_rejects_nonflat():
    from shaclex_ray.shapes.convert import ConversionError, shex_to_jsonschema
    from shaclex_ray.shapes.shexc import parse_shexc

    sch = parse_shexc(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:a xsd:string | ex:b xsd:string }\n"
    )
    with pytest.raises(ConversionError):
        shex_to_jsonschema(sch)
