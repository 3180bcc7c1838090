"""Schema inference (SURVEY.md C7) + ShExC renderer (S10) round-trip."""

import pytest


def test_infer_and_render_roundtrip(ray_session):
    import ray.data as rd

    from shaclex_ray.pipelines.infer import infer_schema
    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.shapes.render import render_shexc
    from shaclex_ray.shapes.shexc import parse_shexc
    from shaclex_ray.terms import triples_to_table

    data = """
    @prefix ex: <http://ex.org/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:a a ex:T ; ex:name "Alice" ; ex:age 30 ; ex:knows ex:b .
    ex:b a ex:T ; ex:name "Bob" ; ex:age 25 ; ex:knows ex:a , ex:c .
    ex:c ex:other "x" .
    """
    ds = rd.from_arrow(triples_to_table(parse_turtle(data)))
    schema, stats = infer_schema(ds, focus_class="http://ex.org/T")
    by_pred = {r["pred"]: r for r in stats.to_pylist()}
    assert by_pred["http://ex.org/name"]["constraint"] == "lit:http://www.w3.org/2001/XMLSchema#string"
    assert by_pred["http://ex.org/age"]["constraint"] == "lit:http://www.w3.org/2001/XMLSchema#integer"
    assert by_pred["http://ex.org/knows"]["constraint"] == "iri"
    assert by_pred["http://ex.org/knows"]["max_per_subject"] == 2
    assert by_pred["http://ex.org/name"]["n_subjects"] == 2

    # render -> reparse -> validate: both focus nodes conform to the
    # inferred shape
    text = render_shexc(schema)
    reparsed = parse_shexc(text)
    from shaclex_ray.validate.local import Graph, ShExValidator

    g = Graph(parse_turtle(data))
    v = ShExValidator(reparsed, g)
    label = next(iter(reparsed["shapes"]))
    assert v.satisfies_label(("iri", "http://ex.org/a"), label)
    assert v.satisfies_label(("iri", "http://ex.org/b"), label)


def test_render_existing_schema_roundtrip():
    from shaclex_ray.shapes.render import render_shexc
    from shaclex_ray.shapes.shexc import parse_shexc

    src = open("/root/reference/examples/shex/datatype.shex").read()
    ir = parse_shexc(src)
    text = render_shexc(ir)
    ir2 = parse_shexc(text)
    assert sorted(ir2["shapes"]) == sorted(ir["shapes"])


def test_inferred_shape_rdfs_label_annotation(ray_session):
    """J6: inferred properties carry rdfs:label annotations from the data
    graph, rendered as ShExC '// rdfs:label "..."' (reference
    InferredShape.scala:104-125)."""
    import ray.data as rd

    from shaclex_ray.pipelines.infer import infer_schema
    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.shapes.render import render_shexc
    from shaclex_ray.shapes.shexc import parse_shexc
    from shaclex_ray.terms import triples_to_table

    ttl = """
    @prefix ex: <http://ex.org/> .
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    ex:n1 a ex:T ; ex:p "v" .
    ex:p rdfs:label "my property" .
    """
    ds = rd.from_arrow(triples_to_table(parse_turtle(ttl)))
    schema, _stats = infer_schema(ds, focus_class="http://ex.org/T")
    tcs = schema["shapes"]["http://example.org/InferredShape"]["expression"][
        "expressions"
    ]
    labeled = [t for t in tcs if t["predicate"] == "http://ex.org/p"]
    assert labeled and labeled[0]["annotations"][0]["object"]["value"] == "my property"
    text = render_shexc(schema)
    assert '// <http://www.w3.org/2000/01/rdf-schema#label> "my property"' in text
    # annotations are consumed (not kept) on re-parse — text still parses
    parse_shexc(text)


def test_follow_on_recursion(ray_session):
    """followOn rules (reference FollowOn.scala / SchemaInfer.scala:176-182):
    a firing rule turns the TC's valueExpr into a shape ref and infers the
    referenced shape from the predicate's objects; depth-bounded; the
    rendered schema round-trips and validates."""
    import ray.data as rd

    from shaclex_ray.pipelines.infer import (
        follow_on_reference,
        follow_on_stem,
        infer_schema,
    )
    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.shapes.render import render_shexc
    from shaclex_ray.shapes.shexc import parse_shexc
    from shaclex_ray.terms import triples_to_table

    ttl = """
    @prefix ex: <http://ex.org/> .
    @prefix wdp: <http://www.wikidata.org/prop/> .
    ex:a a ex:T ; wdp:P31 ex:stmt1 ; ex:name "Alice" .
    ex:b a ex:T ; wdp:P31 ex:stmt2 .
    ex:stmt1 ex:value ex:v1 ; wdp:P9 ex:nested1 .
    ex:stmt2 ex:value ex:v2 .
    """
    ds = rd.from_arrow(triples_to_table(parse_turtle(ttl)))
    schema, _ = infer_schema(
        ds,
        focus_class="http://ex.org/T",
        shape_label="http://ex.org/S",
        follow_on=[follow_on_reference],
        max_follow_on=1,
    )
    shapes = schema["shapes"]
    assert set(shapes) == {"http://ex.org/S", "http://ex.org/P31Prop"}

    def tcs(label):
        e = shapes[label]["expression"]
        return e["expressions"] if e.get("type") == "EachOf" else [e]

    p31 = next(
        t for t in tcs("http://ex.org/S")
        if t["predicate"] == "http://www.wikidata.org/prop/P31"
    )
    assert p31["valueExpr"] == "http://ex.org/P31Prop"  # shape ref
    # depth bound: the nested shape's own wd-prop TC did NOT follow again
    p9 = next(
        t for t in tcs("http://ex.org/P31Prop")
        if t["predicate"] == "http://www.wikidata.org/prop/P9"
    )
    assert not isinstance(p9.get("valueExpr"), str)

    # render -> reparse -> validate the focus against the 2-shape schema
    reparsed = parse_shexc(render_shexc(schema))
    from shaclex_ray.validate.local import Graph, ShExValidator

    v = ShExValidator(reparsed, Graph(parse_turtle(ttl)))
    assert v.satisfies_label(("iri", "http://ex.org/a"), "http://ex.org/S")

    # conflicting rules on one predicate -> error (SchemaInfer.scala:182)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="More than one followOn"):
        infer_schema(
            ds,
            focus_class="http://ex.org/T",
            shape_label="http://ex.org/S",
            follow_on=[
                follow_on_reference,
                follow_on_stem("http://www.wikidata.org/prop/"),
            ],
        )


def test_constraint_rule_matches_collapse2_fold():
    """The aggregate-derived constraint rule (kmin/kmax/fmin/fmax) must
    equal the reference pairwise lattice fold (_collapse2) for every
    multiset of input kinds, in every fold order."""
    import itertools

    from shaclex_ray.pipelines.infer import TOP, _collapse2

    kinds = ["iri", "bnode", "lang:en", "lang:fr", "lit:http://www.w3.org/2001/XMLSchema#string", "lit:http://www.w3.org/2001/XMLSchema#integer"]

    def fam(k):
        return 1 if k == "iri" else 2 if k == "bnode" else 3 if k.startswith("lang:") else 4

    def agg_rule(ks):
        kmin, kmax = min(ks), max(ks)
        fmin, fmax = min(map(fam, ks)), max(map(fam, ks))
        if kmin == kmax:
            return kmin
        if fmin == 3 and fmax == 3:
            return "langstring"
        if fmin >= 3:
            return "literal"
        return TOP

    for n in (1, 2, 3):
        for combo in itertools.combinations_with_replacement(kinds, n):
            distinct = sorted(set(combo))
            for perm in itertools.permutations(distinct):
                folded = None
                for k in perm:
                    folded = _collapse2(folded, k)
                assert agg_rule(combo) == folded, (combo, perm)
