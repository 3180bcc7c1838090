"""SLang IR + Clingo writer (S11/C5): ShEx→SLang compilation parity
with ShEx2SLang.scala, ASP grounding parity with SLang2Clingo.scala —
fragment selection, closure BFS over outgoing arcs, fact rendering,
and the reference's own NoPreds/Start limitations."""

import pyarrow as pa
import pytest

from shaclex_ray.shapes.clingo import (
    ClingoUnsupportedError,
    node_term,
    shape_term,
    validate_to_clingo,
)
from shaclex_ray.shapes.shexc import parse_shexc
from shaclex_ray.shapes.slang import (
    CARD_ONE_STAR,
    STRUE,
    SLangError,
    s_and,
    shex_to_slang,
    walk,
)
from shaclex_ray.terms import iri, literal

XSD = "http://www.w3.org/2001/XMLSchema#"


def _schema(text):
    return parse_shexc(text)


def test_shex_to_slang_triple_constraint():
    """TripleConstraint → And(QA(p,s,card), Not(QA(p,Not(s),1..*)))
    (ShEx2SLang.scala:104-115, the counting decomposition)."""
    sch = _schema(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:name xsd:string }"
    )
    sl = shex_to_slang(sch)
    dt = ("datatype", XSD + "string")
    qa = ("qa", ("pred", "http://e/name"), dt, (1, 1))
    neg = ("not", ("qa", ("pred", "http://e/name"), ("not", dt), CARD_ONE_STAR))
    # single-TC Shape: EachOf wrapper only when >1 expression
    got = sl["http://e/S"]
    assert got == s_and(qa, neg) or got[0] == "and"
    assert qa in walk([got]) and neg in walk([got])


def test_shex_to_slang_nodekind_and_star():
    sch = _schema("PREFIX ex: <http://e/>\nex:T IRI\nex:U { ex:knows @ex:T * }")
    sl = shex_to_slang(sch)
    assert sl["http://e/T"] == ("iri",)
    qas = [s for s in walk([sl["http://e/U"]]) if s[0] == "qa" and s[1][0] == "pred"]
    assert any(q[3] == (0, "star") and q[2] == ("ref", "http://e/T") for q in qas)


def test_shex_to_slang_or_is_derived():
    sch = _schema("PREFIX ex: <http://e/>\nex:V IRI OR BNODE")
    sl = shex_to_slang(sch)
    v = sl["http://e/V"]
    # or(s1, or(s2, false)) with or(a,b) = Not(And(Not a, Not b))
    assert v[0] == "not" and v[1][0] == "and"
    assert ("iri",) in walk([v]) and ("bnode",) in walk([v])


def test_shape_term_render():
    assert shape_term(STRUE) == "true"
    assert shape_term(("datatype", XSD + "string")) == (
        'datatype("<http://www.w3.org/2001/XMLSchema#string>")'
    )
    assert (
        shape_term(("qa", ("pred", "http://e/p"), ("iri",), (1, 2)))
        == 'qa("<http://e/p>",iri,1,intMax(2))'
    )
    assert (
        shape_term(("qa", ("pred", "http://e/p"), STRUE, (0, "star")))
        == 'qa("<http://e/p>",true,0,star)'
    )
    with pytest.raises(ClingoUnsupportedError):
        shape_term(("qa", ("nopreds", frozenset()), STRUE, CARD_ONE_STAR))


def test_node_term_literal_kinds():
    assert node_term(iri("http://e/x")) == '"<http://e/x>"'
    assert node_term(("bnode", "b0")) == '"_:b0"'
    assert node_term(literal("hi")) == '"hi"'
    assert node_term(literal("42", XSD + "integer")) == "42"
    assert node_term(literal("hola", lang="es")) == '"hola@es"'
    assert node_term(literal("1.5", XSD + "decimal")) == (
        '"1.5^^<http://www.w3.org/2001/XMLSchema#decimal>"'
    )


def _triples_ds():
    import ray.data as rd

    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.terms import triples_to_table

    ttl = (
        "@prefix ex: <http://e/> .\n"
        'ex:alice ex:name "Alice" ; ex:age 30 ; ex:knows ex:bob .\n'
        'ex:bob ex:name "Bob" .\n'
        # unreachable from ex:alice via outgoing arcs:
        'ex:zed ex:name "Zed" .\n'
    )
    return rd.from_arrow(triples_to_table(parse_turtle(ttl)))


def test_validate_to_clingo_program(ray_session):
    sch = _schema(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:name xsd:string }"
    )
    assocs = [{"kind": "node", "node": iri("http://e/alice"), "shape": "http://e/S"}]
    prog = validate_to_clingo(_triples_ds(), sch, assocs)
    # facts: closure arcs (alice's own + bob's, reached via ex:knows)
    assert 'arc("<http://e/alice>","<http://e/name>","Alice").' in prog
    assert 'arc("<http://e/bob>","<http://e/name>","Bob").' in prog
    # integer literal renders bare (IntegerLiteral, SLang2Clingo.scala:300)
    assert 'arc("<http://e/alice>","<http://e/age>",30).' in prog
    # zed is NOT reachable from the focus — not grounded
    assert "zed" not in prog
    # node-kind facts
    assert 'iri("<http://e/alice>").' in prog
    assert (
        'literal("Alice","<http://www.w3.org/2001/XMLSchema#string>").' in prog
    )
    # schema + shapeMap facts and result rules
    assert 'schema("<http://e/S>",' in prog
    assert 'shapeMap("<http://e/alice>","<http://e/S>").' in prog
    assert "#show result/2 ." in prog
    # fragment selection: this schema uses and/qa/not/datatype/true —
    # no iri/bNode/ref fragments
    assert "hasShape(X, iri):-iri(X)." not in prog
    assert "hasShape(X,and(S1,S2))" in prog
    assert "countPropShape" in prog


def test_validate_to_clingo_fragment_selection_ref(ray_session):
    sch = _schema("PREFIX ex: <http://e/>\nex:T IRI\nex:U { ex:knows @ex:T }")
    assocs = [{"kind": "node", "node": iri("http://e/alice"), "shape": "http://e/U"}]
    prog = validate_to_clingo(_triples_ds(), sch, assocs)
    assert "hasShape(X,ref(Lbl))" in prog
    assert "hasShape(X, iri):-iri(X)." in prog
    assert 'label("<http://e/T>").' in prog and 'label("<http://e/U>").' in prog


def test_clingo_reference_limitations(ray_session):
    # EachOf → NoPreds leftover check → ungroundable (getPred parity)
    sch = _schema(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:name xsd:string ; ex:age xsd:integer }"
    )
    assocs = [{"kind": "node", "node": iri("http://e/alice"), "shape": "http://e/S"}]
    with pytest.raises(ClingoUnsupportedError):
        validate_to_clingo(_triples_ds(), sch, assocs)
    # unknown label
    with pytest.raises(ClingoUnsupportedError):
        validate_to_clingo(
            _triples_ds(),
            _schema("PREFIX ex: <http://e/>\nex:T IRI"),
            [{"kind": "node", "node": iri("http://e/x"), "shape": "http://e/NOPE"}],
        )


def test_cli_show_clingo(tmp_path, capsys, ray_session):
    from shaclex_ray.__main__ import main

    data = tmp_path / "d.ttl"
    data.write_text('@prefix ex: <http://e/> .\nex:a ex:name "x" .\n')
    schema = tmp_path / "s.shex"
    schema.write_text(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:name xsd:string }\n"
    )
    out_file = tmp_path / "p.lp"
    main(
        [
            "validate", "--data", str(data), "--engine", "shex",
            "--schema", str(schema),
            "--shapemap", "<http://e/a>@<http://e/S>",
            "--show-clingo", "--clingo-file", str(out_file),
        ]
    )
    out = capsys.readouterr().out
    assert 'shapeMap("<http://e/a>","<http://e/S>").' in out
    assert out_file.read_text().startswith("hasShape")
    assert "OK <http://e/a>" in out  # validation still ran
