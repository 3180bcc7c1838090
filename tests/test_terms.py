from shaclex_ray.terms import (
    bnode,
    iri,
    key_to_term,
    literal,
    obj_cols,
    obj_key,
    subj_str,
    subj_to_key,
    term_key,
)


def test_term_key_roundtrip():
    for t in [
        iri("http://a.example/x"),
        bnode("doc-1/3"),
        literal("hello"),
        literal("1", "http://www.w3.org/2001/XMLSchema#integer"),
        literal("bonjour", lang="fr"),
    ]:
        assert key_to_term(term_key(t)) == t


def test_subj_encoding():
    assert subj_str(iri("http://x")) == "http://x"
    assert subj_str(bnode("b1")) == "_:b1"
    assert subj_to_key("_:b1") == "Bb1"
    assert subj_to_key("http://x") == "Ihttp://x"


def test_obj_cols_roundtrip():
    t = literal("1.5", "http://www.w3.org/2001/XMLSchema#decimal")
    k, lx, dt, lg = obj_cols(t)
    assert obj_key(k, lx, dt, lg) == term_key(t)
