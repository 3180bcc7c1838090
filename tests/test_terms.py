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


def test_key_roundtrip_sep_in_lexical_form():
    """Literal lexical forms may contain the \\x1f key separator (shexTest
    STRING_LITERAL1_with_all_controls) — key_to_term must rsplit."""
    from shaclex_ray.terms import key_to_term, literal, term_key

    for t in (
        literal("a\x1fb"),
        literal("\x1f\x1f", "http://d"),
        literal("ctrl\x00\x1f\x1e tail", lang="en"),
        literal(""),
    ):
        assert key_to_term(term_key(t)) == t
