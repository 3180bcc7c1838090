"""Property-based hardening (hypothesis):

  * term-key encoding round-trips for arbitrary terms
  * the flat counting decomposition (_match_flat fast path) agrees with
    the exhaustive bitmask matcher on random flat shapes × random
    neighborhoods — the SURVEY.md C4 equivalence, fuzzed
"""

from hypothesis import given, settings, strategies as st

from shaclex_ray.terms import (
    cols_to_term,
    key_to_term,
    obj_cols,
    term_key,
)
from shaclex_ray.validate.local import Graph, ShExValidator

# \x1f is the term-key separator (documented as excluded from lexicals)
_text = st.text(
    alphabet=st.characters(blacklist_characters="\x1f", blacklist_categories=("Cs",)),
    max_size=20,
)
_iri_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=":/#."
    ),
    min_size=1,
    max_size=30,
)

_terms = st.one_of(
    st.tuples(st.just("iri"), _iri_text),
    st.tuples(st.just("bnode"), _iri_text),
    st.tuples(
        st.just("lit"),
        _text,
        st.one_of(
            st.just("http://www.w3.org/2001/XMLSchema#string"),
            st.just("http://www.w3.org/2001/XMLSchema#integer"),
            _iri_text,
        ),
        st.just(""),
    ),
)


@given(_terms)
def test_term_key_roundtrip(t):
    assert key_to_term(term_key(t)) == t


@given(_terms)
def test_obj_cols_roundtrip(t):
    assert cols_to_term(*obj_cols(t)) == t


# ---------------------------------------------------------------------------
# flat counting decomposition ≡ exhaustive bitmask matcher

_PREDS = ["http://e/p0", "http://e/p1", "http://e/p2"]
_OBJS = [
    ("iri", "http://e/o1"),
    ("iri", "http://e/o2"),
    ("bnode", "b1"),
    ("lit", "x", "http://www.w3.org/2001/XMLSchema#string", ""),
    ("lit", "5", "http://www.w3.org/2001/XMLSchema#integer", ""),
]

_value_exprs = st.one_of(
    st.none(),
    st.just({"type": "NodeConstraint", "nodeKind": "iri"}),
    st.just({"type": "NodeConstraint", "nodeKind": "literal"}),
    st.just(
        {
            "type": "NodeConstraint",
            "datatype": "http://www.w3.org/2001/XMLSchema#integer",
        }
    ),
)

_tc = st.builds(
    lambda pred, mn, mx, ve: {
        "type": "TripleConstraint",
        "predicate": pred,
        "min": mn,
        "max": mx if mx is not None else -1,
        **({"valueExpr": ve} if ve is not None else {}),
    },
    pred=st.sampled_from(_PREDS),
    mn=st.integers(0, 2),
    mx=st.one_of(st.none(), st.integers(1, 3)),
    ve=_value_exprs,
)

_arcs = st.lists(
    st.tuples(st.sampled_from(_PREDS), st.sampled_from(range(len(_OBJS)))),
    max_size=8,
)


@settings(max_examples=150, deadline=None)
@given(tcs=st.lists(_tc, min_size=1, max_size=3, unique_by=lambda t: t["predicate"]),
       arcs=_arcs, extra=st.sets(st.sampled_from(_PREDS), max_size=2))
def test_flat_counting_equals_bitmask_matcher(tcs, arcs, extra):
    focus = ("iri", "http://e/focus")
    triples = [(focus, p, _OBJS[oi]) for p, oi in arcs]
    shape = {
        "type": "Shape",
        "id": "http://e/S",
        "expression": (
            tcs[0]
            if len(tcs) == 1
            else {"type": "EachOf", "expressions": tcs}
        ),
        "extra": sorted(extra),
    }
    schema = {"start": None, "shapes": {"http://e/S": shape}, "te_refs": {}, "imports": []}

    fast = ShExValidator(schema, Graph(triples))
    got_fast = fast.validate_node_shape(focus, "http://e/S")

    slow = ShExValidator(schema, Graph(triples))
    slow._flat_tcs = lambda expr: None  # force the exhaustive matcher
    got_slow = slow.validate_node_shape(focus, "http://e/S")

    assert got_fast == got_slow, (tcs, arcs, extra)
