"""SLang — the reference's experimental simplified shape language and
its ShEx compiler (SURVEY.md §2 C4's explicit IR form).

Semantics pinned by the reference:
  * the SLang term algebra (modules/slang/src/main/scala/es/weso/slang/
    SLang.scala:6-54): STrue | Ref | And | Datatype | IRIKind | BNodeKind
    | Not | QualifiedArc(propPath, s, card); `or` is the derived
    Not(And(Not, Not)) (SLang.scala:47), `false` is Not(STrue).
  * ShEx→SLang compilation (ShEx2SLang.scala:43-121): ShapeAnd folds
    right onto STrue; ShapeOr folds right onto false with the derived
    or; a NodeConstraint keeps nodeKind/datatype (facets/values are
    unimplemented in the reference too, ShEx2SLang.scala:69 TODO);
    TripleConstraint decomposes into the two counting ops
    And(QA(p,s,card), Not(QA(p,Not(s),1..*))); EachOf adds the
    closed-world leftover check Not(QA(NoPreds(preds),STrue,1..*)).

Terms are plain nested tuples (hashable — the grounding walks need set
membership):

    ("true",)
    ("ref", label)
    ("and", s1, s2)
    ("datatype", iri)
    ("iri",)
    ("bnode",)
    ("not", s)
    ("qa", pp, s, (min, max))     # max: int | "star"

with property paths ``("pred", iri)`` | ``("nopreds", frozenset)``.
"""

from __future__ import annotations

STRUE = ("true",)
SFALSE = ("not", STRUE)
CARD_ONE_STAR = (1, "star")


class SLangError(Exception):
    """Unimplemented ShEx construct (the reference raises the same way —
    shex2slang's `err(...)` cases are conversion failures, not skips)."""


def s_and(s1: tuple, s2: tuple) -> tuple:
    return ("and", s1, s2)


def s_or(s1: tuple, s2: tuple) -> tuple:
    # SLang.scala:47 — or is derived, not primitive
    return ("not", ("and", ("not", s1), ("not", s2)))


def children(s: tuple) -> list[tuple]:
    """SLang.scala: each constructor's immediate sub-shapes."""
    tag = s[0]
    if tag == "and":
        return [s[1], s[2]]
    if tag == "not":
        return [s[1]]
    if tag == "qa":
        return [s[2]]
    return []


def walk(shapes) -> list[tuple]:
    """All distinct sub-shapes reachable from ``shapes`` (the traversal
    behind groundShapeAux / selectFragmentsAux, SLang2Clingo.scala)."""
    seen: list[tuple] = []
    seen_set = set()
    pending = list(shapes)
    while pending:
        s = pending.pop(0)
        if s in seen_set:
            continue
        seen.append(s)
        seen_set.add(s)
        pending = children(s) + pending
    return seen


# ----------------------------------------------------------- ShEx → SLang


def shex_to_slang(schema: dict) -> dict[str, tuple]:
    """Compile a parsed ShEx schema (our ShExJ-style dict) to
    {label: SLang} — ShEx2SLang.scala:19-41 (shex2SLang over shapesMap)."""
    return {
        lbl: _cnv_shape_expr(se, schema)
        for lbl, se in schema.get("shapes", {}).items()
    }


def _fold_right(items, zero, f):
    acc = zero
    for x in reversed(list(items)):
        acc = f(x, acc)
    return acc


def _cnv_shape_expr(se, schema: dict) -> tuple:
    if isinstance(se, str):  # ShapeRef by label
        return ("ref", se)
    t = se.get("type")
    if t == "ShapeAnd":
        return _fold_right(
            (_cnv_shape_expr(x, schema) for x in se["shapeExprs"]), STRUE, s_and
        )
    if t == "ShapeOr":
        return _fold_right(
            (_cnv_shape_expr(x, schema) for x in se["shapeExprs"]), SFALSE, s_or
        )
    if t == "ShapeNot":
        return ("not", _cnv_shape_expr(se["shapeExpr"], schema))
    if t == "NodeConstraint":
        return _cnv_node_constraint(se)
    if t == "Shape":
        expr = se.get("expression")
        if expr is None:
            return STRUE
        return _cnv_triple_expr(expr, schema)
    raise SLangError(f"shex2slang: Unimplemented {t}")


def _cnv_node_constraint(nc: dict) -> tuple:
    parts = []
    nk = nc.get("nodeKind")
    if nk is not None:
        if nk == "iri":
            parts.append(("iri",))
        elif nk == "bnode":
            parts.append(("bnode",))
        else:
            # literal/nonliteral unimplemented in the reference too
            # (ShEx2SLang.scala:81 cnvNodeKind)
            raise SLangError(f"shex2slang (cnvNodeKind): Unimplemented {nk}")
    dt = nc.get("datatype")
    if dt is not None:
        parts.append(("datatype", dt))
    if not parts:
        # facets/value sets are the reference's TODO (ShEx2SLang.scala:69)
        raise SLangError(f"cnvNodeConstraint({nc}): No values in constraint")
    return _fold_right(parts[1:], parts[0], lambda x, acc: s_and(acc, x))


def _te_predicates(te, schema: dict) -> list[str]:
    """All predicates mentioned by a triple expression (eo.predicates)."""
    if isinstance(te, str):
        return _te_predicates(schema.get("te_refs", {})[te], schema)
    t = te.get("type")
    if t == "TripleConstraint":
        return [te["predicate"]]
    if t in ("EachOf", "OneOf"):
        out = []
        for x in te["expressions"]:
            out.extend(_te_predicates(x, schema))
        return out
    return []


def _cnv_triple_expr(te, schema: dict) -> tuple:
    if isinstance(te, str):  # named triple-expr ref
        return _cnv_triple_expr(schema.get("te_refs", {})[te], schema)
    t = te.get("type")
    if t == "EachOf":
        folded = _fold_right(
            (_cnv_triple_expr(x, schema) for x in te["expressions"]),
            STRUE,
            s_and,
        )
        preds = frozenset(_te_predicates(te, schema))
        return s_and(
            folded,
            ("not", ("qa", ("nopreds", preds), STRUE, CARD_ONE_STAR)),
        )
    if t == "TripleConstraint":
        ve = te.get("valueExpr")
        s = STRUE if ve is None else _cnv_shape_expr(ve, schema)
        mn = te.get("min", 1)
        mx = te.get("max", 1)
        card = (mn, "star" if mx == -1 else mx)
        return s_and(
            ("qa", ("pred", te["predicate"]), s, card),
            ("not", ("qa", ("pred", te["predicate"]), ("not", s), CARD_ONE_STAR)),
        )
    raise SLangError(f"shex2slang (cnvTripleExpr): Unimplemented {t}")
