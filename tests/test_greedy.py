"""Greedy matching strategy (sht:Greedy suite entries) — direct kernel
pins, independent of the conformance harness: in-arc-order maximal
consumption starves a later constraint that exhaustive matching would
satisfy by backtracking, and the `_matching` schema flag selects the
strategy."""

EX = "http://ex.org/"


def _shape_plus_then_one():
    """S = { :p . + ; :p [:x1] } — the nPlus1 shape family: an unbounded
    wildcard TC followed by a value-pinned TC on the SAME predicate."""
    return {
        "shapes": {
            EX + "S": {
                "type": "Shape",
                "expression": {
                    "type": "EachOf",
                    "expressions": [
                        {
                            "type": "TripleConstraint",
                            "predicate": EX + "p",
                            "min": 1,
                            "max": -1,
                        },
                        {
                            "type": "TripleConstraint",
                            "predicate": EX + "p",
                            "valueExpr": {
                                "type": "NodeConstraint",
                                "values": [EX + "x1"],
                            },
                            "min": 1,
                            "max": 1,
                        },
                    ],
                },
            }
        }
    }


def _graph():
    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.validate.local import Graph

    ttl = "@prefix ex: <http://ex.org/> .\nex:s ex:p ex:x1 , ex:x2 .\n"
    return Graph(parse_turtle(ttl))


def test_greedy_starves_where_exhaustive_backtracks():
    from shaclex_ray.validate.local import ShExValidator

    node = ("iri", EX + "s")
    # exhaustive (default): the + takes ex:x2, the pinned TC takes ex:x1
    assert ShExValidator(_shape_plus_then_one(), _graph()).validate_node_shape(
        node, EX + "S"
    )
    # greedy: the + consumes BOTH p-arcs in order; the pinned TC starves
    assert not ShExValidator(
        _shape_plus_then_one(), _graph(), matching="greedy"
    ).validate_node_shape(node, EX + "S")


def test_matching_flag_rides_the_schema_dict():
    """`schema["_matching"]` (how the trait reaches the distributed
    buckets' broadcast schema) selects greedy without a constructor arg."""
    from shaclex_ray.validate.local import ShExValidator

    schema = _shape_plus_then_one()
    schema["_matching"] = "greedy"
    assert not ShExValidator(schema, _graph()).validate_node_shape(
        ("iri", EX + "s"), EX + "S"
    )


def test_greedy_agrees_on_satisfiable_order():
    """When the pinned TC comes FIRST it grabs ex:x1 before the wildcard
    + sweeps the rest — greedy passes, same as exhaustive (positive
    control: greedy is order-sensitive, not uniformly stricter)."""
    from shaclex_ray.validate.local import ShExValidator

    schema = _shape_plus_then_one()
    expr = schema["shapes"][EX + "S"]["expression"]
    expr["expressions"].reverse()
    assert ShExValidator(schema, _graph(), matching="greedy").validate_node_shape(
        ("iri", EX + "s"), EX + "S"
    )
