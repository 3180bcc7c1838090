"""ShEx semantic actions (the shexTest Test extension,
http://shex.io/extensions/Test/) — run since round 4; the 18
SemanticAction suite entries execute in the full-parity conformance test.
Here: the dispatch kernel, ShExC retention (vs the ShExJ twins), and the
distributed startActs rewrite."""

import json

SCHEMAS = "/root/reference/src/test/resources/shexTest/schemas"
TEST_EXT = "http://shex.io/extensions/Test/"


def test_run_sem_acts_kernel():
    from shaclex_ray.validate.local import run_sem_acts

    log = []
    assert run_sem_acts(
        [{"type": "SemAct", "name": TEST_EXT, "code": ' print(o) '}],
        s=("iri", "S"), p="P", o=("iri", "O"), log=log,
    )
    assert log == [("iri", "O")]
    log = []
    assert run_sem_acts(
        [{"type": "SemAct", "name": TEST_EXT, "code": ' print("lit") '}], log=log
    )
    assert log == ["lit"]
    # fail() fails, even sandwiched between prints
    assert not run_sem_acts(
        [
            {"type": "SemAct", "name": TEST_EXT, "code": " print(s) "},
            {"type": "SemAct", "name": TEST_EXT, "code": " fail(s) "},
            {"type": "SemAct", "name": TEST_EXT, "code": " print(o) "},
        ]
    )
    # no code -> success; unknown processor -> ignored (reference parity)
    assert run_sem_acts([{"type": "SemAct", "name": TEST_EXT}])
    assert run_sem_acts(
        [{"type": "SemAct", "name": "http://other.example/ext", "code": "boom"}]
    )
    # unrecognized Test code -> failure
    assert not run_sem_acts(
        [{"type": "SemAct", "name": TEST_EXT, "code": "frobnicate()"}]
    )


def test_shexc_retains_semacts_with_escapes():
    from shaclex_ray.shapes.shexc import parse_shexc

    for name in ("1dotCodeWithEscapes1", "startCode1", "1dotShapeCode1"):
        s = parse_shexc(
            open(f"{SCHEMAS}/{name}.shex").read(),
            base=f"file://{SCHEMAS}/{name}.shex",
        )
        j = json.load(open(f"{SCHEMAS}/{name}.json"))

        def acts(obj, out):
            if isinstance(obj, dict):
                out.extend(obj.get("semActs") or [])
                for v in obj.values():
                    acts(v, out)
            elif isinstance(obj, list):
                for v in obj:
                    acts(v, out)

        mine, ref = [], []
        acts(s["shapes"], mine)
        acts(j["shapes"], ref)
        key = lambda a: json.dumps(a, sort_keys=True)  # noqa: E731
        assert sorted(map(key, mine)) == sorted(map(key, ref)), name
        assert (s.get("startActs") or None) == (j.get("startActs") or None), name


def test_dist_start_acts_fail_all(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from shaclex_ray.terms import term_key, triples_to_table
    from shaclex_ray.validate.dist import distributed_validate

    triples = [(("iri", "http://e/x"), "http://e/p", ("iri", "http://e/y"))]
    schema = {
        "startActs": [{"type": "SemAct", "name": TEST_EXT, "code": " fail(s) "}],
        "shapes": {
            "http://e/S": {
                "type": "Shape",
                "expression": {
                    "type": "TripleConstraint",
                    "predicate": "http://e/p",
                },
            }
        },
        "te_refs": {},
    }
    focus = pa.table(
        {"node": [term_key(("iri", "http://e/x"))], "shape": ["http://e/S"]}
    )
    typing, _ = distributed_validate(
        rd.from_arrow(triples_to_table(triples)), "shex", schema, focus, nbuckets=2
    )
    vals = {
        typing.column("node")[i].as_py(): typing.column("val")[i].as_py()
        for i in range(typing.num_rows)
        if typing.column("is_focus")[i].as_py()
    }
    assert set(vals.values()) == {"notConforms"}


def test_dist_external_shape_resolution(ray_session):
    """The four shapeExtern* suite entries through distributed_validate,
    with the sht:shapeExterns schema attached (merged on the driver)."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from shaclex_ray.conformance import SHT, _iri_to_path, load_shex_manifest
    from shaclex_ray.rdfio import parse_turtle
    from shaclex_ray.shapes.shexj import load_shexj_file
    from shaclex_ray.terms import term_key, triples_to_table
    from shaclex_ray.validate.dist import distributed_validate

    checked = 0
    for c in load_shex_manifest():
        if (SHT + "ExternalShape") not in c["traits"]:
            continue
        jp = os.path.splitext(_iri_to_path(c["schema"]))[0] + ".json"
        schema = load_shexj_file(jp, base=c["schema"][1])
        ep = os.path.splitext(_iri_to_path(c["externs"]))[0] + ".jsontern"
        schema["externs"] = load_shexj_file(ep, base=c["externs"][1])
        data = parse_turtle(
            open(_iri_to_path(c["data"]), newline="").read(), base=c["data"][1]
        )
        focus = pa.table(
            {"node": [term_key(c["focus"])], "shape": [c["shape"][1]]}
        )
        typing, _ = distributed_validate(
            rd.from_arrow(triples_to_table(data)), "shex", schema, focus, nbuckets=2
        )
        got = None
        for i in range(typing.num_rows):
            if typing.column("is_focus")[i].as_py():
                got = typing.column("val")[i].as_py() == "conforms"
        assert got == c["expected"], c["name"]
        checked += 1
    assert checked == 4
