"""Conformance harness over the vendored W3C suites.

Mirrors the reference's manifest runner
(weso/shaclex src/main/scala/es/weso/shaclex/ShExTestRunner.scala:16-34) and
its SHACL manifest-driven tests. Parses the vendored manifests with our own
Turtle parser, runs our validators, and compares conformance status
(plus, for SHACL, the (focusNode, component) violation multiset).
"""

from __future__ import annotations

import os
from collections import defaultdict

from shaclex_ray.rdfio import parse_turtle
from shaclex_ray.shapes.shexj import load_shexj_file
from shaclex_ray.validate.local import Graph, ShExValidator

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
SHT = "http://www.w3.org/ns/shacl/test-suite#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

SHEX_VALIDATION_DIR = "/root/reference/src/test/resources/shexTest/validation"

# traits that require machinery we intentionally exclude — EMPTY since
# round 4: SemanticAction entries run via the shexTest Test extension
# (validate/local.py run_sem_acts), ExternalShape entries resolve against
# the manifest's sht:shapeExterns schema, and Greedy entries run under the
# greedy matching strategy (ShExValidator(matching="greedy"), selected by
# trait — the sht:Exhaustive twins keep running under the default).
SKIP_TRAITS: set[str] = set()


def _index(triples):
    spo = defaultdict(lambda: defaultdict(list))
    for s, p, o in triples:
        spo[s][p].append(o)
    return spo


def load_shex_manifest(path: str = None):
    """Parse the shexTest validation manifest into test-case dicts."""
    path = path or os.path.join(SHEX_VALIDATION_DIR, "manifest.ttl")
    base = "file://" + path
    triples = parse_turtle(open(path).read(), base=base)
    spo = _index(triples)
    cases = []
    for s, po in spo.items():
        types = po.get(RDF_TYPE, [])
        kinds = [o[1] for o in types if o[0] == "iri"]
        if SHT + "ValidationTest" in kinds:
            expected = True
        elif SHT + "ValidationFailure" in kinds:
            expected = False
        else:
            continue
        action = po.get(MF + "action", [None])[0]
        if action is None:
            continue
        apo = spo.get(action, {})
        schema = apo.get(SHT + "schema", [None])[0]
        data = apo.get(SHT + "data", [None])[0]
        focus = apo.get(SHT + "focus", [None])[0]
        shape = apo.get(SHT + "shape", [None])[0]
        maps = apo.get(SHT + "map", [None])[0]
        externs = apo.get(SHT + "shapeExterns", [None])[0]
        traits = {o[1] for o in po.get(SHT + "trait", []) if o[0] == "iri"}
        name = po.get(MF + "name", [("lit", s, "", "")])[0][1]
        result = po.get(MF + "result", [None])[0]
        cases.append(
            {
                "id": s,
                "name": name,
                "expected": expected,
                "schema": schema,
                "data": data,
                "focus": focus,
                "shape": shape,
                "map": maps,
                "externs": externs,
                "result": result,
                "traits": traits,
            }
        )
    return cases


_SHEXTEST_WEB = "https://raw.githubusercontent.com/shexSpec/shexTest/master/"
_SHEXTEST_LOCAL = "/root/reference/src/test/resources/shexTest/"


def _iri_to_path(term) -> str | None:
    if term is None or term[0] != "iri":
        return None
    v = term[1]
    if v.startswith("file://"):
        return v[len("file://") :]
    if v.startswith(_SHEXTEST_WEB):
        return _SHEXTEST_LOCAL + v[len(_SHEXTEST_WEB) :]
    return None


def _run_shex_map_case(case: dict, schema, graph):
    """Shapemap-style entry (sht:map + mf:result): validate every
    association in the query map and compare the per-(node, shape) results
    against the expected results JSON (the reference runs these through
    fixShapeMap + validateShapeMap, ShExTestRunner.scala:16-34)."""
    import json as _json

    mpath = _iri_to_path(case["map"])
    if mpath is None or not os.path.exists(mpath):
        return "skip", "no map file"
    assocs = _json.loads(open(mpath).read())
    v = ShExValidator(schema, graph)
    got: dict[str, list] = {}
    for a in assocs:
        node_iri = a["node"]
        shape = a["shape"]
        res = v.validate_node_shape(("iri", node_iri), shape)
        got.setdefault(node_iri, []).append({"shape": shape, "result": res})
    rpath = _iri_to_path(case["result"])
    if rpath is not None and os.path.exists(rpath):
        expected = _json.loads(open(rpath).read())
        norm = lambda m: {  # noqa: E731
            n: sorted((e["shape"], bool(e["result"])) for e in entries)
            for n, entries in m.items()
        }
        if norm(got) == norm(expected):
            return "pass", ""
        return "fail", f"map results differ: got {got} expected {expected}"
    # no result file: the entry type pins overall conformance
    all_ok = all(e["result"] for entries in got.values() for e in entries)
    if all_ok == case["expected"]:
        return "pass", ""
    return "fail", f"overall {all_ok}, expected {case['expected']}"


def run_shex_case(case: dict):
    """Run one shexTest case. Returns (status, detail) where status is
    'pass' | 'fail' | 'skip' | 'error'."""
    if case["traits"] & SKIP_TRAITS:
        return "skip", "trait"
    if case["map"] is None and case["focus"] is None:
        return "skip", "no focus"
    spath = _iri_to_path(case["schema"])
    dpath = _iri_to_path(case["data"])
    if spath is None or dpath is None:
        return "skip", "non-local"
    jpath = os.path.splitext(spath)[0] + ".json"
    if not os.path.exists(jpath):
        return "skip", "no shexj"
    try:
        # base = the schema's canonical IRI: relative IRIs in the schema
        # resolve against it (sht:relativeIRI entries; no-op for the rest)
        schema = load_shexj_file(jpath, base=case["schema"][1])
        if SHT + "Greedy" in case["traits"]:
            schema["_matching"] = "greedy"
        if case.get("externs") is not None:
            # EXTERNAL declarations resolve against the shapeExterns schema
            # (its .jsontern twin is the ShExJ form)
            epath = _iri_to_path(case["externs"])
            ejson = os.path.splitext(epath)[0] + ".jsontern"
            if not os.path.exists(ejson):
                return "skip", "no externs twin"
            schema["externs"] = load_shexj_file(ejson, base=case["externs"][1])
        # parse data against its canonical (manifest-relative) IRI so that
        # relative focus nodes in the manifest land on the same IRIs
        data_triples = parse_turtle(open(dpath, newline="").read(), base=case["data"][1])
        graph = Graph(data_triples)
        if case["map"] is not None:
            return _run_shex_map_case(case, schema, graph)
        v = ShExValidator(schema, graph)
        focus = case["focus"]
        shape = None
        if case["shape"]:
            # bnode shape labels are "_:"-prefixed in ShExJ ids
            shape = (
                "_:" + case["shape"][1]
                if case["shape"][0] == "bnode"
                else case["shape"][1]
            )
        got = v.validate_node_shape(focus, shape)
    except Exception as e:  # noqa: BLE001
        return "error", f"{type(e).__name__}: {e}"
    if got == case["expected"]:
        return "pass", ""
    return "fail", f"got {got}, expected {case['expected']}"


# ---------------------------------------------------------------------------
# SHACL core suite (self-contained Turtle manifests: shapes + data +
# expected sh:ValidationReport in one file)

SHACL_TESTS_DIR = "/root/reference/src/test/resources/shacl/tests"
SHX = "http://www.w3.org/ns/shacl#"
SHT2 = "http://www.w3.org/ns/shacl-test#"


def load_shacl_cases(root: str = None, subset: str = "core"):
    import glob as _glob

    root = root or SHACL_TESTS_DIR
    files = sorted(_glob.glob(os.path.join(root, subset, "**", "*.ttl"), recursive=True))
    return [f for f in files if not f.endswith("manifest.ttl")]


def run_shacl_case(path: str):
    """Run one SHACL core test file. Returns (status, detail)."""
    from shaclex_ray.shapes.shacl import compile_shacl
    from shaclex_ray.terms import term_key
    from shaclex_ray.validate.shacl_local import ShaclValidator

    try:
        doc_iri = "file://" + path[: -len(".ttl")]
        triples = parse_turtle(open(path, newline="").read(), base=doc_iri)
        spo = _index(triples)
        # find the sht:Validate entry, its action graphs and expected report
        expected_results = []
        expected_conforms = None
        data_ref = shapes_ref = None
        for s, po in spo.items():
            kinds = [o[1] for o in po.get(RDF_TYPE, []) if o[0] == "iri"]
            if SHT2 + "Validate" not in kinds:
                continue
            action = po.get(MF + "action", [None])[0]
            if action is not None:
                apo = spo.get(action, {})
                data_ref = apo.get(SHT2 + "dataGraph", [None])[0]
                shapes_ref = apo.get(SHT2 + "shapesGraph", [None])[0]
            res = po.get(MF + "result", [None])[0]
            if res is None:
                continue
            rpo = spo.get(res, {})
            conf = rpo.get(SHX + "conforms", [None])[0]
            expected_conforms = bool(conf and conf[1] == "true")
            for r in rpo.get(SHX + "result", []):
                rrpo = spo.get(r, {})
                fn = rrpo.get(SHX + "focusNode", [None])[0]
                comp = rrpo.get(SHX + "sourceConstraintComponent", [None])[0]
                expected_results.append(
                    (term_key(fn) if fn else None, comp[1] if comp else None)
                )
        if expected_conforms is None:
            return "skip", "no expected report"

        def graph_triples(ref):
            """Resolve a sht:dataGraph / sht:shapesGraph reference."""
            if ref is None or ref[1] == doc_iri:
                return triples
            gpath = ref[1]
            if gpath.startswith("file://"):
                gpath = gpath[len("file://") :]
            return parse_turtle(
                open(gpath, newline="").read(),
                base=ref[1][: -len(".ttl")] if ref[1].endswith(".ttl") else ref[1],
            )

        data_triples = graph_triples(data_ref)
        shapes_triples = (
            data_triples
            if (shapes_ref is None or (data_ref and shapes_ref[1] == data_ref[1]))
            else graph_triples(shapes_ref)
        )
        schema = compile_shacl(shapes_triples)
        graph = Graph(data_triples)
        v = ShaclValidator(schema, graph)
        conforms, results = v.validate_all()
        got = sorted((r["focus"], r["component"]) for r in results)
        exp = sorted(expected_results)
        if conforms == expected_conforms and got == exp:
            return "pass", ""
        detail = f"conforms got={conforms} exp={expected_conforms}"
        if got != exp:
            missing = [x for x in exp if x not in got]
            extra_ = [x for x in got if x not in exp]
            detail += f"; missing={missing[:4]} extra={extra_[:4]}"
        return "fail", detail
    except Exception as e:  # noqa: BLE001
        return "error", f"{type(e).__name__}: {e}"
