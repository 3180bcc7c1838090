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

# traits that require machinery we intentionally exclude (the reference also
# treats semantic actions as an extension point — SURVEY.md §2.11)
SKIP_TRAITS = {
    SHT + "SemanticAction",
    SHT + "ExternalShape",
    SHT + "ShapeMap",
    SHT + "Import",
    SHT + "relativeIRI",
    # Greedy-trait entries pin the *greedy* matching strategy; we (like the
    # spec and the reference's exhaustive validator) use exhaustive matching,
    # whose expected results are the sht:Exhaustive twins of these entries.
    SHT + "Greedy",
}


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
        traits = {o[1] for o in po.get(SHT + "trait", []) if o[0] == "iri"}
        name = po.get(MF + "name", [("lit", s, "", "")])[0][1]
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


def run_shex_case(case: dict):
    """Run one shexTest case. Returns (status, detail) where status is
    'pass' | 'fail' | 'skip' | 'error'."""
    if case["traits"] & SKIP_TRAITS:
        return "skip", "trait"
    if case["map"] is not None or case["focus"] is None:
        return "skip", "shapemap-style"
    spath = _iri_to_path(case["schema"])
    dpath = _iri_to_path(case["data"])
    if spath is None or dpath is None:
        return "skip", "non-local"
    jpath = os.path.splitext(spath)[0] + ".json"
    if not os.path.exists(jpath):
        return "skip", "no shexj"
    try:
        schema = load_shexj_file(jpath)
        # parse data against its canonical (manifest-relative) IRI so that
        # relative focus nodes in the manifest land on the same IRIs
        data_triples = parse_turtle(open(dpath, newline="").read(), base=case["data"][1])
        graph = Graph(data_triples)
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
