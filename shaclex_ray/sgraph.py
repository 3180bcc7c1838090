"""RDF graph visualization (SURVEY.md S12): triples → DOT / Cytoscape-JSON.

Re-expresses the reference's sgraph module
(modules/sgraph/src/main/scala/es.weso.rdf.sgraph/SGraph.scala:14-52,
RDF2SGraph.scala:18-22, Node.scala:21-27): stable node ids assigned on
first sight (N0, N1, …), one edge per triple, literal labels rendered with
@lang / ^^datatype suffixes. A debug sink: feed it ``ds.limit(n)`` — never
a full 100-TB graph.
"""

from __future__ import annotations

import json

from shaclex_ray.terms import XSD_STRING


def _label(kind: str, lex: str, dt: str, lang: str) -> str:
    if kind != "literal":
        return lex
    if lang:
        return f'"{lex}"@{lang}'
    if dt and dt != XSD_STRING:
        return f'"{lex}"^^{dt}'
    return f'"{lex}"'


def build_sgraph(rows) -> tuple[dict[str, str], list[tuple[str, str, str]]]:
    """rows: iterable of triple dicts -> (node_id map, edge list).
    Node ids are first-sight ordinals (reference SGraph.addNode dedup)."""
    ids: dict[str, str] = {}
    edges: list[tuple[str, str, str]] = []

    def nid(label: str) -> str:
        if label not in ids:
            ids[label] = f"N{len(ids)}"
        return ids[label]

    for r in rows:
        s = nid(r["subj"])
        o = nid(_label(r["obj_kind"], r["obj_lex"], r["obj_dt"], r["obj_lang"]))
        edges.append((s, o, r["pred"]))
    return ids, edges


def to_dot(rows) -> str:
    ids, edges = build_sgraph(rows)
    out = ["digraph G {"]
    for label, i in ids.items():
        esc = label.replace("\\", "\\\\").replace('"', '\\"')
        out.append(f'  {i} [label="{esc}"];')
    for s, o, p in edges:
        esc = p.replace("\\", "\\\\").replace('"', '\\"')
        out.append(f'  {s} -> {o} [label="{esc}"];')
    out.append("}")
    return "\n".join(out)


def to_cytoscape_json(rows) -> str:
    ids, edges = build_sgraph(rows)
    elements = [
        {"data": {"id": i, "label": label}} for label, i in ids.items()
    ] + [
        {"data": {"source": s, "target": o, "label": p}} for s, o, p in edges
    ]
    return json.dumps({"elements": elements}, indent=1)
