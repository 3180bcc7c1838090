"""Validation Result serialization (SURVEY.md S8/S9).

The reference's Result carries (isValid, message, shapeMaps,
validationReport, errors…) and serializes as TEXT / JSON / DETAILS
(modules/schema/src/main/scala/es/weso/schema/Result.scala:20-30,111-116).
We mirror the observable surface over our typing/report tables.
"""

from __future__ import annotations

import json

import pyarrow as pa

from shaclex_ray.terms import key_to_term, term_str


def _node_str(key: str) -> str:
    return term_str(key_to_term(key))


def result_json(typing: pa.Table, report: pa.Table | None = None) -> str:
    focus = typing.filter(typing.column("is_focus"))
    shape_map = [
        {
            "node": _node_str(n),
            "shape": s,
            "status": (
                "conformant"
                if v == "conforms"
                else (
                    "nonconformant"
                    if v == "notConforms"
                    # undecided (unknown / error:*) pairs are NOT a verdict
                    else "unknown"
                )
            ),
        }
        for n, s, v in zip(
            focus.column("node").to_pylist(),
            focus.column("shape").to_pylist(),
            focus.column("val").to_pylist(),
        )
    ]
    doc = {
        "valid": all(e["status"] == "conformant" for e in shape_map),
        "type": "Result",
        "shapeMap": shape_map,
    }
    if report is not None:
        doc["report"] = {
            "conforms": report.num_rows == 0,
            "results": [
                {
                    "focusNode": _node_str(r["focus_node"]),
                    "resultPath": r["path"] or None,
                    "value": r["value_lex"] or None,
                    "sourceConstraintComponent": r["component"],
                    "sourceShape": r["source_shape"],
                    "severity": r["severity"],
                    "message": r["message"],
                }
                for r in report.to_pylist()
            ],
        }
    return json.dumps(doc, indent=1)


def result_text(typing: pa.Table, report: pa.Table | None = None) -> str:
    focus = typing.filter(typing.column("is_focus"))
    lines = []
    valid = True
    for n, s, v in zip(
        focus.column("node").to_pylist(),
        focus.column("shape").to_pylist(),
        focus.column("val").to_pylist(),
    ):
        if v == "conforms":
            status = "OK"
        elif v == "notConforms":
            status = "FAIL"
        else:
            status = "UNKNOWN"  # undecided (unknown / error:*), not a verdict
        if v != "conforms":
            valid = False
        lines.append(f"{status} {_node_str(n)} @ {s}")
    header = "Valid" if valid else "Not valid"
    body = "\n".join(lines)
    if report is not None and report.num_rows:
        body += f"\n{report.num_rows} violation(s)"
    return f"{header}\n{body}"


def report_ntriples(report: pa.Table) -> str:
    """SHACL ValidationReport rendered as N-Triples (S9: report RDF render)."""
    sh = "http://www.w3.org/ns/shacl#"
    lines = [
        f'_:report <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{sh}ValidationReport> .',
        f'_:report <{sh}conforms> "{"true" if report.num_rows == 0 else "false"}"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
    ]
    for i, r in enumerate(report.to_pylist()):
        b = f"_:r{i}"
        lines.append(f"_:report <{sh}result> {b} .")
        lines.append(
            f'{b} <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <{sh}ValidationResult> .'
        )
        lines.append(f"{b} <{sh}focusNode> {_node_str(r['focus_node'])} .")
        if r["path"]:
            lines.append(f"{b} <{sh}resultPath> <{r['path']}> .")
        lines.append(f"{b} <{sh}sourceConstraintComponent> <{r['component']}> .")
        lines.append(f"{b} <{sh}resultSeverity> <{r['severity']}> .")
    return "\n".join(lines) + "\n"
