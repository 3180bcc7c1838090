"""RDF/JSON reader (the "RDF 1.1 JSON Alternate Serialization" W3C note)
— the last DataFormats entry (reference
modules/schema/src/main/scala/es/weso/schema/DataFormats.scala:8-29).

Shape: { subject: { predicate: [ value-object, ... ], ... }, ... } where
subject is an IRI or "_:label", and a value object is
{"type": "uri"|"literal"|"bnode", "value": ..., "lang"?: ..,
 "datatype"?: ..}. Parses into the identical term-tuple triples as the
Turtle twin (tests pin the equality; same convention as rdfxml/jsonld).
"""

from __future__ import annotations

import json
from urllib.parse import urljoin

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


class RdfJsonError(ValueError):
    pass


def _subject_term(s: str, base: str, bnode_prefix: str) -> tuple:
    if s.startswith("_:"):
        return ("bnode", bnode_prefix + s[2:])
    return ("iri", urljoin(base, s) if base else s)


def _object_term(vo: dict, base: str, bnode_prefix: str) -> tuple:
    if not isinstance(vo, dict) or "type" not in vo or "value" not in vo:
        raise RdfJsonError(f"bad value object {vo!r}")
    t, v = vo["type"], vo["value"]
    if t == "uri":
        return ("iri", urljoin(base, v) if base else v)
    if t == "bnode":
        ident = v[2:] if v.startswith("_:") else v
        return ("bnode", bnode_prefix + ident)
    if t == "literal":
        lang = (vo.get("lang") or "").lower()
        if lang:
            return ("lit", v, RDF_LANGSTRING, lang)
        dt = vo.get("datatype") or XSD_STRING
        return ("lit", v, dt, "")
    raise RdfJsonError(f"unknown value-object type {t!r}")


def parse_rdfjson(
    text: str | dict, base: str = "", bnode_prefix: str = ""
) -> list[tuple]:
    """Parse an RDF/JSON document into a list of term triples
    (same tuple convention as parse_turtle — tests pin twin-equality)."""
    doc = json.loads(text) if isinstance(text, str) else text
    if not isinstance(doc, dict):
        raise RdfJsonError("RDF/JSON document must be a JSON object")
    triples: list[tuple] = []
    for s, po in doc.items():
        if not isinstance(po, dict):
            raise RdfJsonError(f"subject {s!r} must map to an object")
        subj = _subject_term(s, base, bnode_prefix)
        for p, vals in po.items():
            pred = urljoin(base, p) if base else p
            if not isinstance(vals, list):
                raise RdfJsonError(f"predicate {p!r} must map to an array")
            for vo in vals:
                triples.append((subj, pred, _object_term(vo, base, bnode_prefix)))
    return triples
