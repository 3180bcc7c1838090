"""RDF/XML parser (S1 format-gap closure).

From-scratch implementation of the RDF/XML-to-triples mapping on the
stdlib XML parser, covering the serialization forms that appear in
practice (and in the reference's accepted `DataFormats` —
weso/shaclex modules/schema/src/main/scala/es/weso/schema/DataFormats.scala:8-29,
wired at src/main/scala/es/weso/shaclex/Main.scala:253-274):

  * rdf:RDF root (or a single node element document)
  * node elements: rdf:Description and typed nodes (element name = type)
  * rdf:about / rdf:resource / rdf:nodeID / rdf:ID
  * property elements with literal content, xml:lang, rdf:datatype
  * nested node elements, rdf:parseType="Resource" and "Literal"
  * rdf:parseType="Collection" (RDF list construction)
  * property attributes on node elements
  * rdf:li expansion to rdf:_1, rdf:_2, …
  * xml:base and relative IRI resolution

Emits the engine's Python term triples: (subj, pred, obj) with terms
('iri', v) / ('bnode', id) / ('lit', lex, dt, lang). Document-scoped
bnode ids can be prefixed via ``bnode_prefix`` (same scoping rule as the
Turtle parser — SURVEY.md O6).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from shaclex_ray.terms import RDF, RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD_STRING

_XML_NS = "http://www.w3.org/XML/1998/namespace"

# attributes of the RDF namespace that are NOT property attributes
_SYNTAX_ATTRS = {
    RDF + a
    for a in (
        "about",
        "ID",
        "nodeID",
        "resource",
        "datatype",
        "parseType",
        "RDF",
        "Description",
        "li",
    )
}


class RdfXmlError(ValueError):
    pass


def _clark_to_iri(tag: str) -> str:
    """ElementTree Clark notation '{ns}local' -> concatenated IRI."""
    if not tag.startswith("{"):
        raise RdfXmlError(f"unqualified XML name {tag!r}")
    ns, local = tag[1:].split("}", 1)
    return ns + local


class _Parser:
    def __init__(self, base: str, bnode_prefix: str):
        self.base = base
        self.bnode_prefix = bnode_prefix
        self.triples: list[tuple] = []
        self._bn = 0

    def fresh_bnode(self) -> tuple:
        self._bn += 1
        return ("bnode", f"{self.bnode_prefix}rx{self._bn}")

    def named_bnode(self, node_id: str) -> tuple:
        return ("bnode", f"{self.bnode_prefix}{node_id}")

    def resolve(self, iri: str, base: str) -> str:
        return urljoin(base, iri)

    def emit(self, s, p, o):
        self.triples.append((s, p, o))

    # ---- node elements ---------------------------------------------------
    def node_element(self, el, base: str) -> tuple:
        base = el.get(_clark("base"), base)
        about = _rdfa(el, "about")
        node_id = _rdfa(el, "nodeID")
        rid = _rdfa(el, "ID")
        if about is not None:
            subj = ("iri", self.resolve(about, base))
        elif node_id is not None:
            subj = self.named_bnode(node_id)
        elif rid is not None:
            subj = ("iri", self.resolve("#" + rid, base))
        else:
            subj = self.fresh_bnode()

        tag_iri = _clark_to_iri(el.tag)
        if tag_iri != RDF + "Description":
            self.emit(subj, RDF_TYPE, ("iri", tag_iri))

        # property attributes (non-syntax attrs on the node element)
        lang = el.get(f"{{{_XML_NS}}}lang", "")
        for k, v in el.attrib.items():
            iri = _attr_iri(k)
            if iri is None or iri in _SYNTAX_ATTRS or iri.startswith(_XML_NS):
                continue
            if iri == RDF_TYPE:
                self.emit(subj, RDF_TYPE, ("iri", self.resolve(v, base)))
            else:
                self.emit(subj, iri, _lit(v, lang))

        li_counter = [0]  # rdf:li numbering restarts per node element
        for prop in el:
            self.property_element(subj, prop, base, lang, li_counter)
        return subj

    # ---- property elements ----------------------------------------------
    def property_element(self, subj, el, base: str, lang: str, li_counter=None):
        base = el.get(_clark("base"), base)
        lang = el.get(f"{{{_XML_NS}}}lang", lang)
        pred = _clark_to_iri(el.tag)
        if pred == RDF + "li":
            # element-scoped rdf:li counter (RDF/XML spec liCounter)
            if li_counter is None:
                li_counter = [0]
            li_counter[0] += 1
            pred = RDF + f"_{li_counter[0]}"

        parse_type = _rdfa(el, "parseType")
        resource = _rdfa(el, "resource")
        node_id = _rdfa(el, "nodeID")
        datatype = _rdfa(el, "datatype")
        children = list(el)

        if parse_type == "Resource":
            inner = self.fresh_bnode()
            self.emit(subj, pred, inner)
            inner_li = [0]  # fresh element scope for rdf:li numbering
            for sub in children:
                self.property_element(inner, sub, base, lang, inner_li)
            return
        if parse_type == "Literal":
            xml_text = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            self.emit(
                subj,
                pred,
                ("lit", xml_text, RDF + "XMLLiteral", ""),
            )
            return
        if parse_type == "Collection":
            items = [self.node_element(c, base) for c in children]
            prev = None
            head = ("iri", RDF_NIL)
            for item in reversed(items):
                cell = self.fresh_bnode()
                self.emit(cell, RDF_FIRST, item)
                self.emit(cell, RDF_REST, prev if prev is not None else ("iri", RDF_NIL))
                prev = cell
            if prev is not None:
                head = prev
            self.emit(subj, pred, head)
            return

        if resource is not None:
            self.emit(subj, pred, ("iri", self.resolve(resource, base)))
            return
        if node_id is not None:
            self.emit(subj, pred, self.named_bnode(node_id))
            return

        # property attributes shorthand: <p a:x="1"/> => _:b a:x "1"
        prop_attrs = {
            iri: v
            for k, v in el.attrib.items()
            if (iri := _attr_iri(k)) is not None
            and iri not in _SYNTAX_ATTRS
            and not iri.startswith(_XML_NS)
        }
        if prop_attrs and not children:
            inner = self.fresh_bnode()
            self.emit(subj, pred, inner)
            for iri, v in prop_attrs.items():
                if iri == RDF_TYPE:
                    self.emit(inner, RDF_TYPE, ("iri", self.resolve(v, base)))
                else:
                    self.emit(inner, iri, _lit(v, lang))
            return

        if children:
            if len(children) != 1:
                raise RdfXmlError(
                    f"property element {pred} with {len(children)} node children"
                )
            obj = self.node_element(children[0], base)
            self.emit(subj, pred, obj)
            return

        text = el.text or ""
        if datatype is not None:
            self.emit(subj, pred, ("lit", text, datatype, ""))
        else:
            self.emit(subj, pred, _lit(text, lang))


def _clark(local: str) -> str:
    return f"{{{_XML_NS}}}{local}"


def _rdfa(el, name: str):
    """RDF-namespace attribute lookup (ElementTree Clark notation)."""
    return el.get("{" + RDF + "}" + name)


def _attr_iri(key: str) -> str | None:
    """Attribute key -> IRI (None for unqualified non-RDF attributes)."""
    if key.startswith("{"):
        return _clark_to_iri(key)
    return None  # unqualified attribute: not a property attribute


def _lit(lex: str, lang: str) -> tuple:
    if lang:
        return ("lit", lex, RDF + "langString", lang)
    return ("lit", lex, XSD_STRING, "")


def parse_rdfxml(text: str, base: str = "", bnode_prefix: str = "") -> list[tuple]:
    """Parse an RDF/XML document into a list of term triples."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlError(f"XML parse error: {e}") from e
    p = _Parser(base, bnode_prefix)
    root_base = root.get(_clark("base"), base)
    if _clark_to_iri(root.tag) == RDF + "RDF":
        for el in root:
            p.node_element(el, root_base)
    else:
        p.node_element(root, root_base)
    return p.triples
