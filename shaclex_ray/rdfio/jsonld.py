"""JSON-LD parser (S1 format-gap closure).

From-scratch implementation of the JSON-LD-to-RDF mapping for the
practical subset (inline contexts; the sandbox has no network, so remote
@context IRIs raise):

  * @context: term→IRI strings, prefix definitions ("ex": "http://…"),
    expanded term definitions {"@id", "@type" (coercion incl. "@id"),
    "@container": "@list"/"@set"}, "@vocab", "@base", keyword aliases
    ("id": "@id"), arrays of contexts (merged left-to-right)
  * node objects: @id (IRI / "_:" bnode), @type, nested node objects,
    value objects {"@value", "@type", "@language"}, @list, arrays,
    @graph (flattened — union-graph reading, like our TriG handling)
  * plain JSON scalars: strings → xsd:string, integers → xsd:integer,
    floats → xsd:double, booleans → xsd:boolean (standard JSON-LD
    conversion rules)

Emits engine term triples; reference accepts JSON-LD via Jena
(DataFormats.scala:8-29)."""

from __future__ import annotations

import json
from urllib.parse import urljoin

from shaclex_ray.terms import (
    RDF_FIRST,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD,
    XSD_STRING,
)


class JsonLdError(ValueError):
    pass


_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@set",
             "@graph", "@context", "@vocab", "@base", "@container", "@index"}


class _Context:
    def __init__(self, base: str):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base = base
        self.aliases: dict[str, str] = {}  # user term -> keyword

    def copy(self) -> "_Context":
        c = _Context(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.aliases = dict(self.aliases)
        return c

    def merge(self, ctx) -> "_Context":
        out = self.copy()
        if ctx is None:
            return _Context(self.base)  # null context resets
        if isinstance(ctx, list):
            for sub in ctx:
                out = out.merge(sub)
            return out
        if isinstance(ctx, str):
            raise JsonLdError(f"remote @context not supported: {ctx}")
        if not isinstance(ctx, dict):
            raise JsonLdError(f"bad @context: {ctx!r}")
        for term, defn in ctx.items():
            if term == "@vocab":
                out.vocab = defn
            elif term == "@base":
                out.base = urljoin(out.base, defn) if out.base else defn
            elif isinstance(defn, str):
                if defn in ("@id", "@type"):
                    out.aliases[term] = defn
                else:
                    out.terms[term] = {"@id": defn}
            elif isinstance(defn, dict):
                out.terms[term] = defn
            elif defn is None:
                out.terms.pop(term, None)
        return out

    def expand_iri(self, value: str, vocab_pos: bool = False) -> str | None:
        """Expand a term / compact IRI / relative IRI. Term definitions
        apply only in vocab position (predicates, @type) — an @id value
        that happens to collide with a term resolves document-relatively,
        per the JSON-LD IRI-expansion algorithm."""
        if value.startswith("_:"):
            return value
        if vocab_pos and value in self.terms:
            tid = self.terms[value].get("@id")
            if tid is None:
                return None
            return self.expand_iri(tid, vocab_pos=True)
        if ":" in value:
            pfx, local = value.split(":", 1)
            if pfx in self.terms and not local.startswith("//"):
                base = self.terms[pfx].get("@id", "")
                return base + local
            return value  # absolute IRI
        if vocab_pos and self.vocab:
            return self.vocab + value
        if self.base:
            return urljoin(self.base, value)
        return value

    def term_def(self, term: str) -> dict:
        return self.terms.get(term, {})


class _Parser:
    def __init__(self, base: str, bnode_prefix: str):
        self.bnode_prefix = bnode_prefix
        self.triples: list[tuple] = []
        self._bn = 0
        self.base = base

    def fresh_bnode(self) -> tuple:
        self._bn += 1
        return ("bnode", f"{self.bnode_prefix}jb{self._bn}")

    def emit(self, s, p, o):
        self.triples.append((s, p, o))

    def node_term(self, ident: str, ctx: _Context) -> tuple:
        if ident.startswith("_:"):
            return ("bnode", self.bnode_prefix + ident[2:])
        return ("iri", ctx.expand_iri(ident))

    def _scalar_literal(self, v) -> tuple:
        if isinstance(v, bool):
            return ("lit", "true" if v else "false", XSD + "boolean", "")
        if isinstance(v, int):
            return ("lit", str(v), XSD + "integer", "")
        if isinstance(v, float):
            return ("lit", repr(v), XSD + "double", "")
        return ("lit", str(v), XSD_STRING, "")

    def value_object(self, obj: dict, ctx: _Context, type_coercion: str | None) -> tuple:
        v = obj["@value"]
        lang = obj.get("@language", "")
        dt = obj.get("@type")
        if dt is not None:
            dt = ctx.expand_iri(dt, vocab_pos=True)
        if lang:
            return ("lit", str(v), RDF_LANGSTRING, lang)
        if dt:
            if isinstance(v, bool):
                v = "true" if v else "false"
            return ("lit", str(v), dt, "")
        return self._scalar_literal(v)

    def list_object(self, items: list, ctx: _Context, coercion) -> tuple:
        prev = ("iri", RDF_NIL)
        for item in reversed(items):
            cell = self.fresh_bnode()
            self.emit(cell, RDF_FIRST, self.to_object(item, ctx, coercion))
            self.emit(cell, RDF_REST, prev)
            prev = cell
        return prev

    def to_object(self, v, ctx: _Context, coercion: str | None) -> tuple:
        if isinstance(v, dict):
            if "@value" in v:
                return self.value_object(v, ctx, coercion)
            if "@list" in v:
                return self.list_object(v["@list"], ctx, coercion)
            return self.node_object(v, ctx)
        if isinstance(v, str):
            if coercion == "@id":
                return self.node_term(v, ctx)
            if coercion and coercion.startswith("@"):
                pass
            elif coercion:
                return ("lit", v, coercion, "")
            return ("lit", v, XSD_STRING, "")
        lit = self._scalar_literal(v)
        if coercion and not coercion.startswith("@") and not isinstance(v, str):
            return ("lit", lit[1], coercion, "")
        return lit

    def node_object(self, obj: dict, ctx: _Context) -> tuple:
        if "@context" in obj:
            ctx = ctx.merge(obj["@context"])
        # resolve keyword aliases
        def kw(key: str) -> str:
            return ctx.aliases.get(key, key)

        ident = None
        for k in obj:
            if kw(k) == "@id":
                ident = obj[k]
                break
        subj = self.node_term(ident, ctx) if ident is not None else self.fresh_bnode()

        for k, v in obj.items():
            key = kw(k)
            if key == "@type":
                for t in v if isinstance(v, list) else [v]:
                    self.emit(subj, RDF_TYPE, ("iri", ctx.expand_iri(t, vocab_pos=True)))
                continue
            if key == "@graph":
                for node in v if isinstance(v, list) else [v]:
                    self.node_object(node, ctx)
                continue
            if key.startswith("@"):
                continue
            pred = ctx.expand_iri(k, vocab_pos=True)
            if pred is None or (":" not in pred):
                continue  # term with no IRI mapping: dropped (JSON-LD rule)
            tdef = ctx.term_def(k)
            coercion = tdef.get("@type")
            if coercion and coercion not in ("@id",):
                coercion = ctx.expand_iri(coercion, vocab_pos=True)
            container = tdef.get("@container")
            vals = v if isinstance(v, list) else [v]
            if container == "@list":
                self.emit(subj, pred, self.list_object(vals, ctx, coercion))
                continue
            for item in vals:
                self.emit(subj, pred, self.to_object(item, ctx, coercion))
        return subj


def parse_jsonld(text: str | dict | list, base: str = "", bnode_prefix: str = "") -> list[tuple]:
    """Parse a JSON-LD document into a list of term triples."""
    doc = json.loads(text) if isinstance(text, str) else text
    p = _Parser(base, bnode_prefix)
    ctx = _Context(base)
    if isinstance(doc, list):
        for node in doc:
            p.node_object(node, ctx)
        return p.triples
    if not isinstance(doc, dict):
        raise JsonLdError("document must be an object or array")
    if "@context" in doc:
        ctx = ctx.merge(doc["@context"])
    if "@graph" in doc and not any(
        k for k in doc if k not in ("@context", "@graph")
    ):
        for node in doc["@graph"] if isinstance(doc["@graph"], list) else [doc["@graph"]]:
            p.node_object(node, ctx)
        return p.triples
    p.node_object(doc, ctx)
    return p.triples
