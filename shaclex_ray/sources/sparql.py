"""SPARQL-endpoint triple source (SURVEY.md S3; reference:
Main.scala:268-269 — validating nodes resident in a remote endpoint).

Two access paths, both speaking standard SPARQL 1.1 over a pluggable
transport:

  * ``read_sparql_endpoint(transport_factory)`` — BULK ingest: count the
    store once, then fetch deterministic ORDER BY pages in parallel Ray
    tasks (one ``map_batches`` over the page table; the transport is
    constructed once per actor) → a Dataset in TRIPLES_SCHEMA that feeds
    every downstream pipeline.
  * ``EndpointGraph`` — LAZY per-focus reader: the local validators'
    ``Graph`` interface (arcs_out / arcs_in) backed by batched VALUES
    neighborhood queries with a per-node cache, for validating a small
    focus set against a huge remote store without ingesting it.
    ``validate_endpoint()`` wires it behind the engine facade.

Transports return SPARQL-JSON result bindings (``{"type": "uri" |
"literal" | "bnode", "value": ..., "datatype"?, "xml:lang"?}``).
``HttpSparqlTransport`` does real HTTP (network-gated — this sandbox has
none); ``MockSparqlTransport`` answers the exact query templates below
from an in-memory triple list, so the full query-generation + parsing
plumbing is testable offline.
"""

from __future__ import annotations

import re

import pyarrow as pa

from shaclex_ray.terms import (
    RDF_TYPE,
    TRIPLES_SCHEMA,
    key_to_term,
    obj_cols,
    subj_str,
    term_key,
)

# --------------------------------------------------------------- queries

Q_COUNT = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
Q_PAGE = "SELECT ?s ?p ?o WHERE { ?s ?p ?o } ORDER BY ?s ?p ?o LIMIT %d OFFSET %d"
Q_OUT = "SELECT ?s ?p ?o WHERE { VALUES ?s { %s } ?s ?p ?o }"
Q_IN = "SELECT ?s ?p ?o WHERE { VALUES ?o { %s } ?s ?p ?o }"
Q_INSTANCES = "SELECT DISTINCT ?s WHERE { VALUES ?c { %s } ?s <%s> ?c }"
Q_SUBJECTS_OF = "SELECT DISTINCT ?s WHERE { ?s <%s> ?o }"
Q_OBJECTS_OF = "SELECT DISTINCT ?o WHERE { ?s <%s> ?o }"


def _term_to_binding(t: tuple) -> dict:
    if t[0] == "iri":
        return {"type": "uri", "value": t[1]}
    if t[0] == "bnode":
        return {"type": "bnode", "value": t[1]}
    b = {"type": "literal", "value": t[1]}
    if t[3]:
        b["xml:lang"] = t[3]
    elif t[2]:
        b["datatype"] = t[2]
    return b


def _binding_to_term(b: dict) -> tuple:
    k = b["type"]
    if k == "uri":
        return ("iri", b["value"])
    if k == "bnode":
        return ("bnode", b["value"])
    lang = b.get("xml:lang", "")
    if lang:
        return ("lit", b["value"], "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", lang.lower())
    return ("lit", b["value"], b.get("datatype", "http://www.w3.org/2001/XMLSchema#string"), "")


# -------------------------------------------------------------- transports


class HttpSparqlTransport:
    """SPARQL 1.1 Protocol over HTTP GET (application/sparql-results+json).
    Network-gated: this sandbox has no egress, so construction succeeds
    but queries raise the underlying URLError — callers on a real cluster
    get a working endpoint client with zero extra dependencies."""

    def __init__(self, endpoint_url: str, timeout: float = 60.0):
        self.endpoint_url = endpoint_url
        self.timeout = timeout

    def select(self, query: str) -> list[dict]:
        import json
        import urllib.parse
        import urllib.request

        url = self.endpoint_url + "?" + urllib.parse.urlencode({"query": query})
        req = urllib.request.Request(
            url, headers={"Accept": "application/sparql-results+json"}
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        return payload["results"]["bindings"]


class MockSparqlTransport:
    """In-memory endpoint answering exactly the templates this module
    emits (count / ordered page / VALUES-out / VALUES-in / instances /
    subjectsOf / objectsOf). Picklable — safe to ship to Ray workers."""

    def __init__(self, triples: list[tuple]):
        self.triples = list(triples)
        self.queries: list[str] = []  # observability for tests

    # ordered deterministically by term key for stable pagination
    def _sorted(self):
        return sorted(
            self.triples,
            key=lambda t: (term_key(t[0]), t[1], term_key(t[2])),
        )

    def select(self, query: str) -> list[dict]:
        self.queries.append(query)
        q = " ".join(query.split())
        if q == Q_COUNT:
            return [{"n": {"type": "literal", "value": str(len(self.triples)),
                           "datatype": "http://www.w3.org/2001/XMLSchema#integer"}}]
        m = re.fullmatch(
            r"SELECT \?s \?p \?o WHERE \{ \?s \?p \?o \} ORDER BY \?s \?p \?o "
            r"LIMIT (\d+) OFFSET (\d+)", q,
        )
        if m:
            lim, off = int(m.group(1)), int(m.group(2))
            return [
                {"s": _term_to_binding(s), "p": {"type": "uri", "value": p},
                 "o": _term_to_binding(o)}
                for s, p, o in self._sorted()[off : off + lim]
            ]
        m = re.fullmatch(
            r"SELECT \?s \?p \?o WHERE \{ VALUES \?(s|o) \{ (.*) \} \?s \?p \?o \}", q
        )
        if m:
            var, vals = m.group(1), set(re.findall(r"<([^>]*)>", m.group(2)))
            side = 0 if var == "s" else 2
            return [
                {"s": _term_to_binding(s), "p": {"type": "uri", "value": p},
                 "o": _term_to_binding(o)}
                for s, p, o in self._sorted()
                if (s if side == 0 else o)[0] == "iri"
                and (s if side == 0 else o)[1] in vals
            ]
        m = re.fullmatch(
            r"SELECT DISTINCT \?s WHERE \{ VALUES \?c \{ (.*) \} \?s <([^>]*)> \?c \}",
            q,
        )
        if m:
            classes, pred = set(re.findall(r"<([^>]*)>", m.group(1))), m.group(2)
            out, seen = [], set()
            for s, p, o in self._sorted():
                if p == pred and o[0] == "iri" and o[1] in classes:
                    k = term_key(s)
                    if k not in seen:
                        seen.add(k)
                        out.append({"s": _term_to_binding(s)})
            return out
        m = re.fullmatch(r"SELECT DISTINCT \?(s|o) WHERE \{ \?s <([^>]*)> \?o \}", q)
        if m:
            var, pred = m.group(1), m.group(2)
            out, seen = [], set()
            for s, p, o in self._sorted():
                if p == pred:
                    t = s if var == "s" else o
                    k = term_key(t)
                    if k not in seen:
                        seen.add(k)
                        out.append({var: _term_to_binding(t)})
            return out
        raise ValueError(f"MockSparqlTransport: unsupported query: {query!r}")


# ------------------------------------------------------------ bulk ingest


def _rows_to_table(bindings: list[dict]) -> pa.Table:
    subj, pred, ok, olx, odt, olg = [], [], [], [], [], []
    for b in bindings:
        s = _binding_to_term(b["s"])
        o = _binding_to_term(b["o"])
        subj.append(subj_str(s))
        pred.append(b["p"]["value"])
        k, lx, dt, lg = obj_cols(o)
        ok.append(k)
        olx.append(lx)
        odt.append(dt)
        olg.append(lg)
    n = len(subj)
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj_kind": pa.array(ok, pa.string()),
            "obj_lex": pa.array(olx, pa.string()),
            "obj_dt": pa.array(odt, pa.string()),
            "obj_lang": pa.array(olg, pa.string()),
            "doc_id": pa.array([""] * n, pa.string()),
            "span_idx": pa.array([-1] * n, pa.int32()),
        },
        schema=TRIPLES_SCHEMA,
    )


class _PageFetcher:
    """Actor-pool stage: one transport per actor (connection reuse), one
    ORDER BY page per input row."""

    def __init__(self, transport_factory):
        self.transport = transport_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = [
            _rows_to_table(self.transport.select(Q_PAGE % (int(lim), int(off))))
            for off, lim in zip(
                batch.column("offset").to_pylist(), batch.column("limit").to_pylist()
            )
        ]
        return pa.concat_tables(parts) if parts else TRIPLES_SCHEMA.empty_table()


def read_sparql_endpoint(
    transport_factory, page_size: int = 100_000, concurrency=None
):
    """Bulk-ingest an endpoint's default graph as a triples Dataset.

    ``transport_factory``: zero-arg callable returning a transport (a
    picklable class like ``lambda: HttpSparqlTransport(url)``); each Ray
    actor constructs its own. Pagination is ORDER BY-deterministic, so
    retried page tasks return identical rows. Page count scales with the
    store; page fetches run in parallel under Ray's backpressure."""
    import ray
    import ray.data as rd

    total = int(_binding_to_term(
        transport_factory().select(Q_COUNT)[0]["n"]
    )[1])
    offsets = list(range(0, max(total, 1), page_size))
    pages = pa.table(
        {
            "offset": pa.array(offsets, pa.int64()),
            "limit": pa.array([page_size] * len(offsets), pa.int64()),
        }
    )
    if concurrency is None:
        concurrency = (1, max(2, min(len(offsets), int(ray.cluster_resources().get("CPU", 4)))))
    return rd.from_arrow(pages).map_batches(
        _PageFetcher,
        fn_constructor_args=(transport_factory,),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ------------------------------------------------------- lazy focus graph


class EndpointGraph:
    """The local validators' ``Graph`` interface backed by an endpoint:
    arcs fetch lazily in batched VALUES queries and cache per node.
    Remote bnodes are not addressable in SPARQL — their neighborhoods
    resolve empty (same limitation as the reference's endpoint mode)."""

    def __init__(self, transport, batch_size: int = 256):
        self.transport = transport
        self.batch_size = batch_size
        self._out: dict[str, list] = {}
        self._in: dict[str, list] = {}

    def prefetch(self, node_keys, direction: str = "out"):
        cache = self._out if direction == "out" else self._in
        want = [
            k for k in dict.fromkeys(node_keys)
            if k not in cache and k.startswith("I")
        ]
        for i in range(0, len(want), self.batch_size):
            chunk = want[i : i + self.batch_size]
            values = " ".join("<%s>" % k[1:] for k in chunk)
            for k in chunk:
                cache[k] = []
            q = (Q_OUT if direction == "out" else Q_IN) % values
            for b in self.transport.select(q):
                s = _binding_to_term(b["s"])
                p = b["p"]["value"]
                o = _binding_to_term(b["o"])
                if direction == "out":
                    cache.setdefault(term_key(s), []).append((p, o))
                else:
                    cache.setdefault(term_key(o), []).append((p, s))

    def arcs_out(self, node_key: str):
        if node_key not in self._out:
            if not node_key.startswith("I"):
                return []
            self.prefetch([node_key], "out")
        return self._out.get(node_key, [])

    def arcs_in(self, node_key: str):
        if node_key not in self._in:
            if not node_key.startswith("I"):
                return []
            self.prefetch([node_key], "in")
        return self._in.get(node_key, [])


def _endpoint_targets(transport, compiled: dict) -> list[tuple[str, str]]:
    """(node_key, shape_key) pairs for a compiled SHACL schema's target
    declarations, resolved by endpoint queries."""
    pairs: list[tuple[str, str]] = []
    closure = compiled.get("subclass_closure", {})
    for skey in compiled.get("with_targets", []):
        sh = compiled["shapes"][skey]
        classes = []
        if sh.get("implicit_class"):
            classes.append(skey[1:])
        for kind, param in sh.get("targets", []):
            if kind == "node":
                pairs.append((param, skey))
            elif kind == "class":
                classes.append(param[1:])
                classes.extend(c[1:] for c in closure.get(param, []))
            elif kind == "subjectsOf":
                for b in transport.select(Q_SUBJECTS_OF % param):
                    pairs.append((term_key(_binding_to_term(b["s"])), skey))
            elif kind == "objectsOf":
                for b in transport.select(Q_OBJECTS_OF % param):
                    pairs.append((term_key(_binding_to_term(b["o"])), skey))
        if classes:
            values = " ".join("<%s>" % c for c in dict.fromkeys(classes))
            for b in transport.select(Q_INSTANCES % (values, RDF_TYPE)):
                pairs.append((term_key(_binding_to_term(b["s"])), skey))
    return sorted(set(pairs))


def validate_endpoint(
    transport,
    engine: str,
    schema,
    shapemap: str | None = None,
    prefixes: dict | None = None,
):
    """Validate focus nodes that live in a SPARQL endpoint — the
    reference's endpoint mode (Main.scala:268-269) behind the same
    facade. ShEx: fixed-node shapemap associations (selector shapemaps
    need a data scan; use ``read_sparql_endpoint`` + ``validate_shex``
    for those). SHACL: targets resolve via endpoint queries. Returns
    (typing: pa.Table(node, shape, val, is_focus), summary)."""
    from shaclex_ray.engine import _summary, compile_schema
    from shaclex_ray.shapes.shapemap import parse_shapemap
    from shaclex_ray.validate.local import ShExValidator
    from shaclex_ray.validate.shacl_local import ShaclValidator

    compiled = compile_schema(engine, schema)
    g = EndpointGraph(transport)
    rows: list[tuple[str, str, str]] = []
    if engine == "shex":
        if shapemap is None:
            raise ValueError("endpoint ShEx validation needs a shapemap")
        assocs = parse_shapemap(shapemap, prefixes or compiled.get("prefixes"))
        focus = []
        for a in assocs:
            if a["kind"] != "node":
                raise ValueError(
                    "endpoint validation supports fixed-node shapemaps; "
                    "ingest with read_sparql_endpoint for selector maps"
                )
            focus.append((a["node"], a["shape"]))
        g.prefetch([term_key(n) for n, _ in focus], "out")
        v = ShExValidator(compiled, g)
        for node, shape in focus:
            ok = v.validate_node_shape(node, shape)
            rows.append((term_key(node), shape or "START", "conforms" if ok else "notConforms"))
    elif engine == "shacl":
        pairs = _endpoint_targets(transport, compiled)
        g.prefetch([nk for nk, _ in pairs], "out")
        v = ShaclValidator(compiled, g)
        for nk, skey in pairs:
            report_rows = v.validate_shape(nk, skey)
            rows.append((nk, skey, "conforms" if not report_rows else "notConforms"))
    else:
        raise ValueError(f"unknown engine {engine!r}")
    typing = pa.table(
        {
            "node": pa.array([r[0] for r in rows], pa.string()),
            "shape": pa.array([r[1] for r in rows], pa.string()),
            "val": pa.array([r[2] for r in rows], pa.string()),
            "is_focus": pa.array([True] * len(rows), pa.bool_()),
        }
    )
    return typing, _summary(typing)
