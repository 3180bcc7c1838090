"""SPARQL endpoint source (S3): bulk paginated ingest and lazy per-focus
endpoint validation, both through MockSparqlTransport (the sandbox has
no network; the mock answers the exact templates the module emits, so
query generation + SPARQL-JSON parsing are fully exercised)."""

import pyarrow as pa

from shaclex_ray.sources.sparql import (
    EndpointGraph,
    MockSparqlTransport,
    read_sparql_endpoint,
    validate_endpoint,
)
from shaclex_ray.terms import iri, literal, term_key

EX = "http://e/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TRIPLES = [
    (iri(EX + "alice"), RDF_TYPE, iri(EX + "Person")),
    (iri(EX + "alice"), EX + "name", literal("Alice")),
    (iri(EX + "alice"), EX + "age", literal("30", XSD_INT)),
    (iri(EX + "bob"), RDF_TYPE, iri(EX + "Person")),
    (iri(EX + "bob"), EX + "name", literal("Bob")),
    # bob has no age -> minCount violation / ShEx notConforms
    (iri(EX + "carol"), EX + "knows", iri(EX + "alice")),
]


def test_bulk_read_paginates(ray_session):
    t = MockSparqlTransport(TRIPLES)
    ds = read_sparql_endpoint(lambda: MockSparqlTransport(TRIPLES), page_size=2)
    tbl = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    )
    assert tbl.num_rows == len(TRIPLES)
    # every triple present exactly once despite 3 separate pages
    assert len(set(zip(tbl.column("subj").to_pylist(), tbl.column("pred").to_pylist(),
                       tbl.column("obj_lex").to_pylist()))) == len(TRIPLES)
    assert tbl.schema.names[:2] == ["subj", "pred"]


def test_endpoint_graph_lazy_and_cached():
    t = MockSparqlTransport(TRIPLES)
    g = EndpointGraph(t)
    k = term_key(iri(EX + "alice"))
    out = g.arcs_out(k)
    assert sorted(p for p, _ in out) == sorted([RDF_TYPE, EX + "age", EX + "name"])
    n_queries = len(t.queries)
    g.arcs_out(k)  # cached — no new query
    assert len(t.queries) == n_queries
    # inbound arcs
    arcs_in = g.arcs_in(k)
    assert arcs_in == [(EX + "knows", iri(EX + "carol"))]
    # bnodes are not remotely addressable
    assert g.arcs_out("Bx") == []


def test_validate_endpoint_shex():
    shex = f"""
    PREFIX ex: <{EX}>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    ex:PersonShape {{ ex:name xsd:string ; ex:age xsd:integer }}
    """
    t = MockSparqlTransport(TRIPLES)
    typing, summary = validate_endpoint(
        t, "shex", shex,
        shapemap=f"<{EX}alice>@<{EX}PersonShape>, <{EX}bob>@<{EX}PersonShape>",
    )
    vals = dict(zip(typing.column("node").to_pylist(), typing.column("val").to_pylist()))
    assert vals[f"I{EX}alice"] == "conforms"
    assert vals[f"I{EX}bob"] == "notConforms"
    assert summary["conformant"] == 1 and summary["nonconformant"] == 1


def test_validate_endpoint_shacl():
    ttl = f"""
    @prefix sh: <http://www.w3.org/ns/shacl#> .
    @prefix ex: <{EX}> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:PersonShape a sh:NodeShape ;
      sh:targetClass ex:Person ;
      sh:property [ sh:path ex:age ; sh:minCount 1 ; sh:datatype xsd:integer ] .
    """
    t = MockSparqlTransport(TRIPLES)
    typing, summary = validate_endpoint(t, "shacl", ttl)
    vals = dict(zip(typing.column("node").to_pylist(), typing.column("val").to_pylist()))
    assert vals[f"I{EX}alice"] == "conforms"
    assert vals[f"I{EX}bob"] == "notConforms"
    assert summary["focus_pairs"] == 2
