"""URL reader (S2): format negotiation (Content-Type > extension >
sniff), parallel N-Triples chunking, file:// local lane, and the CLI
--data-url / --schema-url flags — all offline via MockUrlTransport
(UrllibTransport's real-HTTP lane is network-gated)."""

import pyarrow as pa

from shaclex_ray.sources.url_source import (
    MockUrlTransport,
    _negotiate_format,
    fetch_schema_text,
    fetch_url,
    read_rdf_url,
)

TTL = """@prefix ex: <http://e/> .
ex:alice a ex:Person ; ex:name "Alice" .
ex:bob a ex:Person .
"""

NT = (
    '<http://e/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/Person> .\n'
    '<http://e/alice> <http://e/name> "Alice" .\n'
    '<http://e/bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/Person> .\n'
)

RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="http://e/">
  <rdf:Description rdf:about="http://e/alice">
    <rdf:type rdf:resource="http://e/Person"/>
    <ex:name>Alice</ex:name>
  </rdf:Description>
</rdf:RDF>
"""


def _rows(ds):
    tbl = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.iter_batches(batch_format="pyarrow")
    )
    return set(zip(tbl.column("subj").to_pylist(), tbl.column("pred").to_pylist()))


def test_negotiate_format_precedence():
    # explicit fmt wins over everything
    assert _negotiate_format("http://x/d.nt", "text/turtle", "rdfxml") == "rdfxml"
    # content-type over extension
    assert _negotiate_format("http://x/d.nt", "text/turtle; charset=utf-8", None) == "turtle"
    assert _negotiate_format("http://x/d", "application/n-triples", None) == "ntriples"
    # extension when no content-type
    assert _negotiate_format("http://x/d.rdf?v=1", None, None) == "rdfxml"
    # nothing known -> sniff downstream
    assert _negotiate_format("http://x/d", "text/plain", None) is None


def test_read_turtle_url(ray_session):
    t = MockUrlTransport({"http://host/d.ttl": (TTL, "text/turtle")})
    ds = read_rdf_url("http://host/d.ttl", transport=t)
    rows = _rows(ds)
    assert ("http://e/alice", "http://e/name") in rows
    assert t.calls == ["http://host/d.ttl"]


def test_read_ntriples_url_parallel_chunks(ray_session):
    # force >1 chunk to exercise the parallel lane
    import shaclex_ray.sources.url_source as mod

    old = mod._NT_CHUNK_LINES
    mod._NT_CHUNK_LINES = 2
    try:
        t = MockUrlTransport({"http://host/d.nt": (NT, "application/n-triples")})
        ds = read_rdf_url("http://host/d.nt", transport=t)
        tbl = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in ds.iter_batches(batch_format="pyarrow")
        )
        assert tbl.num_rows == 3
    finally:
        mod._NT_CHUNK_LINES = old


def test_read_rdfxml_by_sniff(ray_session):
    # no content-type, no helpful extension -> parse_rdf_text sniffs <?xml
    t = MockUrlTransport({"http://host/data": (RDFXML, None)})
    rows = _rows(read_rdf_url("http://host/data", transport=t))
    assert ("http://e/alice", "http://e/name") in rows


def test_file_url_and_bare_path(tmp_path):
    p = tmp_path / "d.ttl"
    p.write_text(TTL)
    text, ctype = fetch_url("file://" + str(p))
    assert "ex:alice" in text and ctype is None
    text2, _ = fetch_url(str(p))
    assert text2 == text


def test_fetch_schema_text():
    t = MockUrlTransport({"http://host/s.shex": ("<S> { <p> . }", None)})
    assert fetch_schema_text("http://host/s.shex", transport=t) == "<S> { <p> . }"


def test_cli_data_url_file_scheme(tmp_path, capsys, ray_session):
    """End-to-end through the CLI: --data-url file://... + --schema-url."""
    from shaclex_ray.__main__ import main

    data = tmp_path / "d.ttl"
    data.write_text(
        "@prefix ex: <http://e/> .\n"
        'ex:good ex:name "x" .\n'
        "ex:bad ex:other ex:good .\n"
    )
    schema = tmp_path / "s.shex"
    schema.write_text(
        "PREFIX ex: <http://e/>\n"
        "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"
        "ex:S { ex:name xsd:string }\n"
    )
    main(
        [
            "validate",
            "--data-url",
            "file://" + str(data),
            "--engine",
            "shex",
            "--schema-url",
            "file://" + str(schema),
            "--shapemap",
            "<http://e/good>@<http://e/S>, <http://e/bad>@<http://e/S>",
        ]
    )
    out = capsys.readouterr().out
    assert "OK <http://e/good>" in out
    assert "FAIL <http://e/bad>" in out
