"""Live-ish transport coverage for S2 (URL reader) and S3 (SPARQL
endpoint): a REAL stdlib HTTP server on the loopback interface, driven
through the production ``UrllibTransport`` / ``HttpSparqlTransport``
classes — status codes, Content-Type negotiation, redirects, URL
encoding and pagination all go over an actual socket instead of the
exact-template mocks (reference behavior: Main.scala:253-262 --dataUrl,
Main.scala:280-282 --schemaUrl, Main.scala:268-269 --endpoint)."""

import json
import threading
import urllib.error
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from shaclex_ray.sources.sparql import (
    HttpSparqlTransport,
    MockSparqlTransport,
    read_sparql_endpoint,
)
from shaclex_ray.sources.url_source import (
    UrllibTransport,
    fetch_schema_text,
    read_rdf_url,
)
from shaclex_ray.terms import iri, literal

EX = "http://e/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

NT_BODY = (
    f"<{EX}alice> <{RDF_TYPE}> <{EX}Person> .\n"
    f'<{EX}alice> <{EX}name> "Alice" .\n'
    f"<{EX}bob> <{RDF_TYPE}> <{EX}Person> .\n"
)

TTL_BODY = f"""@prefix ex: <{EX}> .
ex:carol ex:knows ex:alice ;
         ex:name "Carol" .
"""

SHEX_BODY = f"""PREFIX ex: <{EX}>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
ex:PersonShape {{ ex:name xsd:string }}
"""

TRIPLES = [
    (iri(EX + "alice"), RDF_TYPE, iri(EX + "Person")),
    (iri(EX + "alice"), EX + "name", literal("Alice")),
    (iri(EX + "alice"), EX + "age", literal("30", XSD_INT)),
    (iri(EX + "bob"), RDF_TYPE, iri(EX + "Person")),
    (iri(EX + "bob"), EX + "name", literal("Bob")),
    (iri(EX + "carol"), EX + "knows", iri(EX + "alice")),
]

# the server-side SPARQL evaluator: same template semantics as the mock,
# but here it sits BEHIND a real HTTP hop instead of replacing it
_SPARQL_EVAL = MockSparqlTransport(TRIPLES)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, body: bytes, ctype: str | None = None):
        self.send_response(code)
        if ctype:
            self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/data.nt":
            self._send(200, NT_BODY.encode(), "application/n-triples")
        elif parsed.path == "/graph":
            # NO extension: format must come from the Content-Type header
            self._send(200, TTL_BODY.encode(), "text/turtle; charset=utf-8")
        elif parsed.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/data.nt")
            self.end_headers()
        elif parsed.path == "/schema.shex":
            self._send(200, SHEX_BODY.encode(), "text/shex")
        elif parsed.path == "/sparql":
            q = urllib.parse.parse_qs(parsed.query).get("query", [""])[0]
            try:
                bindings = _SPARQL_EVAL.select(q)
            except ValueError:
                self._send(400, b"bad query")
                return
            payload = json.dumps({"results": {"bindings": bindings}})
            self._send(200, payload.encode(), "application/sparql-results+json")
        else:
            self._send(404, b"not found")


@pytest.fixture(scope="module")
def base_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_read_rdf_url_ntriples_over_http(ray_session, base_url):
    ds = read_rdf_url(f"{base_url}/data.nt", transport=UrllibTransport())
    rows = ds.take_all()
    assert len(rows) == 3
    assert {r["pred"] for r in rows} == {RDF_TYPE, EX + "name"}


def test_read_rdf_url_content_type_negotiation(ray_session, base_url):
    # extensionless URL: turtle must be negotiated from Content-Type
    # (including the ;charset parameter the mock never exercised)
    ds = read_rdf_url(f"{base_url}/graph", transport=UrllibTransport())
    rows = ds.take_all()
    assert len(rows) == 2
    assert {r["pred"] for r in rows} == {EX + "knows", EX + "name"}


def test_read_rdf_url_follows_redirect(ray_session, base_url):
    # urllib follows 302; format negotiation sees the REQUEST url (no
    # .nt extension), so the final Content-Type must drive the parse
    ds = read_rdf_url(f"{base_url}/redirect", transport=UrllibTransport())
    assert len(ds.take_all()) == 3


def test_fetch_schema_text_and_404(base_url):
    assert fetch_schema_text(
        f"{base_url}/schema.shex", transport=UrllibTransport()
    ) == SHEX_BODY
    with pytest.raises(urllib.error.HTTPError):
        fetch_schema_text(f"{base_url}/missing.shex", transport=UrllibTransport())


def test_sparql_endpoint_over_http(ray_session, base_url):
    url = f"{base_url}/sparql"
    ds = read_sparql_endpoint(lambda: HttpSparqlTransport(url), page_size=2)
    rows = ds.take_all()
    # 6 triples over 3 ORDER BY pages, each page a separate HTTP GET from
    # a Ray actor process — URL encoding of the query param included
    assert len(rows) == len(TRIPLES)
    assert {(r["subj"], r["pred"]) for r in rows} == {
        (s[1], p) for s, p, _ in TRIPLES
    }
