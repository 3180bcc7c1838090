"""URL readers (SURVEY.md S2; reference Main.scala:253-262 ``--dataUrl``
dereferences RDF data from a URI, Main.scala:280-282 ``--schemaUrl``
fetches schema text).

The transport is pluggable, same contract as ``sources/sparql.py``:
``UrllibTransport`` does real HTTP(S) (network-gated — this sandbox has
none), ``file://`` URLs and bare paths read locally with no transport at
all, and tests inject ``MockUrlTransport`` so the full format-negotiation
and parse plumbing runs offline.

Scale note: a URL is a single remote document, so the FETCH is one pass
by nature. Parsing still parallelizes where the grammar allows it —
N-Triples payloads (the only line-splittable RDF format) are chunked on
line boundaries and parsed in distributed ``map_batches`` tasks; the
whole-document grammars (Turtle/TriG/RDF-XML/JSON-LD/RDF-JSON) parse
once on the driver, exactly the reference's behavior (one Jena model per
URI). Bulk multi-file corpora belong to ``read_parquet`` /
``read_ntriples`` with pyarrow-fs URIs, not this reader.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from shaclex_ray.sources.rdf_source import parse_rdf_text
from shaclex_ray.terms import triples_to_table

# ------------------------------------------------------------ transports


class UrllibTransport:
    """Real HTTP(S) fetch via urllib. Network-gated: this sandbox has no
    network, so the class is exercised only through its mock twin; the
    code path is the one a cluster with egress would run."""

    def __init__(self, timeout: float = 30.0, accept: str | None = None):
        self.timeout = timeout
        self.accept = accept or (
            "application/n-triples, text/turtle, application/rdf+xml, "
            "application/ld+json;q=0.9, */*;q=0.1"
        )

    def __call__(self, url: str) -> tuple[str, str | None]:
        import urllib.request

        req = urllib.request.Request(url, headers={"Accept": self.accept})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            ctype = resp.headers.get("Content-Type")
            return resp.read().decode("utf-8"), ctype


class MockUrlTransport:
    """Offline transport: answers from a {url: (text, content_type)} map."""

    def __init__(self, pages: dict):
        self.pages = dict(pages)
        self.calls = []

    def __call__(self, url: str) -> tuple[str, str | None]:
        self.calls.append(url)
        if url not in self.pages:
            raise FileNotFoundError(url)
        val = self.pages[url]
        return val if isinstance(val, tuple) else (val, None)


def fetch_url(url: str, transport=None) -> tuple[str, str | None]:
    """Fetch ``url`` → (text, content_type|None). ``file://`` URLs and
    bare paths read locally; remote schemes go through ``transport``."""
    if url.startswith("file://"):
        with open(url[len("file://") :]) as f:
            return f.read(), None
    if "://" not in url:
        with open(url) as f:
            return f.read(), None
    if transport is None:
        transport = UrllibTransport()
    return transport(url)


# ------------------------------------------------------- format negotiation

_CTYPE_FMT = {
    "application/n-triples": "ntriples",
    "text/turtle": "turtle",
    "application/turtle": "turtle",
    "application/x-turtle": "turtle",
    "application/trig": "turtle",  # TriG ⊆ the Turtle parser's grammar
    "application/rdf+xml": "rdfxml",
    "application/xml": "rdfxml",
    "text/xml": "rdfxml",
    "application/ld+json": "jsonld",
}

_EXT_FMT = {
    ".nt": "ntriples",
    ".ttl": "turtle",
    ".trig": "turtle",
    ".rdf": "rdfxml",
    ".xml": "rdfxml",
    ".owl": "rdfxml",
    ".jsonld": "jsonld",
}


def _negotiate_format(url: str, content_type: str | None, fmt: str | None):
    """Explicit fmt > Content-Type > URL extension > content sniff (None)."""
    if fmt:
        return fmt
    if content_type:
        base = content_type.split(";")[0].strip().lower()
        if base in _CTYPE_FMT:
            return _CTYPE_FMT[base]
    path = url.split("?")[0].split("#")[0]
    for ext, f in _EXT_FMT.items():
        if path.endswith(ext):
            return f
    return None  # parse_rdf_text sniffs


# ---------------------------------------------------------------- readers

_NT_CHUNK_LINES = 50_000


def read_rdf_url(
    url: str,
    fmt: str | None = None,
    transport=None,
    base: str | None = None,
) -> "ray.data.Dataset":
    """Dereference an RDF document URL → triples Dataset (TRIPLES_SCHEMA).

    N-Triples payloads split on line boundaries into ``_NT_CHUNK_LINES``
    chunks parsed in parallel tasks; whole-document grammars parse on the
    driver (they need document-global prefix/id state)."""
    text, ctype = fetch_url(url, transport=transport)
    f = _negotiate_format(url, ctype, fmt)
    base = base if base is not None else url
    bnode_prefix = url + "#"
    if f == "ntriples":
        lines = text.splitlines()
        chunks = [
            {"text": "\n".join(lines[i : i + _NT_CHUNK_LINES])}
            for i in range(0, max(len(lines), 1), _NT_CHUNK_LINES)
        ]

        def parse_chunk(batch: pa.Table) -> pa.Table:
            joined = "\n".join(batch.column("text").to_pylist())
            return triples_to_table(parse_rdf_text(joined, fmt="turtle"))

        return ray.data.from_items(chunks).map_batches(
            parse_chunk, batch_format="pyarrow"
        )
    triples = parse_rdf_text(text, fmt=f, base=base, bnode_prefix=bnode_prefix)
    return ray.data.from_arrow(triples_to_table(triples))


def fetch_schema_text(url: str, transport=None) -> str:
    """Schema text from a URL (``--schemaUrl``; Main.scala:280-282 reads
    the URL body as a string and hands it to the schema parser)."""
    text, _ctype = fetch_url(url, transport=transport)
    return text
