"""Turtle / N-Triples parser (driver-side).

The reference delegates RDF parsing to Apache Jena
(weso/shaclex src/main/scala/es/weso/shaclex/Main.scala:253-274, formats in
modules/schema/src/main/scala/es/weso/schema/DataFormats.scala:8-29). We need
a self-contained parser to load the vendored W3C conformance fixtures
(src/test/resources/shacl/tests/**/*.ttl, shexTest/validation/*.ttl) and to
ingest N-Triples / Turtle files as triple Datasets.

Covers the Turtle 1.1 grammar subset used by those corpora: prefixes/base
(@ and SPARQL style), prefixed names with local escapes, IRI refs with
\\uXXXX escapes, a/;/, syntax, blank node property lists, collections,
all four string quote forms, @lang, ^^datatype, numeric and boolean
abbreviations, comments. N-Triples is a subset, so the same entry point
parses both.

Output: list of (subj, pred, obj) with terms in the shaclex_ray.terms tuple
model; predicate is a plain IRI string.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from shaclex_ray.terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)


class TurtleError(ValueError):
    pass


_STRING_ESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

# token regexes, ordered
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r\n]+)
  | (?P<comment>\#[^\n]*)
  | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<str_long_dq>\"\"\"(?:[^"\\]|\\.|\"(?!\"\")|\"\"(?!\"))*\"\"\")
  | (?P<str_long_sq>'''(?:[^'\\]|\\.|'(?!'')|''(?!'))*''')
  | (?P<str_dq>"(?:[^"\\\n\r]|\\.)*")
  | (?P<str_sq>'(?:[^'\\\n\r]|\\.)*')
  | (?P<prefix_decl>@prefix\b)
  | (?P<base_decl>@base\b)
  | (?P<sparql_prefix>(?i:PREFIX)\b)
  | (?P<sparql_base>(?i:BASE)\b)
  | (?P<bnode>_:[^\s;,.)\]]+)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<decimal>[+-]?\d*\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<punct>\^\^|[;,.\[\](){}])
  | (?P<pname>(?:[^\s'"<>;,()\[\]#^@]|\\[~.\-!$&'()*+,;=/?\#@%_])*:(?:(?:[^\s'"<>;,()\[\]#^]|\\[~.\-!$&'()*+,;=/?\#@%_]|%[0-9A-Fa-f]{2})*)?)
  | (?P<keyword>[a-zA-Z][a-zA-Z0-9_]*)
    """,
    re.VERBOSE,
)

_UESC_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")
_LOCAL_ESC_RE = re.compile(r"\\([~.\-!$&'()*+,;=/?#@%_])")


def _unescape_unicode(s: str) -> str:
    def rep(m):
        h = m.group(1) or m.group(2)
        return chr(int(h, 16))

    return _UESC_RE.sub(rep, s)


def _unescape_string(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < n:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 9 < n:
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            if nxt in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[nxt])
                i += 2
                continue
            raise TurtleError(f"bad escape \\{nxt}")
        out.append(c)
        i += 1
    return "".join(out)


class _Tokens:
    __slots__ = ("toks", "pos")

    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        n = len(text)
        while pos < n:
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                raise TurtleError(f"lex error at {text[pos:pos+40]!r}")
            kind = m.lastgroup
            if kind not in ("ws", "comment"):
                self.toks.append((kind, m.group()))
            pos = m.end()
        self.pos = 0

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.pos += 1
        return t

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise TurtleError(f"expected {value!r}, got {v!r}")


class TurtleParser:
    def __init__(self, text: str, base: str = "", bnode_prefix: str = ""):
        self.toks = _Tokens(text)
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple] = []
        self._bn = 0
        self._bnode_prefix = bnode_prefix

    # -- helpers -----------------------------------------------------------
    def _fresh_bnode(self) -> tuple:
        self._bn += 1
        return ("bnode", f"{self._bnode_prefix}gen{self._bn}")

    def _resolve(self, iri_str: str) -> str:
        if not self.base:
            return iri_str
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri_str):
            return iri_str  # already absolute
        if iri_str == "":
            return self.base.split("#", 1)[0]
        if iri_str.startswith("#"):
            return self.base.split("#", 1)[0] + iri_str
        resolved = urljoin(self.base, iri_str, allow_fragments=True)
        if resolved == iri_str:
            # urljoin refused (non-hierarchical scheme, e.g. urn:) — resolve
            # against the base's last path segment manually
            stem = self.base.split("#", 1)[0]
            if iri_str.startswith("?"):
                return stem.split("?", 1)[0] + iri_str
            cut = stem.rfind("/")
            prefix = stem[: cut + 1] if cut >= 0 else stem.split(":", 1)[0] + ":"
            return prefix + iri_str
        return resolved

    def _pname_to_iri(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise TurtleError(f"undefined prefix {pfx!r}:")
        local = _LOCAL_ESC_RE.sub(r"\1", local)
        return self.prefixes[pfx] + local

    # -- grammar -----------------------------------------------------------
    def parse(self) -> list[tuple]:
        while True:
            kind, v = self.toks.peek()
            if kind is None:
                break
            if kind == "prefix_decl":
                self.toks.next()
                self._prefix_body(dotted=True)
            elif kind == "base_decl":
                self.toks.next()
                self._base_body(dotted=True)
            elif kind == "sparql_prefix":
                self.toks.next()
                self._prefix_body(dotted=False)
            elif kind == "sparql_base":
                self.toks.next()
                self._base_body(dotted=False)
            elif kind == "keyword" and v.upper() == "GRAPH":
                # TriG: GRAPH <label> { ... } — graphs flatten into the
                # one triple set (union-graph reading; the validators see
                # a single RDF graph, like the reference's merged model)
                self.toks.next()
                self._subject()  # graph label (iri/bnode) — discarded
                self._graph_block()
            elif v == "{":
                self._graph_block()  # TriG default-graph block
            else:
                self._triples_block()
        return self.triples

    def _prefix_body(self, dotted: bool):
        kind, v = self.toks.next()
        if kind != "pname" or not v.endswith(":"):
            raise TurtleError(f"bad prefix name {v!r}")
        pfx = v[:-1]
        kind, iri_tok = self.toks.next()
        if kind != "iriref":
            raise TurtleError(f"bad prefix IRI {iri_tok!r}")
        self.prefixes[pfx] = self._resolve(_unescape_unicode(iri_tok[1:-1]))
        if dotted and self.toks.peek()[1] == ".":
            self.toks.next()  # trailing dot (lenient: some corpora omit it)

    def _base_body(self, dotted: bool):
        kind, iri_tok = self.toks.next()
        if kind != "iriref":
            raise TurtleError(f"bad base IRI {iri_tok!r}")
        self.base = self._resolve(_unescape_unicode(iri_tok[1:-1]))
        if dotted and self.toks.peek()[1] == ".":
            self.toks.next()

    def _triples_block(self):
        kind, v = self.toks.peek()
        if v == "[":
            subj = self._bnode_property_list()
            kind, v = self.toks.peek()
            if v != ".":
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            if self.toks.peek()[1] == "{":  # TriG: <label> { ... }
                self._graph_block()
                return
            self._predicate_object_list(subj)
        self.toks.expect(".")

    def _graph_block(self):
        """TriG graph content: Turtle triple statements inside { } with an
        optional trailing dot on the last one."""
        self.toks.expect("{")
        while self.toks.peek()[1] != "}":
            kind, v = self.toks.peek()
            if v == "[":
                subj = self._bnode_property_list()
                if self.toks.peek()[1] not in (".", "}"):
                    self._predicate_object_list(subj)
            else:
                subj = self._subject()
                self._predicate_object_list(subj)
            if self.toks.peek()[1] == ".":
                self.toks.next()
        self.toks.expect("}")

    def _subject(self) -> tuple:
        kind, v = self.toks.next()
        if kind == "iriref":
            return ("iri", self._resolve(_unescape_unicode(v[1:-1])))
        if kind == "pname":
            return ("iri", self._pname_to_iri(v))
        if kind == "bnode":
            return ("bnode", self._bnode_prefix + v[2:])
        if v == "(":
            return self._collection()
        raise TurtleError(f"bad subject {v!r}")

    def _predicate(self) -> str:
        kind, v = self.toks.next()
        if kind == "iriref":
            return self._resolve(_unescape_unicode(v[1:-1]))
        if kind == "pname":
            return self._pname_to_iri(v)
        if kind == "keyword" and v == "a":
            return RDF_TYPE
        raise TurtleError(f"bad predicate {v!r}")

    def _predicate_object_list(self, subj: tuple):
        while True:
            kind, v = self.toks.peek()
            if v == ";":  # tolerate stray / repeated semicolons
                self.toks.next()
                continue
            if v in (".", "]", None):
                break
            pred = self._predicate()
            while True:
                obj = self._object()
                self.triples.append((subj, pred, obj))
                kind, v = self.toks.peek()
                if v == ",":
                    self.toks.next()
                    continue
                break
            kind, v = self.toks.peek()
            if v == ";":
                self.toks.next()
                continue
            break

    def _object(self) -> tuple:
        kind, v = self.toks.peek()
        if v == "[":
            return self._bnode_property_list()
        if v == "(":
            self.toks.next()
            return self._collection()
        kind, v = self.toks.next()
        if kind == "iriref":
            return ("iri", self._resolve(_unescape_unicode(v[1:-1])))
        if kind == "pname":
            return ("iri", self._pname_to_iri(v))
        if kind == "bnode":
            return ("bnode", self._bnode_prefix + v[2:])
        if kind in ("str_dq", "str_sq", "str_long_dq", "str_long_sq"):
            if kind.startswith("str_long"):
                lex = _unescape_string(v[3:-3])
            else:
                lex = _unescape_string(v[1:-1])
            nkind, nv = self.toks.peek()
            if nkind == "langtag":
                self.toks.next()
                return ("lit", lex, "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", nv[1:].lower())
            if nv == "^^":
                self.toks.next()
                dt = self._predicate()  # IRI or pname
                return ("lit", lex, dt, "")
            return ("lit", lex, XSD_STRING, "")
        if kind == "integer":
            return ("lit", v, XSD_INTEGER, "")
        if kind == "decimal":
            return ("lit", v, XSD_DECIMAL, "")
        if kind == "double":
            return ("lit", v, XSD_DOUBLE, "")
        if kind == "keyword" and v in ("true", "false"):
            return ("lit", v, XSD_BOOLEAN, "")
        raise TurtleError(f"bad object {v!r}")

    def _bnode_property_list(self) -> tuple:
        self.toks.expect("[")
        kind, v = self.toks.peek()
        node = self._fresh_bnode()
        if v != "]":
            self._predicate_object_list(node)
        self.toks.expect("]")
        return node

    def _collection(self) -> tuple:
        # '(' already consumed
        items = []
        while True:
            kind, v = self.toks.peek()
            if v == ")":
                self.toks.next()
                break
            items.append(self._object())
        if not items:
            return ("iri", RDF_NIL)
        head = self._fresh_bnode()
        cur = head
        for i, item in enumerate(items):
            self.triples.append((cur, RDF_FIRST, item))
            if i == len(items) - 1:
                self.triples.append((cur, RDF_REST, ("iri", RDF_NIL)))
            else:
                nxt = self._fresh_bnode()
                self.triples.append((cur, RDF_REST, nxt))
                cur = nxt
        return head


def parse_turtle(
    text: str, base: str = "", bnode_prefix: str = ""
) -> list[tuple]:
    """Parse Turtle (or N-Triples) text -> list of (s, p, o) term triples.

    ``bnode_prefix`` scopes blank-node ids (graph/doc scoping; reference
    semantics pin bnodes as graph-scoped — SURVEY.md O6).
    """
    return TurtleParser(text, base=base, bnode_prefix=bnode_prefix).parse()
