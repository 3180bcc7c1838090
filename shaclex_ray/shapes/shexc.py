"""ShExC (compact syntax) parser → the engine's ShExJ-dict schema IR.

The reference parses ShExC via es.weso.shex (dispatched from
modules/schema/src/main/scala/es/weso/schema/Schemas.scala:58-76); we parse
the ShExC 2.1 subset exercised by the reference's examples and the shexTest
schemas: prefixes/base, start, shape declarations, AND/OR/NOT, node
constraints (kinds, datatypes, facets, value sets with stems/ranges),
shapes with EachOf(;)/OneOf(|), cardinalities (? * + {m} {m,n} {m,}),
inverse (^), EXTRA, CLOSED, shape refs (@), triple-expr labels ($) and
inclusions (&), annotations (//) and semantic actions (%...%, ignored).

Output is byte-compatible with shapes/shexj.load_shexj normalization, so
the same validators consume it.
"""

from __future__ import annotations

import re

from shaclex_ray.terms import RDF_TYPE, XSD_BOOLEAN, XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iriref><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<str_long_dq>\"\"\"(?:[^"\\]|\\.|\"(?!\"\")|\"\"(?!\"))*\"\"\")
  | (?P<str_dq>"(?:[^"\\\n\r]|\\.)*")
  | (?P<str_sq>'(?:[^'\\\n\r]|\\.)*')
  | (?P<regex>/(?:[^/\\\n\r]|\\.)+/[smix]*)
  | (?P<code>%(?:<[^<>]*>|[a-zA-Z_][\w.\-]*:?[\w.\-]*)(?:\{(?:[^%\\]|\\.)*%\}|%))
  | (?P<bnode>_:[A-Za-z0-9_.\-]+)
  | (?P<langstem_empty>@~)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*(?:~)?(?![\w:]))
  | (?P<atref>@(?:<[^<>]*>|[A-Za-z_][\w.\-]*:[\w.\-]*|:[\w.\-]*|_:[A-Za-z0-9_.\-]+))
  | (?P<teref>[$&](?:<[^<>]*>|[A-Za-z_][\w.\-]*:[\w.\-]*|:[\w.\-]*|_:[A-Za-z0-9_.\-]+))
  | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+))
  | (?P<decimal>[+-]?\d*\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<repeat>\{\d+(?:,(?:\d+|\*)?)?\})
  | (?P<punct>\^\^|//|[{}()\[\];|.,^~\-=?*+])
  | (?P<pname>[A-Za-z_][\w.\-]*:[\w.\-]*|:[\w.\-]*|[A-Za-z_][\w.\-]*:)
  | (?P<keyword>[A-Za-z]+)
    """,
    re.VERBOSE,
)

_UESC_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")
_KEYWORDS = {
    "prefix", "base", "import", "start", "external", "abstract",
    "and", "or", "not", "closed", "extra", "literal", "iri", "bnode",
    "nonliteral", "length", "minlength", "maxlength", "mininclusive",
    "minexclusive", "maxinclusive", "maxexclusive", "totaldigits",
    "fractiondigits", "true", "false", "a",
}


def _unesc(s: str) -> str:
    from shaclex_ray.rdfio.turtle import _unescape_string

    return _unescape_string(s)


class ShExCError(ValueError):
    pass


class _Toks:
    def __init__(self, text: str):
        self.toks = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                raise ShExCError(f"lex error at {text[pos:pos+40]!r}")
            if m.lastgroup not in ("ws", "comment"):
                self.toks.append((m.lastgroup, m.group()))
            pos = m.end()
        self.i = 0

    def peek(self, ahead=0):
        j = self.i + ahead
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ShExCError(f"expected {val!r} got {v!r} (at tok {self.i})")


class ShExCParser:
    def __init__(self, text: str, base: str = ""):
        self.t = _Toks(text)
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.shapes: list[dict] = []
        self.start = None
        self.start_acts: list[dict] = []

    # ---------------- terminals
    def _resolve(self, iri: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri) or not self.base:
            return iri
        from urllib.parse import urljoin

        if iri.startswith("#"):
            return self.base.split("#", 1)[0] + iri
        return urljoin(self.base, iri)

    def _pname(self, v: str) -> str:
        pfx, _, local = v.partition(":")
        if pfx not in self.prefixes:
            raise ShExCError(f"undefined prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def _iri_or_pname(self) -> str:
        k, v = self.t.next()
        if k == "iriref":
            return self._resolve(_UESC_RE.sub(lambda m: chr(int(m.group(1) or m.group(2), 16)), v[1:-1]))
        if k == "pname":
            return self._pname(v)
        if k == "keyword" and v == "a":
            return RDF_TYPE
        raise ShExCError(f"expected IRI, got {v!r}")

    def _label_from(self, v: str) -> str:
        body = v[1:]
        if body.startswith("<"):
            return self._resolve(body[1:-1])
        if body.startswith("_:"):
            return body
        return self._pname(body)

    # ---------------- schema
    def parse(self) -> dict:
        while True:
            k, v = self.t.peek()
            if k is None:
                break
            lv = v.lower() if isinstance(v, str) else v
            if k == "keyword" and lv == "prefix":
                self.t.next()
                _, pn = self.t.next()
                pfx = pn[:-1] if pn.endswith(":") else pn.split(":")[0]
                _, iri = self.t.next()
                self.prefixes[pfx] = self._resolve(iri[1:-1])
            elif k == "keyword" and lv == "base":
                self.t.next()
                _, iri = self.t.next()
                self.base = self._resolve(iri[1:-1])
            elif k == "keyword" and lv == "import":
                self.t.next()
                self.t.next()  # imported IRI (unresolved in-sandbox)
            elif k == "keyword" and lv == "start":
                self.t.next()
                self.t.expect("=")
                self.start = self._shape_expr()
            elif k == "keyword" and lv == "abstract":
                self.t.next()
            elif k == "code":
                # top-level semActs = schema startActs
                self.t.next()
                self.start_acts.append(self._parse_semact(v))
            else:
                lbl = self._shape_label()
                k2, v2 = self.t.peek()
                if k2 == "keyword" and v2.lower() == "external":
                    self.t.next()
                    se = {"type": "ShapeExternal"}
                else:
                    se = self._shape_expr()
                if isinstance(se, str):
                    se = {"type": "ShapeAnd", "shapeExprs": [se]}  # ref alias
                se["id"] = lbl
                self.shapes.append(se)
        doc = {"type": "Schema", "shapes": self.shapes}
        if self.start is not None:
            doc["start"] = self.start
        if self.start_acts:
            doc["startActs"] = self.start_acts
        from shaclex_ray.shapes.shexj import load_shexj

        out = load_shexj(doc)
        out["prefixes"] = dict(self.prefixes)  # reused by shapemap parsing
        return out

    def _shape_label(self) -> str:
        k, v = self.t.next()
        if k == "iriref":
            return self._resolve(v[1:-1])
        if k == "pname":
            return self._pname(v)
        if k == "bnode":
            return v
        raise ShExCError(f"bad shape label {v!r}")

    # ---------------- shape expressions (precedence: OR < AND < NOT < atom)
    def _shape_expr(self):
        return self._or_expr()

    def _or_expr(self):
        first = self._and_expr()
        items = [first]
        while True:
            k, v = self.t.peek()
            if k == "keyword" and v.lower() == "or":
                self.t.next()
                items.append(self._and_expr())
            else:
                break
        return items[0] if len(items) == 1 else {"type": "ShapeOr", "shapeExprs": items}

    def _and_expr(self):
        first = self._not_expr()
        items = [first]
        while True:
            k, v = self.t.peek()
            if k == "keyword" and v.lower() == "and":
                self.t.next()
                items.append(self._not_expr())
            else:
                break
        if len(items) == 1:
            return items[0]
        return {"type": "ShapeAnd", "shapeExprs": items}

    def _not_expr(self):
        k, v = self.t.peek()
        if k == "keyword" and v.lower() == "not":
            self.t.next()
            return {"type": "ShapeNot", "shapeExpr": self._not_expr()}
        return self._atom()

    def _atom(self):
        k, v = self.t.peek()
        if v == "(":
            self.t.next()
            inner = self._shape_expr()
            self.t.expect(")")
            return inner
        if k == "atref":
            self.t.next()
            return self._label_from(v)
        if v == "{":
            return self._shape_definition({})
        if v == ".":
            self.t.next()
            # '.' = no constraint; combine with trailing facets if present
            nc = {"type": "NodeConstraint"}
            self._facets(nc)
            if len(nc) == 1:
                return {"type": "Shape"} if False else nc
            return nc
        nc = self._node_constraint()
        if nc is not None:
            # a node constraint may be immediately followed by a shape or ref
            k2, v2 = self.t.peek()
            if v2 == "{" or (k2 == "keyword" and v2.lower() in ("closed", "extra")):
                sh = self._shape_definition({})
                return {"type": "ShapeAnd", "shapeExprs": [nc, sh]}
            if k2 == "atref":
                self.t.next()
                return {"type": "ShapeAnd", "shapeExprs": [nc, self._label_from(v2)]}
            return nc
        if k == "keyword" and v.lower() in ("closed", "extra"):
            return self._shape_definition({})
        raise ShExCError(f"bad shape atom {v!r}")

    # ---------------- node constraints
    def _node_constraint(self):
        k, v = self.t.peek()
        nc = {"type": "NodeConstraint"}
        lv = v.lower() if isinstance(v, str) else v
        if k == "keyword" and lv in ("iri", "bnode", "literal", "nonliteral"):
            self.t.next()
            nc["nodeKind"] = lv
            self._facets(nc)
            return nc
        if v == "[":
            nc["values"] = self._value_set()
            self._facets(nc)
            return nc
        if k in ("iriref", "pname") or (k == "keyword" and lv == "a"):
            # datatype IRI
            save = self.t.i
            dt = self._iri_or_pname()
            nc["datatype"] = dt
            self._facets(nc)
            return nc
        if k == "keyword" and lv in (
            "length", "minlength", "maxlength", "mininclusive", "minexclusive",
            "maxinclusive", "maxexclusive", "totaldigits", "fractiondigits",
        ) or k == "regex":
            self._facets(nc)
            return nc if len(nc) > 1 else None
        return None

    def _facets(self, nc: dict):
        while True:
            k, v = self.t.peek()
            lv = v.lower() if isinstance(v, str) else v
            if k == "regex":
                self.t.next()
                body, _, flags = v[1:].rpartition("/")
                nc["pattern"] = re.sub(r"\\/", "/", body)
                if flags:
                    nc["flags"] = flags
            elif k == "keyword" and lv in ("length", "minlength", "maxlength", "totaldigits", "fractiondigits"):
                self.t.next()
                _, n = self.t.next()
                nc[lv] = int(n)
            elif k == "keyword" and lv in ("mininclusive", "minexclusive", "maxinclusive", "maxexclusive"):
                self.t.next()
                nk, nv = self.t.next()
                num = float(nv) if nk in ("double", "decimal") else int(nv)
                nc[lv] = num
            else:
                break

    def _value_set(self) -> list:
        self.t.expect("[")
        values = []
        while True:
            k, v = self.t.peek()
            if v == "]":
                self.t.next()
                break
            values.append(self._value_set_item())
        return values

    def _value_set_item(self):
        k, v = self.t.peek()
        if v == ".":
            # stem-range wildcard: . - exclusions ; family inferred from the
            # first exclusion's kind
            self.t.next()
            exclusions = self._exclusions()
            fam = "IriStemRange"
            if exclusions and isinstance(exclusions[0], dict):
                fam = {
                    "LiteralStem": "LiteralStemRange",
                    "LanguageStem": "LanguageStemRange",
                }.get(exclusions[0].get("type"), "IriStemRange")
                if "value" in exclusions[0]:
                    fam = "LiteralStemRange"
            return {"type": fam, "stem": {"type": "Wildcard"}, "exclusions": exclusions}
        if k in ("iriref", "pname"):
            iri = self._iri_or_pname()
            k2, v2 = self.t.peek()
            if v2 == "~":
                self.t.next()
                exclusions = self._exclusions()
                if exclusions:
                    return {"type": "IriStemRange", "stem": iri, "exclusions": exclusions}
                return {"type": "IriStem", "stem": iri}
            return iri
        if k in ("str_dq", "str_sq", "str_long_dq"):
            self.t.next()
            lex = _unesc(v[3:-3] if k == "str_long_dq" else v[1:-1])
            k2, v2 = self.t.peek()
            if v2 == "~":
                self.t.next()
                exclusions = self._exclusions()
                if exclusions:
                    return {"type": "LiteralStemRange", "stem": lex, "exclusions": exclusions}
                return {"type": "LiteralStem", "stem": lex}
            if k2 == "langtag":
                self.t.next()
                return {"value": lex, "language": v2[1:].lower()}
            if v2 == "^^":
                self.t.next()
                dt = self._iri_or_pname()
                return {"value": lex, "type": dt}
            return {"value": lex}
        if k == "langstem_empty":
            self.t.next()
            exclusions = self._exclusions()
            if exclusions:
                return {"type": "LanguageStemRange", "stem": "", "exclusions": exclusions}
            return {"type": "LanguageStem", "stem": ""}
        if k == "langtag":
            self.t.next()
            tag = v[1:]
            if tag.endswith("~"):
                tag = tag[:-1]
                exclusions = self._exclusions()
                if exclusions:
                    return {"type": "LanguageStemRange", "stem": tag.lower(), "exclusions": exclusions}
                return {"type": "LanguageStem", "stem": tag.lower()}
            return {"type": "Language", "languageTag": tag.lower()}
        if k in ("integer", "decimal", "double"):
            self.t.next()
            dt = {"integer": XSD_INTEGER, "decimal": XSD_DECIMAL, "double": XSD_DOUBLE}[k]
            return {"value": v, "type": dt}
        if k == "keyword" and v in ("true", "false"):
            self.t.next()
            return {"value": v, "type": XSD_BOOLEAN}
        raise ShExCError(f"bad value set item {v!r}")

    def _exclusions(self) -> list:
        out = []
        while True:
            k, v = self.t.peek()
            if v != "-":
                break
            self.t.next()
            k, v = self.t.peek()
            if k in ("iriref", "pname"):
                iri = self._iri_or_pname()
                k2, v2 = self.t.peek()
                if v2 == "~":
                    self.t.next()
                    out.append({"type": "IriStem", "stem": iri})
                else:
                    out.append(iri)
            elif k in ("str_dq", "str_sq"):
                self.t.next()
                lex = _unesc(v[1:-1])
                k2, v2 = self.t.peek()
                if v2 == "~":
                    self.t.next()
                    out.append({"type": "LiteralStem", "stem": lex})
                else:
                    out.append({"value": lex})
            elif k == "langtag":
                self.t.next()
                tag = v[1:]
                if tag.endswith("~"):
                    out.append({"type": "LanguageStem", "stem": tag[:-1].lower()})
                else:
                    out.append(tag.lower())
            else:
                raise ShExCError(f"bad exclusion {v!r}")
        return out

    # ---------------- shapes / triple expressions
    def _shape_definition(self, opts) -> dict:
        sh: dict = {"type": "Shape"}
        while True:
            k, v = self.t.peek()
            lv = v.lower() if isinstance(v, str) else v
            if k == "keyword" and lv == "closed":
                self.t.next()
                sh["closed"] = True
            elif k == "keyword" and lv == "extra":
                self.t.next()
                extra = []
                while True:
                    k2, v2 = self.t.peek()
                    if k2 in ("iriref", "pname") or (k2 == "keyword" and v2 == "a"):
                        extra.append(self._iri_or_pname())
                    else:
                        break
                sh["extra"] = sh.get("extra", []) + extra
            else:
                break
        self.t.expect("{")
        k, v = self.t.peek()
        if v != "}":
            sh["expression"] = self._one_of()
        self.t.expect("}")
        self._annotations_semacts(sh)
        return sh

    def _one_of(self):
        items = [self._each_of()]
        while True:
            k, v = self.t.peek()
            if v == "|":
                self.t.next()
                items.append(self._each_of())
            else:
                break
        return items[0] if len(items) == 1 else {"type": "OneOf", "expressions": items}

    def _each_of(self):
        items = [self._unary_te()]
        while True:
            k, v = self.t.peek()
            if v == ";":
                self.t.next()
                k2, v2 = self.t.peek()
                if v2 in ("}", ")", "|", None):
                    break
                items.append(self._unary_te())
            else:
                break
        return items[0] if len(items) == 1 else {"type": "EachOf", "expressions": items}

    def _unary_te(self):
        label = None
        k, v = self.t.peek()
        if k == "teref" and v.startswith("$"):
            self.t.next()
            label = self._label_from(v)
        k, v = self.t.peek()
        if k == "teref" and v.startswith("&"):
            self.t.next()
            return self._label_from(v)  # Inclusion = te ref string
        if v == "(":
            self.t.next()
            te = self._one_of()
            self.t.expect(")")
            te = self._apply_card(te)
            if label:
                te["id"] = label
            self._annotations_semacts(te)
            return te
        return self._triple_constraint(label)

    def _triple_constraint(self, label):
        inverse = False
        k, v = self.t.peek()
        if v == "^":
            self.t.next()
            inverse = True
        pred = self._iri_or_pname()
        tc: dict = {"type": "TripleConstraint", "predicate": pred}
        if inverse:
            tc["inverse"] = True
        if label:
            tc["id"] = label
        k, v = self.t.peek()
        if v == ".":
            self.t.next()
        else:
            tc["valueExpr"] = self._shape_expr()
        tc = self._apply_card(tc)
        self._annotations_semacts(tc)
        return tc

    def _apply_card(self, te: dict) -> dict:
        k, v = self.t.peek()
        if v == "?":
            self.t.next()
            te["min"], te["max"] = 0, 1
        elif v == "*":
            self.t.next()
            te["min"], te["max"] = 0, -1
        elif v == "+":
            self.t.next()
            te["min"], te["max"] = 1, -1
        elif k == "repeat":
            self.t.next()
            body = v[1:-1]
            if "," in body:
                lo, hi = body.split(",")
                te["min"] = int(lo)
                te["max"] = -1 if hi in ("", "*") else int(hi)
            else:
                te["min"] = te["max"] = int(body)
        return te

    def _annotations_semacts(self, target: dict | None = None):
        """Consume `// annotation`* and `%name{code%}`* suffixes; semActs
        attach to ``target`` (ShExJ-shaped SemAct dicts, evaluated by
        validate/local.py run_sem_acts)."""
        acts: list[dict] = []
        while True:
            k, v = self.t.peek()
            if v == "//":
                self.t.next()
                self._iri_or_pname()
                k2, v2 = self.t.peek()
                if k2 in ("str_dq", "str_sq", "iriref", "pname", "integer", "decimal", "double"):
                    self.t.next()
                    if k2 in ("str_dq", "str_sq"):
                        k3, v3 = self.t.peek()
                        if k3 == "langtag" or v3 == "^^":
                            self.t.next()
                            if v3 == "^^":
                                self._iri_or_pname()
            elif k == "code":
                self.t.next()
                acts.append(self._parse_semact(v))
            else:
                break
        if acts and target is not None:
            target["semActs"] = target.get("semActs", []) + acts
        return acts

    _CODE_ESC = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", re.S)

    def _parse_semact(self, raw: str) -> dict:
        """`%<iri>{ code %}` / `%pfx:local{ code %}` / `%<iri>%` (no code)
        -> {"type": "SemAct", "name": iri, "code"?: unescaped}. Code
        unescaping per ShExC CODE: \\% -> %, \\\\ -> \\, \\uXXXX/\\UXXXXXXXX."""
        body = raw[1:]
        if body.startswith("<"):
            end = body.index(">")
            name = self._resolve(body[1:end])
            rest = body[end + 1 :]
        else:
            m = re.match(r"[A-Za-z_][\w.\-]*:?[\w.\-]*", body)
            name = self._pname(m.group()) if ":" in m.group() else m.group()
            rest = body[m.end() :]
        act = {"type": "SemAct", "name": name}
        if rest.startswith("{"):

            def rep(mm):
                g = mm.group(1)
                if g[0] in "uU":
                    return chr(int(g[1:], 16))
                return g

            act["code"] = self._CODE_ESC.sub(rep, rest[1:-2])
        return act


def parse_shexc(text: str, base: str = "") -> dict:
    """ShExC text -> engine schema IR (same shape as load_shexj output)."""
    return ShExCParser(text, base=base).parse()
