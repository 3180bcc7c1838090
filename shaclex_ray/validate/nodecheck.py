"""Term-level node-constraint semantics (shared by the in-memory validator
and the vectorized Arrow kernels).

Covers the observable scalar-constraint surface of the reference
(SURVEY.md M8 / §2.7): nodeKind, datatype (incl. XSD lexical-form validity —
the sht:ValidLexicalForm behavior where "someday"^^xsd:date fails an
xsd:date constraint, see weso/shaclex examples/shex/datatype.ttl bad5),
string facets (length/minlength/maxlength, pattern+flags), numeric facets
(min/max in/exclusive, totaldigits, fractiondigits), value sets with IRI /
literal / language stems and stem ranges, and numeric-equivalence literal
matching (sht:NumericEquivalence).
"""

from __future__ import annotations

import re
from datetime import date, datetime
from decimal import Decimal, InvalidOperation

from shaclex_ray.terms import XSD, RDF_LANGSTRING, XSD_STRING

NUMERIC_DTS = {
    XSD + t
    for t in (
        "integer",
        "decimal",
        "double",
        "float",
        "long",
        "int",
        "short",
        "byte",
        "nonNegativeInteger",
        "nonPositiveInteger",
        "negativeInteger",
        "positiveInteger",
        "unsignedLong",
        "unsignedInt",
        "unsignedShort",
        "unsignedByte",
    )
}

_INT_DERIVED_BOUNDS = {
    XSD + "long": (-(2**63), 2**63 - 1),
    XSD + "int": (-(2**31), 2**31 - 1),
    XSD + "short": (-(2**15), 2**15 - 1),
    XSD + "byte": (-(2**7), 2**7 - 1),
    XSD + "nonNegativeInteger": (0, None),
    XSD + "nonPositiveInteger": (None, 0),
    XSD + "negativeInteger": (None, -1),
    XSD + "positiveInteger": (1, None),
    XSD + "unsignedLong": (0, 2**64 - 1),
    XSD + "unsignedInt": (0, 2**32 - 1),
    XSD + "unsignedShort": (0, 2**16 - 1),
    XSD + "unsignedByte": (0, 2**8 - 1),
}

_INTEGER_RE = re.compile(r"^[+-]?\d+$")
_DECIMAL_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")
_DOUBLE_RE = re.compile(r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|-?INF|NaN)$")
_BOOLEAN_RE = re.compile(r"^(true|false|0|1)$")
_DATE_RE = re.compile(r"^(-?\d{4,})-(\d{2})-(\d{2})(Z|[+-]\d{2}:\d{2})?$")
_TIME_RE = re.compile(r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?(Z|[+-]\d{2}:\d{2})?$")
_DATETIME_RE = re.compile(
    r"^(-?\d{4,})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
)
_GYEAR_RE = re.compile(r"^-?\d{4,}(Z|[+-]\d{2}:\d{2})?$")
_GYEARMONTH_RE = re.compile(r"^-?\d{4,}-\d{2}(Z|[+-]\d{2}:\d{2})?$")
_DURATION_RE = re.compile(
    r"^-?P(?=.)(\d+Y)?(\d+M)?(\d+D)?(T(?=.)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"
)


def _valid_date_parts(y: str, mo: str, d: str) -> bool:
    try:
        date(abs(int(y)) or 1, int(mo), int(d))
        return True
    except ValueError:
        return False


def valid_lexical(lex: str, dt: str) -> bool:
    """Is ``lex`` a valid lexical form for XSD datatype ``dt``?
    Unknown datatypes are permissive (any lexical form)."""
    if dt == XSD + "integer" or dt in _INT_DERIVED_BOUNDS:
        if not _INTEGER_RE.match(lex):
            return False
        bounds = _INT_DERIVED_BOUNDS.get(dt)
        if bounds:
            v = int(lex)
            lo, hi = bounds
            if lo is not None and v < lo:
                return False
            if hi is not None and v > hi:
                return False
        return True
    if dt == XSD + "decimal":
        return bool(_DECIMAL_RE.match(lex))
    if dt in (XSD + "double", XSD + "float"):
        return bool(_DOUBLE_RE.match(lex))
    if dt == XSD + "boolean":
        return bool(_BOOLEAN_RE.match(lex))
    if dt == XSD + "date":
        m = _DATE_RE.match(lex)
        return bool(m) and _valid_date_parts(m.group(1), m.group(2), m.group(3))
    if dt == XSD + "dateTime":
        m = _DATETIME_RE.match(lex)
        if not m:
            return False
        if not _valid_date_parts(m.group(1), m.group(2), m.group(3)):
            return False
        h, mi, s = int(m.group(4)), int(m.group(5)), int(m.group(6))
        return (h < 24 or (h == 24 and mi == 0 and s == 0)) and mi < 60 and s < 60
    if dt == XSD + "time":
        m = _TIME_RE.match(lex)
        return bool(m) and int(m.group(1)) < 24 and int(m.group(2)) < 60 and int(m.group(3)) < 60
    if dt == XSD + "gYear":
        return bool(_GYEAR_RE.match(lex))
    if dt == XSD + "gYearMonth":
        return bool(_GYEARMONTH_RE.match(lex))
    if dt == XSD + "duration":
        return bool(_DURATION_RE.match(lex))
    return True


def numeric_value(lex: str, dt: str):
    """Numeric value of a literal, or None if not numeric / invalid."""
    if dt not in NUMERIC_DTS:
        return None
    if not valid_lexical(lex, dt):
        return None
    try:
        if dt in (XSD + "double", XSD + "float"):
            if lex in ("INF", "+INF"):
                return Decimal("Infinity")
            if lex == "-INF":
                return Decimal("-Infinity")
            if lex == "NaN":
                return None
            return Decimal(lex)
        return Decimal(lex)
    except InvalidOperation:
        return None


def _tz_seconds(tz):
    if not tz:
        return None
    if tz == "Z":
        return 0
    sign = 1 if tz[0] == "+" else -1
    return sign * (int(tz[1:3]) * 3600 + int(tz[4:6]) * 60)


def datetime_value(lex: str, dt: str):
    """Comparable value for date/dateTime literals: (has_tz, utc_seconds),
    or None. XSD ordering is partial: values with and without timezone are
    incomparable (pinned by SHACL core minInclusive-002/003)."""
    try:
        if dt == XSD + "date":
            m = _DATE_RE.match(lex)
            if not m:
                return None
            base = date(int(m.group(1)), int(m.group(2)), int(m.group(3))).toordinal() * 86400.0
            off = _tz_seconds(m.group(4))
            return (off is not None, base - (off or 0))
        if dt == XSD + "dateTime":
            m = _DATETIME_RE.match(lex)
            if not m:
                return None
            base = date(int(m.group(1)), int(m.group(2)), int(m.group(3))).toordinal() * 86400.0
            t = (
                base
                + int(m.group(4)) * 3600
                + int(m.group(5)) * 60
                + int(m.group(6))
                + float(m.group(7) or 0)
            )
            off = _tz_seconds(m.group(8))
            return (off is not None, t - (off or 0))
    except ValueError:
        return None
    return None


# ---------------------------------------------------------------------------
# XPath-ish regex → Python re

_FLAG_MAP = {"i": re.I, "m": re.M, "s": re.S, "x": re.X}


def compile_pattern(pattern: str, flags: str = ""):
    f = 0
    for c in flags or "":
        f |= _FLAG_MAP.get(c, 0)
    return re.compile(pattern, f)


def _lexical_or_label(term: tuple) -> str:
    """String the string facets apply to: literal lexical form, IRI string,
    or bnode id (reference facet semantics)."""
    if term[0] == "lit":
        return term[1]
    return term[1]


# ---------------------------------------------------------------------------
# Value-set matching

def _lang_matches(lang: str, stem: str) -> bool:
    """Language-range match: stem 'fr' matches 'fr' and 'fr-BE'; '' matches
    any language-tagged string."""
    lang = lang.lower()
    stem = stem.lower()
    if stem == "":
        return lang != ""
    return lang == stem or lang.startswith(stem + "-")


def _literal_eq(t1: tuple, v: dict) -> bool:
    """ObjectLiteral match = RDF term equality: (lexical, datatype, language)
    tuple equality (the sht:NumericEquivalence tests pin that e.g. "00" does
    NOT match the value-set literal 0)."""
    vlex = v["value"]
    vdt = v.get("type", XSD_STRING)
    vlang = v.get("language", "")
    if vlang:
        vdt = RDF_LANGSTRING
    lex, dt, lang = t1[1], t1[2], t1[3]
    return lex == vlex and dt == vdt and lang.lower() == vlang.lower()


def value_in_set(term: tuple, values: list) -> bool:
    kind = term[0]
    for v in values:
        if isinstance(v, str):  # IRI
            if kind == "iri" and term[1] == v:
                return True
            continue
        t = v.get("type")
        if t is None or t == "ObjectLiteral" or ("value" in v and t is None):
            if kind == "lit" and _literal_eq(term, v):
                return True
        elif "value" in v and t not in (
            "IriStem",
            "IriStemRange",
            "LiteralStem",
            "LiteralStemRange",
            "Language",
            "LanguageStem",
            "LanguageStemRange",
        ):
            # ObjectLiteral with a datatype "type" field
            if kind == "lit" and _literal_eq(term, v):
                return True
        elif t == "IriStem":
            if kind == "iri" and term[1].startswith(v["stem"]):
                return True
        elif t == "IriStemRange":
            stem = v["stem"]
            ok = kind == "iri" and (
                isinstance(stem, dict) or term[1].startswith(stem)
            )
            if ok and not _excluded_iri(term[1], v.get("exclusions", [])):
                return True
        elif t == "LiteralStem":
            if kind == "lit" and term[1].startswith(v["stem"]):
                return True
        elif t == "LiteralStemRange":
            stem = v["stem"]
            ok = kind == "lit" and (
                isinstance(stem, dict) or term[1].startswith(stem)
            )
            if ok and not _excluded_lit(term[1], v.get("exclusions", [])):
                return True
        elif t == "Language":
            if kind == "lit" and term[3] and term[3].lower() == v["languageTag"].lower():
                return True
        elif t == "LanguageStem":
            if kind == "lit" and _lang_matches(term[3], v["stem"]):
                return True
        elif t == "LanguageStemRange":
            stem = v["stem"]
            ok = kind == "lit" and (
                isinstance(stem, dict) or _lang_matches(term[3], stem)
            )
            if ok and not _excluded_lang(term[3], v.get("exclusions", [])):
                return True
    return False


def _excluded_iri(iri_s: str, exclusions: list) -> bool:
    for e in exclusions:
        if isinstance(e, str):
            if iri_s == e:
                return True
        elif e.get("type") == "IriStem" and iri_s.startswith(e["stem"]):
            return True
    return False


def _excluded_lit(lex: str, exclusions: list) -> bool:
    for e in exclusions:
        if isinstance(e, str):
            if lex == e:
                return True
        elif isinstance(e, dict):
            if e.get("type") == "LiteralStem" and lex.startswith(e["stem"]):
                return True
            if "value" in e and lex == e["value"]:
                return True
    return False


def _excluded_lang(lang: str, exclusions: list) -> bool:
    for e in exclusions:
        if isinstance(e, str):
            if lang.lower() == e.lower():
                return True
        elif e.get("type") == "LanguageStem" and _lang_matches(lang, e["stem"]):
            return True
    return False


# ---------------------------------------------------------------------------
# NodeConstraint satisfaction

def check_node_constraint(term: tuple, nc: dict) -> bool:
    """Does ``term`` satisfy ShExJ NodeConstraint ``nc``?
    (reference: node-constraint component checks enumerated in
    ShEx2Shacl.scala:407-424 / conformance suites)"""
    kind = term[0]
    nk = nc.get("nodeKind")
    if nk is not None:
        if nk == "iri" and kind != "iri":
            return False
        if nk == "bnode" and kind != "bnode":
            return False
        if nk == "literal" and kind != "lit":
            return False
        if nk == "nonliteral" and kind == "lit":
            return False
    dt = nc.get("datatype")
    if dt is not None:
        if kind != "lit":
            return False
        if term[2] != dt:
            return False
        if not valid_lexical(term[1], dt):
            return False
    if "values" in nc:
        if not value_in_set(term, nc["values"]):
            return False
    # string facets
    s = _lexical_or_label(term)
    if "length" in nc and len(s) != nc["length"]:
        return False
    if "minlength" in nc and len(s) < nc["minlength"]:
        return False
    if "maxlength" in nc and len(s) > nc["maxlength"]:
        return False
    if "pattern" in nc:
        try:
            rx = compile_pattern(nc["pattern"], nc.get("flags", ""))
        except re.error:
            return False
        if not rx.search(s):
            return False
    # numeric facets
    for facet in ("mininclusive", "minexclusive", "maxinclusive", "maxexclusive"):
        if facet in nc:
            if kind != "lit":
                return False
            nv = numeric_value(term[1], term[2])
            if nv is None:
                return False
            bound = nc[facet]
            b = Decimal(str(bound))
            if facet == "mininclusive" and not (nv >= b):
                return False
            if facet == "minexclusive" and not (nv > b):
                return False
            if facet == "maxinclusive" and not (nv <= b):
                return False
            if facet == "maxexclusive" and not (nv < b):
                return False
    if "totaldigits" in nc or "fractiondigits" in nc:
        if kind != "lit":
            return False
        nv = numeric_value(term[1], term[2])
        if nv is None or term[2] in (XSD + "double", XSD + "float"):
            return False
        if "fractiondigits" in nc and term[2] not in NUMERIC_DTS:
            return False
        tup = nv.normalize().as_tuple()
        ndigits = len(tup.digits)
        frac = max(0, -tup.exponent)
        if tup.exponent > 0:
            ndigits += tup.exponent
        if "totaldigits" in nc and ndigits > nc["totaldigits"]:
            return False
        if "fractiondigits" in nc and frac > nc["fractiondigits"]:
            return False
    return True
