"""In-memory ShEx validator — the engine's executable semantics spec.

Re-implements (from scratch, per the public ShEx 2.1 semantics) the behavior
of the reference's validators:
  * recursion guard / memoized typing — weso/shaclex
    modules/slang/src/main/scala/es/weso/slang/ValidateND.scala:44-122
    (pair marked before descending :51, skip-if-validated :54)
  * regular-bag-expression matching of EachOf/OneOf/TripleConstraint with
    cardinalities, EXTRA and CLOSED — behavior pinned by the 1092 entries in
    src/test/resources/shexTest/validation/manifest.ttl
  * 4-valued flavor: in-progress pairs are assumed conforming (greatest-
    fixpoint reading), matching the reference's treatment of cyclic schemas.

Used for: the conformance harness (graphs are tiny), per-neighborhood
evaluation inside `map_groups` for nested shapes in the distributed path,
and as the oracle for distributed-validator tests.
"""

from __future__ import annotations

import re
from collections import defaultdict

from shaclex_ray.terms import term_key
from shaclex_ray.validate.nodecheck import check_node_constraint

UNBOUNDED = -1
_MAX_MATCHABLE_ARCS = 20  # bitmask matcher guard; conformance graphs are tiny

# -- semantic actions (ShEx 2.1 §4; the shexTest Test extension) ------------
TEST_EXT = "http://shex.io/extensions/Test/"
_PRINT_RE = re.compile(r'^\s*print\(\s*(?:(s|p|o)|"((?:[^"\\]|\\.)*)")\s*\)\s*$')
_FAIL_RE = re.compile(r"^\s*fail\(")


def run_sem_acts(acts, s=None, p=None, o=None, log: list | None = None) -> bool:
    """Dispatch a semAct list with the Test extension semantics
    (http://shex.io/extensions/Test/, the processor shexTest pins):
    ``print(s|p|o|"lit")`` succeeds (recording its output when ``log`` is
    given), ``fail(...)`` fails, a SemAct with no code succeeds, any other
    Test code fails. SemActs naming an UNREGISTERED processor are ignored
    (success) — matching the reference, which treats semantic actions as
    an extension point and runs none by default (SURVEY.md §2.11)."""
    if not acts:
        return True
    for a in acts:
        if a.get("name") != TEST_EXT:
            continue
        code = a.get("code")
        if code is None:
            continue
        if _FAIL_RE.match(code.strip()):
            return False
        m = _PRINT_RE.match(code)
        if m is None:
            return False
        if log is not None:
            var, lit = m.group(1), m.group(2)
            log.append({"s": s, "p": p, "o": o}.get(var) if var else lit)
    return True


class Graph:
    """Indexed in-memory triple set (the reference's Jena-model analog)."""

    def __init__(self, triples):
        self.triples = triples
        self.by_subj: dict[str, list] = defaultdict(list)
        self.by_obj: dict[str, list] = defaultdict(list)
        for s, p, o in triples:
            self.by_subj[term_key(s)].append((p, o))
            self.by_obj[term_key(o)].append((p, s))

    def arcs_out(self, node_key: str):
        return self.by_subj.get(node_key, [])

    def arcs_in(self, node_key: str):
        return self.by_obj.get(node_key, [])


def _card(te: dict) -> tuple[int, int]:
    mn = te.get("min", 1)
    mx = te.get("max", 1)
    return mn, mx


class ShExValidator:
    def __init__(self, schema: dict, graph: Graph, matching: str = "exhaustive"):
        """``matching``: "exhaustive" (the spec strategy; default) or
        "greedy" (regex-style in-arc-order consumption without
        backtracking — the sht:Greedy suite entries pin it; both
        strategies share every other semantic: node constraints, EXTRA,
        CLOSED, semActs, externs)."""
        self.schema = schema
        self.graph = graph
        # a schema may pin its strategy (broadcast to distributed buckets
        # as part of the schema dict); an explicit constructor arg wins
        self.matching = (
            schema.get("_matching", "exhaustive")
            if matching == "exhaustive"
            else matching
        )
        self.typing: dict[tuple[str, str], bool] = {}
        self._in_progress: set[tuple[str, str]] = set()
        self._flat_cache: dict[int, list | None] = {}
        self._extern_validator: ShExValidator | None = None

    # -- public API --------------------------------------------------------
    def validate_node_shape(self, node: tuple, shape_label: str | None) -> bool:
        # schema startActs run when validation is invoked; a failing one
        # fails every result (shexTest startCode*fail_abort entries)
        if not run_sem_acts(self.schema.get("startActs")):
            return False
        if shape_label is None or shape_label == "START":
            se = self.schema.get("start")
            if se is None:
                raise ValueError("no start shape")
            return self.satisfies(node, se)
        return self.satisfies_label(node, shape_label)

    # -- shape expression dispatch ----------------------------------------
    def satisfies_label(self, node: tuple, label: str) -> bool:
        key = (term_key(node), label)
        if key in self.typing:
            return self.typing[key]
        if key in self._in_progress:
            return True  # coinductive assumption (cyclic reference)
        se = self.schema["shapes"].get(label)
        if se is None:
            raise ValueError(f"unknown shape label {label}")
        self._in_progress.add(key)
        try:
            res = self.satisfies(node, se)
        finally:
            self._in_progress.discard(key)
        self.typing[key] = res
        return res

    def satisfies(self, node: tuple, se) -> bool:
        if isinstance(se, str):
            return self.satisfies_label(node, se)
        t = se.get("type")
        if t == "NodeConstraint":
            return check_node_constraint(node, se)
        if t == "ShapeAnd":
            return all(self.satisfies(node, sub) for sub in se["shapeExprs"])
        if t == "ShapeOr":
            return any(self.satisfies(node, sub) for sub in se["shapeExprs"])
        if t == "ShapeNot":
            return not self.satisfies(node, se["shapeExpr"])
        if t == "Shape":
            return self._match_shape(node, se)
        if t == "ShapeExternal":
            # EXTERNAL: defer to the externally-supplied schema when one is
            # attached (shexTest sht:shapeExterns); with no resolver, accept
            # (the reference's default for unresolved extension points)
            ext = self.schema.get("externs")
            lbl = se.get("id")
            if ext and lbl is not None and lbl in ext.get("shapes", {}):
                if self._extern_validator is None:
                    self._extern_validator = ShExValidator(ext, self.graph)
                return self._extern_validator.satisfies_label(node, lbl)
            return True
        if t == "ShapeDecl":
            return self.satisfies(node, se["shapeExpr"])
        raise ValueError(f"unknown shapeExpr type {t}")

    # -- triple expression machinery --------------------------------------
    def _resolve_te(self, te):
        if isinstance(te, str):
            resolved = self.schema["te_refs"].get(te)
            if resolved is None:
                raise ValueError(f"unknown tripleExpr ref {te}")
            return resolved
        return te

    def _collect_tcs(self, te, out: list, seen: set):
        te = self._resolve_te(te)
        tid = id(te)
        if tid in seen:
            return
        seen.add(tid)
        t = te.get("type")
        if t == "TripleConstraint":
            out.append(te)
        elif t in ("EachOf", "OneOf"):
            for sub in te["expressions"]:
                self._collect_tcs(sub, out, seen)

    def _flat_tcs(self, expr):
        """If expr is a flat EachOf (group card 1,1) of TripleConstraints
        with pairwise-distinct (predicate, inverse), return the TC list —
        the counting decomposition applies (SURVEY.md C4: TripleConstraint
        → counting ops, ShEx2SLang.scala:94-115). Cached per expr."""
        key = id(expr)
        if key in self._flat_cache:
            return self._flat_cache[key]
        result = None
        te = self._resolve_te(expr)
        t = te.get("type")
        tcs = None
        if t == "TripleConstraint":
            tcs = [te]
        elif t == "EachOf" and _card(te) == (1, 1) and not te.get("semActs"):
            tcs = []
            for sub in te["expressions"]:
                sub_r = self._resolve_te(sub) if isinstance(sub, str) else sub
                if not (isinstance(sub_r, dict) and sub_r.get("type") == "TripleConstraint"):
                    tcs = None
                    break
                tcs.append(sub_r)
        if tcs is not None:
            seen = set()
            ok = True
            for tc in tcs:
                # semActs need per-arc dispatch — counting can't see arcs
                if tc.get("semActs"):
                    ok = False
                    break
                k = (tc["predicate"], bool(tc.get("inverse")))
                if k in seen:
                    ok = False
                    break
                seen.add(k)
            if ok:
                result = tcs
        self._flat_cache[key] = result
        return result

    def _match_flat(self, node, shape, tcs, outs, ins, extra, closed) -> bool:
        """Counting evaluation for flat shapes — any neighborhood size."""
        for tc in tcs:
            pred = tc["predicate"]
            inv = bool(tc.get("inverse"))
            vals = (
                [s for p, s in ins if p == pred]
                if inv
                else [o for p, o in outs if p == pred]
            )
            ve = tc.get("valueExpr")
            if ve is None:
                c_sat = len(vals)
            else:
                c_sat = sum(1 for v in vals if self.satisfies(v, ve))
            c_tot = len(vals)
            mn, mx = _card(tc)
            if not inv and pred not in extra:
                # every arc with this predicate must be matched
                if c_sat != c_tot:
                    return False
                if c_tot < mn or (mx != UNBOUNDED and c_tot > mx):
                    return False
            else:
                # EXTRA (or incoming): matched = the satisfying arcs
                if c_sat < mn or (mx != UNBOUNDED and c_sat > mx):
                    return False
        return True

    def _match_shape(self, node: tuple, shape: dict) -> bool:
        res = self._match_shape_inner(node, shape)
        # shape-level semActs run once after the shape matches
        if res and shape.get("semActs"):
            res = run_sem_acts(shape["semActs"], s=node)
        return res

    def _match_shape_inner(self, node: tuple, shape: dict) -> bool:
        expr = shape.get("expression")
        extra = set(shape.get("extra", []) or [])
        closed = bool(shape.get("closed", False))
        nkey = term_key(node)
        outs = self.graph.arcs_out(nkey)
        ins = self.graph.arcs_in(nkey)

        tcs: list = []
        if expr is not None:
            self._collect_tcs(expr, tcs, set())
        fwd_preds = {tc["predicate"] for tc in tcs if not tc.get("inverse")}
        inv_preds = {tc["predicate"] for tc in tcs if tc.get("inverse")}

        # arcs: (pred, value_node, inverse)
        arcs: list[tuple[str, tuple, bool]] = []
        for p, o in outs:
            if p in fwd_preds:
                arcs.append((p, o, False))
        for p, s in ins:
            if p in inv_preds:
                arcs.append((p, s, True))

        # closed: OUT arcs with predicates not mentioned (expr preds ∪ extra)
        if closed:
            mentioned = fwd_preds | extra
            for p, _o in outs:
                if p not in mentioned:
                    return False

        # flat counting fast path (any neighborhood size)
        if expr is not None:
            flat = self._flat_tcs(expr)
            if flat is not None:
                return self._match_flat(node, shape, flat, outs, ins, extra, closed)

        n = len(arcs)
        if n > _MAX_MATCHABLE_ARCS:
            raise ValueError(f"neighborhood too large for exact matcher ({n})")

        if expr is None:
            # empty shape: no matchables, everything permitted (unless closed,
            # handled above)
            return True

        # lazily-cached arc-vs-TC satisfaction (value-shape recursion J5)
        sat_cache: dict[tuple[int, int], bool] = {}

        def arc_matches_tc(ai: int, tc: dict) -> bool:
            k = (ai, id(tc))
            if k in sat_cache:
                return sat_cache[k]
            p, v, inv = arcs[ai]
            ok = p == tc["predicate"] and bool(inv) == bool(tc.get("inverse", False))
            if ok and tc.get("valueExpr") is not None:
                ok = self.satisfies(v, tc["valueExpr"])
            if ok and tc.get("semActs"):
                # per-matched-triple dispatch, bound to the DATA triple
                # (for inverse constraints the focus is the object)
                ok = (
                    run_sem_acts(tc["semActs"], s=v, p=p, o=node)
                    if inv
                    else run_sem_acts(tc["semActs"], s=node, p=p, o=v)
                )
            sat_cache[k] = ok
            return ok

        if self.matching == "greedy":
            res = self._greedy_match(expr, n, arc_matches_tc)
            if res is None:
                return False
            matched_candidates = [sum(1 << ai for ai in res)]
            return self._check_remainder(
                matched_candidates, n, arcs, tcs, extra, arc_matches_tc
            )

        memo: dict[tuple[int, int, str], bool] = {}

        def nullable(te) -> bool:
            te = self._resolve_te(te)
            t = te.get("type")
            mn, _mx = _card(te)
            if mn == 0:
                return True
            if t == "TripleConstraint":
                return False
            if t == "EachOf":
                return all(nullable(s) for s in te["expressions"])
            if t == "OneOf":
                return any(nullable(s) for s in te["expressions"])
            return False

        def match_one(te, mask: int) -> bool:
            """mask matches exactly one instance of te's body (card ignored)."""
            te_r = self._resolve_te(te)
            k = (id(te_r), mask, "one")
            if k in memo:
                return memo[k]
            t = te_r.get("type")
            if t == "TripleConstraint":
                # one instance == one arc matching the constraint
                if bin(mask).count("1") != 1:
                    memo[k] = False
                    return False
                ai = mask.bit_length() - 1
                res = arc_matches_tc(ai, te_r)
                memo[k] = res
                return res
            if t == "EachOf":
                res = each_partition(te_r["expressions"], 0, mask)
                # group semActs run once per matched instance of the group
                if res and te_r.get("semActs"):
                    res = run_sem_acts(te_r["semActs"], s=node)
                memo[k] = res
                return res
            if t == "OneOf":
                res = any(match_full(sub, mask) for sub in te_r["expressions"])
                if res and te_r.get("semActs"):
                    res = run_sem_acts(te_r["semActs"], s=node)
                memo[k] = res
                return res
            raise ValueError(f"unknown tripleExpr type {t}")

        def each_partition(children, idx: int, mask: int) -> bool:
            """Partition mask among children[idx:] (each child gets a full
            match including its own cardinality)."""
            if idx == len(children):
                return mask == 0
            if idx == len(children) - 1:
                return match_full(children[idx], mask)
            child = children[idx]
            # iterate submasks of mask for this child
            sub = mask
            while True:
                if match_full(child, sub) and each_partition(children, idx + 1, mask & ~sub):
                    return True
                if sub == 0:
                    break
                sub = (sub - 1) & mask
            return False

        def match_full(te, mask: int) -> bool:
            """mask matches te including te's cardinality (repetition)."""
            te_r = self._resolve_te(te)
            mn, mx = _card(te_r)
            k = (id(te_r), mask, "full")
            if k in memo:
                return memo[k]
            t = te_r.get("type")
            if t == "TripleConstraint":
                cnt = bin(mask).count("1")
                ok = mn <= cnt and (mx == UNBOUNDED or cnt <= mx)
                if ok:
                    m = mask
                    while m:
                        ai = (m & -m).bit_length() - 1
                        if not arc_matches_tc(ai, te_r):
                            ok = False
                            break
                        m &= m - 1
                memo[k] = ok
                return ok
            res = match_repeat(te_r, mask, mn, mx)
            memo[k] = res
            return res

        def match_repeat(te_r, mask: int, mn: int, mx: int) -> bool:
            if mask == 0:
                return mn == 0 or nullable(te_r)
            if mx == 0:
                return False
            cap = bin(mask).count("1") if mx == UNBOUNDED else mx
            k = (id(te_r), mask, f"rep{mn},{cap}")
            if k in memo:
                return memo[k]
            res = False
            sub = mask
            while True:
                if sub != 0 and match_one(te_r, sub):
                    nmx = UNBOUNDED if mx == UNBOUNDED else mx - 1
                    if match_repeat(te_r, mask & ~sub, max(0, mn - 1), nmx):
                        res = True
                        break
                if sub == 0:
                    break
                sub = (sub - 1) & mask
            memo[k] = res
            return res

        full_mask = (1 << n) - 1

        # enumerate candidate matched ⊆ arcs; check remainder conditions
        matched_candidates = []
        sub = full_mask
        while True:
            if match_full(expr, sub):
                matched_candidates.append(sub)
            if sub == 0:
                break
            sub = (sub - 1) & full_mask

        return self._check_remainder(
            matched_candidates, n, arcs, tcs, extra, arc_matches_tc
        )

    @staticmethod
    def _check_remainder(matched_candidates, n, arcs, tcs, extra, arc_matches_tc):
        """Remainder rule (pinned by 1literalPlus / 1val2IRIREFExtra1 /
        1dotExtra1 tests): an unmatched OUT arc with a mentioned predicate
        fails the shape unless the predicate is EXTRA and the arc does NOT
        match any TripleConstraint with that predicate (EXTRA only
        sanctions value-failing arcs)."""
        full_mask = (1 << n) - 1
        for matched in matched_candidates:
            ok = True
            m = full_mask & ~matched
            while m:
                ai = (m & -m).bit_length() - 1
                p, _v, inv = arcs[ai]
                if not inv:
                    if p not in extra:
                        ok = False
                    else:
                        for tc in tcs:
                            if (
                                tc["predicate"] == p
                                and not tc.get("inverse")
                                and arc_matches_tc(ai, tc)
                            ):
                                ok = False
                                break
                if not ok:
                    break
                m &= m - 1
            if ok:
                return True
        return False

    def _greedy_match(self, expr, n: int, arc_matches_tc):
        """Greedy matching strategy (the sht:Greedy suite entries):
        constraints consume matching arcs from the remaining pool in arc
        (document) order, quantifiers take maximally, OneOf commits to the
        first alternative that matches, groups repeat until an instance
        consumes nothing — NO backtracking, so an early starving quantifier
        fails shapes the exhaustive strategy would satisfy
        (nPlus1-greedy_fail, PTstar-greedy-fail). Returns the matched arc
        index tuple, or None when the expression cannot match."""

        def full(te, rem: tuple):
            te_r = self._resolve_te(te)
            mn, mx = _card(te_r)
            t = te_r.get("type")
            if t == "TripleConstraint":
                cap = len(rem) if mx == UNBOUNDED else mx
                taken, left = [], []
                for ai in rem:
                    if len(taken) < cap and arc_matches_tc(ai, te_r):
                        taken.append(ai)
                    else:
                        left.append(ai)
                if len(taken) < mn:
                    return None
                return tuple(left), tuple(taken)
            count = 0
            cur = rem
            taken_all: list[int] = []
            while mx == UNBOUNDED or count < mx:
                res = body(te_r, cur)
                if res is None:
                    break
                nxt, tk = res
                taken_all.extend(tk)
                if te_r.get("semActs") and not run_sem_acts(te_r["semActs"]):
                    return None
                count += 1
                if nxt == cur:
                    cur = nxt
                    break  # nullable instance consumed nothing: stop
                cur = nxt
            if count < mn:
                return None
            return cur, tuple(taken_all)

        def body(te_r, rem: tuple):
            """One instance of a group body (the group's own card is
            handled by ``full``)."""
            t = te_r.get("type")
            if t == "EachOf":
                cur, taken = rem, []
                for sub in te_r["expressions"]:
                    res = full(sub, cur)
                    if res is None:
                        return None
                    cur, tk = res
                    taken.extend(tk)
                return cur, tuple(taken)
            if t == "OneOf":
                for sub in te_r["expressions"]:
                    res = full(sub, rem)
                    if res is not None:
                        return res
                return None
            raise ValueError(f"unknown tripleExpr type {t}")

        res = full(expr, tuple(range(n)))
        if res is None:
            return None
        return res[1]
