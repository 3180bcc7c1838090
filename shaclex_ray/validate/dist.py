"""Distributed shape validation: a semi-naive BSP fixpoint on Ray.

Ray-native re-expression of the reference's recursive neighborhood-closure
validation (SURVEY.md §2.9; worklist semantics per weso/shaclex
modules/slang/src/main/scala/es/weso/slang/ValidateND.scala:44-122):

  * ONE explicit hash shuffle routes every triple to the bucket of its
    subject (plus, optionally, a reversed copy to its object's bucket for
    incoming arcs), so each focus node's neighborhood is co-located (J3)
  * each bucket is a **persistent actor** (SURVEY.md A2: the one stateful
    stage the Dataset API can't express — partitioned state reused across
    fixpoint rounds): it builds its neighborhood index once and then
    evaluates (node, shape) pairs with the in-memory, conformance-verified
    validator semantics
  * a pair whose evaluation needs the conformance of a *remote* node
    (value-shape recursion J5 / sh:class of a value node) reports a
    dependency; the child's decided conformance is routed back as an
    assumption the next round (the typing-join G9). Per-round traffic is
    only tasks + assumptions — the arc data never moves again
  * rounds repeat until no pair flips; unresolved cross-bucket cycles then
    close coinductively (assume conforms — the greatest-fixpoint reading,
    ValidateND.scala:51-54)

Driver-side state is O(|focus pairs| + |distinct dependencies|); arcs (the
100-TB side) are partitioned once and live in the bucket actors (sized via
``nbuckets`` so a bucket fits a worker's heap; at larger scale the same
actors would page buckets from the partitioned parquet checkpoints).

Supported distributed: full ShEx semantics (reversed arc copies are
enabled automatically when the schema has inverse constraints); SHACL
core including multi-hop property paths — sequence / alternative /
zeroOrMore / oneOrMore / zeroOrOne expand as locality-aware BFS whose
elementary hops on remote nodes are answered through the dependency
protocol (one unanswered-hop layer per round); inverse of a complex path
rewrites to reversed elementary hops (invert_path — inversion distributes
over every path constructor), so no construct needs a global node scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from shaclex_ray.terms import RDF_TYPE, key_to_term, subj_to_key, term_key
from shaclex_ray.validate.local import Graph, ShExValidator
from shaclex_ray.validate.nodecheck import compile_pattern
from shaclex_ray.validate.shacl_local import (
    RDFS_SUBCLASS,
    ShaclValidator,
    _component as _component_iri,
)

# ---------------------------------------------------------------------------
# stable bucketing: polars' vectorized string hash (fixed seed — stable
# across processes sharing one library build, which a cluster does; see
# the cross-process pin in tests). Bucket assignment is internal routing,
# never observable in validation output. pandas-siphash fallback.

try:
    import polars as _pl
except ImportError:  # pragma: no cover
    _pl = None


def stable_bucket_array(strings, nbuckets: int) -> np.ndarray:
    """Deterministic bucket per string. Accepts a list, numpy object
    array, or a pyarrow (Chunked)Array — Arrow input hashes zero-copy."""
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if _pl is not None:
        arr = strings if isinstance(strings, pa.Array) else pa.array(strings, pa.string())
        if len(arr) == 0:
            return np.zeros(0, dtype=np.int64)
        h = _pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)
        return (h % np.uint64(nbuckets)).astype(np.int64)
    arr = (
        np.asarray(strings.to_numpy(zero_copy_only=False), dtype=object)
        if isinstance(strings, pa.Array)
        else np.asarray(strings, dtype=object)
    )
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64)
    return (pd.util.hash_array(arr) % np.uint64(nbuckets)).astype(np.int64)


def stable_bucket(s: str, nbuckets: int) -> int:
    return int(stable_bucket_array([s], nbuckets)[0])


def node_key_bucket(nk: str, nbuckets: int) -> int:
    """Bucket of a term-key node. Literals evaluate anywhere (they are
    never subjects); route them by their own key for determinism."""
    if nk.startswith("I"):
        return stable_bucket(nk[1:], nbuckets)
    if nk.startswith("B"):
        return stable_bucket("_:" + nk[1:], nbuckets)
    return stable_bucket(nk, nbuckets)


# ---------------------------------------------------------------------------
# inline-shape registry (deterministic walk → same keys on driver & workers)

def register_inline_shapes(schema: dict) -> dict:
    """Assign stable keys to anonymous nested Shape exprs of a ShEx schema."""
    inline: dict[str, dict] = {}
    counter = [0]

    def walk_se(se):
        if not isinstance(se, dict):
            return
        t = se.get("type")
        if t == "Shape" and "id" not in se:
            key = f"inline:{counter[0]}"
            counter[0] += 1
            inline[key] = se
            se["_dist_key"] = key
        for k in ("shapeExprs",):
            for sub in se.get(k, []) or []:
                walk_se(sub)
        if isinstance(se.get("shapeExpr"), dict):
            walk_se(se["shapeExpr"])
        if isinstance(se.get("expression"), dict):
            walk_te(se["expression"])

    def walk_te(te):
        if not isinstance(te, dict):
            return
        for sub in te.get("expressions", []) or []:
            walk_te(sub)
        if isinstance(te.get("valueExpr"), dict):
            walk_se(te["valueExpr"])

    for lbl in sorted(schema.get("shapes", {})):
        walk_se(schema["shapes"][lbl])
    if isinstance(schema.get("start"), dict):
        walk_se(schema["start"])
    schema["inline"] = inline
    return schema


def schema_has_inverse(engine: str, schema: dict) -> bool:
    """Does the schema contain any inverse constraint (ShEx ^p TCs or
    SHACL inverse paths)? Determines whether reversed arc copies and
    literal home-bucketing are needed."""
    if engine == "shex":
        found = [False]

        def walk_se(se):
            if found[0] or not isinstance(se, dict):
                return
            for sub in se.get("shapeExprs", []) or []:
                walk_se(sub)
            if isinstance(se.get("shapeExpr"), (dict, str)):
                walk_se(se["shapeExpr"]) if isinstance(se["shapeExpr"], dict) else None
            if se.get("expression") is not None:
                walk_te(se["expression"])

        def walk_te(te):
            if found[0] or not isinstance(te, dict):
                return
            if te.get("type") == "TripleConstraint" and te.get("inverse"):
                found[0] = True
                return
            for sub in te.get("expressions", []) or []:
                walk_te(sub)
            if isinstance(te.get("valueExpr"), dict):
                walk_se(te["valueExpr"])

        for se in schema.get("shapes", {}).values():
            walk_se(se)
        for te in schema.get("te_refs", {}).values():
            walk_te(te)
        if isinstance(schema.get("start"), dict):
            walk_se(schema["start"])
        return found[0]

    def path_has_inverse(path) -> bool:
        if not isinstance(path, dict):
            return False
        if "inverse" in path:
            return True
        for k in ("seq", "alt"):
            if k in path and any(path_has_inverse(p) for p in path[k]):
                return True
        for k in ("zeroOrMore", "oneOrMore", "zeroOrOne"):
            if k in path and path_has_inverse(path[k]):
                return True
        return False

    for sh in schema.get("shapes", {}).values():
        if sh and path_has_inverse(sh.get("path")):
            return True
    return False


class _NeedRemote(Exception):
    pass


def _needs_neighborhood(se, schema, _seen=None) -> bool:
    """Does evaluating this shapeExpr require the focus node's arcs?
    Pure node-constraint combinations are term-local and can run in any
    bucket; only exprs containing a Shape need co-location."""
    seen = _seen if _seen is not None else set()
    if isinstance(se, str):
        if se in seen:
            return False
        seen.add(se)
        target = schema["shapes"].get(se)
        return _needs_neighborhood(target, schema, seen) if target is not None else False
    if not isinstance(se, dict):
        return False
    t = se.get("type")
    if t in ("Shape", "ShapeExternal"):
        return True
    if t == "ShapeNot":
        return _needs_neighborhood(se["shapeExpr"], schema, seen)
    if t in ("ShapeAnd", "ShapeOr"):
        return any(_needs_neighborhood(s, schema, seen) for s in se["shapeExprs"])
    if t == "ShapeDecl":
        return _needs_neighborhood(se["shapeExpr"], schema, seen)
    return False


class _DistShEx(ShExValidator):
    """Bucket-local ShEx evaluator with cross-bucket dependency capture."""

    def __init__(self, schema, graph, assumptions, is_local, record_dep):
        super().__init__(schema, graph)
        self.assumptions = assumptions
        self.is_local = is_local
        self.record_dep = record_dep
        self.provisional = False

    def satisfies_label(self, node, label):
        nk = term_key(node)
        a = self.assumptions.get((nk, label))
        if a is not None:
            return a
        se = self.schema["shapes"].get(label)
        if se is not None and not _needs_neighborhood(se, self.schema):
            return super().satisfies_label(node, label)  # term-local
        if not self.is_local(node):
            self.record_dep(nk, label)
            self.provisional = True
            return True  # coinductive guess until the child's bucket answers
        return super().satisfies_label(node, label)

    def satisfies(self, node, se):
        if isinstance(se, dict) and se.get("type") == "Shape" and not self.is_local(node):
            key = se.get("_dist_key") or se.get("id")
            nk = term_key(node)
            a = self.assumptions.get((nk, key)) if key else None
            if a is not None:
                return a
            if key is None:
                raise _NeedRemote(f"unregistered inline shape for remote node {nk}")
            self.record_dep(nk, key)
            self.provisional = True
            return True
        return super().satisfies(node, se)


_REMOTE_NC_COMPONENT = "__remote_nonconform__"


def _remote_marker(focus_key: str, shape_key: str) -> dict:
    """Placeholder result for a remote nested property-shape violation:
    counts toward the parent's non-conformance but is filtered from the
    report table (the value node's home bucket reports the real rows)."""
    return {
        "focus": focus_key,
        "path": None,
        "value": None,
        "component": _REMOTE_NC_COMPONENT,
        "severity": "",
        "source": shape_key,
        "message": "",
    }


class _DistShacl(ShaclValidator):
    """Bucket-local SHACL evaluator with cross-bucket dependency capture.

    Three dependency kinds travel between buckets:
      * plain (node, shape)    — conformance probe (sh:node/not/and/...),
                                 answered with a boolean, never reported
      * (node, 'vshape:S')     — nested property-shape validation in REPORT
                                 context: the home bucket validates fully
                                 and reports its own rows; the answer back
                                 is just the boolean
      * (node, 'hop:dir:pred') — one elementary path hop: answered with
                                 the VALUE-KEY LIST of the node's local
                                 neighborhood, which lets sequence /
                                 alternative / closure paths expand as a
                                 bounded iterative BFS across rounds
      * (node, 'class:C')      — rdf:type membership probe
    """

    def __init__(
        self, schema, graph, assumptions, is_local_key, record_dep, reporting=False
    ):
        super().__init__(schema, graph)
        self.assumptions = assumptions
        self.is_local_key = is_local_key
        self.record_dep = record_dep
        self.provisional = False
        self.reporting = reporting
        self._subclass_closure = schema.get("subclass_closure", {})

    def conforms(self, focus_key, shape_key):
        a = self.assumptions.get((focus_key, shape_key))
        if a is not None:
            return a
        if not self.is_local_key(focus_key):
            self.record_dep(focus_key, shape_key)
            self.provisional = True
            return True
        return super().conforms(focus_key, shape_key)

    def validate_shape(self, focus_key, shape_key):
        if not self.is_local_key(focus_key):
            if not self.reporting:
                # probe context: only the boolean matters
                ok = self.conforms(focus_key, shape_key)
                return [] if ok else [_remote_marker(focus_key, shape_key)]
            pseudo = "vshape:" + shape_key
            a = self.assumptions.get((focus_key, pseudo))
            if isinstance(a, list):
                # the child's report rows, one copy per requesting parent
                return [dict(r) for r in a]
            if a is True:  # cycle-break default: assumed conforming
                return []
            self.record_dep(focus_key, pseudo)
            self.provisional = True
            return []
        return super().validate_shape(focus_key, shape_key)

    def _subclasses(self, cls_key):
        return set(self._subclass_closure.get(cls_key, [cls_key]))

    def _is_instance(self, node_key, cls_key):
        pseudo = "class:" + cls_key
        a = self.assumptions.get((node_key, pseudo))
        if a is not None:
            return a
        if not self.is_local_key(node_key):
            self.record_dep(node_key, pseudo)
            self.provisional = True
            return False
        return super()._is_instance(node_key, cls_key)

    # ---- property paths: elementary hops are locality-aware; the parent
    # class's seq/alt/zeroOrMore/oneOrMore/zeroOrOne machinery recurses
    # through self.path_values, so closures expand across buckets as a
    # bounded iterative BFS (one unanswered-hop layer per fixpoint round)
    def _hop(self, node_key: str, pred: str, inverse: bool) -> list[str]:
        if self.is_local_key(node_key):
            if inverse:
                return [
                    term_key(s) for p, s in self.graph.arcs_in(node_key) if p == pred
                ]
            return [term_key(o) for p, o in self.graph.arcs_out(node_key) if p == pred]
        hk = ("hop:inv:" if inverse else "hop:fwd:") + pred
        a = self.assumptions.get((node_key, hk))
        if a is not None:
            return list(a)
        self.record_dep(node_key, hk)
        self.provisional = True
        return []

    def path_values(self, focus_key, path):
        if "pred" in path:
            return self._hop(focus_key, path["pred"], False)
        if "inverse" in path and "pred" in path["inverse"]:
            return self._hop(focus_key, path["inverse"]["pred"], True)
        if "inverse" in path:
            # inversion distributes over every path constructor
            # (invert_path): evaluate forward over elementary inverse
            # hops, which the BFS dependency protocol expands across
            # buckets like any other hop
            from shaclex_ray.validate.shacl_local import invert_path

            return self.path_values(focus_key, invert_path(path["inverse"]))
        return super().path_values(focus_key, path)


# ---------------------------------------------------------------------------
# the one-time shuffle: split triple blocks into per-bucket sub-tables

@ray.remote
def _split_block_files(nbuckets: int, include_inverse: bool, files: list):
    """Split variant reading parquet shards DIRECTLY from storage (arc
    columns only) — the exchange input never stages through the object
    store."""
    import pyarrow.parquet as pq

    cols = ["subj", "pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang"]
    tbls = [pq.read_table(f, columns=cols) for f in files]
    return _split_block_plain(nbuckets, include_inverse, *tbls)


def _split_block_plain(nbuckets: int, include_inverse: bool, *tbls: pa.Table):
    """A group of triples blocks -> nbuckets sub-tables. Each sub-table
    carries a 'rev' column: false = outgoing arc stored at its subject's
    bucket, true = reversed copy stored at its (IRI/bnode) object's
    bucket. Taking a block *group* keeps the object-count at
    groups × nbuckets instead of blocks × nbuckets."""
    cols = ["subj", "pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang"]
    # zero-row blocks from upstream map_groups can carry an EMPTY schema
    # (no columns at all) — filter them before select()
    real = [t for t in tbls if t.num_rows > 0]
    if not real:
        real = [
            pa.table({c: pa.array([], pa.string()) for c in cols})
        ]
    base = pa.concat_tables([t.select(cols) for t in real]).combine_chunks()
    n = base.num_rows

    def partition(tbl: pa.Table, buckets: np.ndarray) -> list[pa.Table]:
        """Single-sort partition: argsort once, emit zero-copy slices."""
        order = np.argsort(buckets, kind="stable")
        sorted_tbl = tbl.take(pa.array(order))
        sorted_b = buckets[order]
        bounds = np.searchsorted(sorted_b, np.arange(nbuckets + 1))
        return [
            sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
            for i in range(nbuckets)
        ]

    fwd = base.append_column("rev", pa.array(np.zeros(n, dtype=bool)))
    fwd_b = stable_bucket_array(base.column("subj"), nbuckets)
    fwd_parts = partition(fwd, fwd_b)
    if not include_inverse:
        if nbuckets == 1:
            return fwd_parts[0]  # num_returns=1: return the table itself
        return tuple(fwd_parts)
    # reversed copies co-locate incoming arcs with their object node —
    # including literal objects (a literal focus with an inverse constraint
    # must see its arcs_in; bucketing matches node_key_bucket's 'L' branch)
    rev = base
    okind = rev.column("obj_kind").combine_chunks()
    olex = rev.column("obj_lex").combine_chunks()
    odt = rev.column("obj_dt").combine_chunks()
    olang = rev.column("obj_lang").combine_chunks()
    from shaclex_ray.terms import SEP as _SEP

    # vectorized node-key render (the exchange's per-arc work must be C
    # kernels, not a Python comprehension): bnode → "_:"+lex, iri → lex,
    # literal → "L"+lex+SEP+dt+SEP+lang — byte-identical to the scalar
    # node_key() so bucketing matches node_key_bucket's branches
    lit = pc.binary_join_element_wise(
        pc.binary_join_element_wise("L", olex, ""), odt, olang, _SEP
    )
    ostr = pc.if_else(
        pc.equal(okind, "bnode"),
        pc.binary_join_element_wise("_:", olex, ""),
        pc.if_else(pc.equal(okind, "iri"), olex, lit),
    )
    rev = rev.append_column("rev", pa.array(np.ones(rev.num_rows, dtype=bool)))
    rev_parts = partition(rev, stable_bucket_array(ostr, nbuckets))
    if nbuckets == 1:
        return pa.concat_tables([fwd_parts[0], rev_parts[0]])
    return tuple(
        pa.concat_tables([f, r]) for f, r in zip(fwd_parts, rev_parts)
    )


class _ArcIndex:
    """Arrow-native per-node arc index: rows stay COLUMNAR (sorted by a
    dictionary-encoded node key; group boundaries from one int argsort);
    Python tuples materialize only for the slice of an evaluated node.
    Buckets above ``spill_rows`` spill to an Arrow IPC file and reopen
    memory-mapped, so an oversized bucket pages through the OS cache
    instead of dying on worker heap (SURVEY.md dist docstring: "page
    buckets from the partitioned checkpoints")."""

    def __init__(self, tbl: pa.Table, keys: pa.Array, spill_path: str | None, spill_rows: int):
        dic = pc.dictionary_encode(keys)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        self._tbl = tbl.take(pa.array(order)).combine_chunks()
        sorted_codes = codes[order]
        nkeys = len(dic.dictionary)
        self._starts = np.searchsorted(sorted_codes, np.arange(nkeys + 1))
        # node-key → code lookup (one Python string per DISTINCT node, not
        # per arc — the only eager Python materialization)
        self._keys = dic.dictionary  # code → key (Arrow, zero-copy)
        self._code = {k: i for i, k in enumerate(dic.dictionary.to_pylist())}
        if spill_path is not None and self._tbl.num_rows > spill_rows:
            import pyarrow.feather as _feather

            _feather.write_feather(self._tbl, spill_path, compression="uncompressed")
            mm = pa.memory_map(spill_path)
            self._tbl = pa.ipc.open_file(mm).read_all()  # zero-copy mmap view

    def keys(self):
        return self._code.keys()

    @property
    def table(self) -> pa.Table:
        """The sorted columnar arc table (no node column — use
        ``keys_of_rows`` to recover the node key of a row index)."""
        return self._tbl

    def keys_of_rows(self, rows: np.ndarray) -> pa.Array:
        """Vectorized row-index → node-key lookup (rows into ``table``)."""
        if len(rows) == 0:
            return pa.array([], pa.string())
        codes = np.searchsorted(self._starts, rows, side="right") - 1
        return self._keys.take(pa.array(codes))

    def slice_of(self, key: str) -> pa.Table | None:
        i = self._code.get(key)
        if i is None:
            return None
        s, e = int(self._starts[i]), int(self._starts[i + 1])
        return self._tbl.slice(s, e - s)


class LazyBucketGraph:
    """Bucket-local neighborhood index, Arrow-native end-to-end.

    Construction: one dictionary-encode + int argsort per direction (C
    kernels); no up-front to_pylist of the arc columns. Python term
    tuples build lazily per evaluated node from a zero-copy table slice
    and are cached with a size cap (the 9.2M-row eager build was a 5-10×
    memory blowup)."""

    CACHE_CAP = 500_000  # cached nodes per direction before a coarse reset

    def __init__(self, spill_dir: str | None = None, spill_rows: int | None = None):
        self._parts: list[pa.Table] = []
        self._finalized = False
        self._spill_dir = spill_dir
        import os as _os

        self._spill_rows = spill_rows or int(
            _os.environ.get("SHACLEX_BUCKET_SPILL_ROWS", "4000000")
        )

    def add_part(self, tbl: pa.Table):
        self._parts.append(tbl)

    def _key_col(self, subj: pa.Array) -> pa.Array:
        is_b = pc.starts_with(subj, "_:")
        as_b = pc.binary_join_element_wise("B", pc.utf8_replace_slice(subj, 0, 2, ""), "")
        as_i = pc.binary_join_element_wise("I", subj, "")
        return pc.if_else(is_b, as_b, as_i)

    def finalize(self):
        if self._finalized:
            return
        self._finalized = True
        if self._parts:
            t = pa.concat_tables(self._parts).combine_chunks()
        else:
            t = pa.table(
                {
                    "subj": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "obj_kind": pa.array([], pa.string()),
                    "obj_lex": pa.array([], pa.string()),
                    "obj_dt": pa.array([], pa.string()),
                    "obj_lang": pa.array([], pa.string()),
                    "rev": pa.array([], pa.bool_()),
                }
            )
        self._parts = None
        rev_mask = t.column("rev").combine_chunks()
        n_rev = pc.sum(rev_mask).as_py() or 0
        if n_rev == 0:
            fwd, rev = t, t.slice(0, 0)
        else:
            fwd = t.filter(pc.invert(rev_mask))
            rev = t.filter(rev_mask)

        import os as _os

        def spath(tag):
            if self._spill_dir is None:
                return None
            _os.makedirs(self._spill_dir, exist_ok=True)
            return _os.path.join(self._spill_dir, f"{tag}.arrow")

        fkeys = self._key_col(fwd.column("subj").combine_chunks())
        self._fwd = _ArcIndex(
            fwd.select(["pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang"]),
            fkeys,
            spath("fwd"),
            self._spill_rows,
        )

        okind = rev.column("obj_kind").combine_chunks()
        olex = rev.column("obj_lex").combine_chunks()
        odt = rev.column("obj_dt").combine_chunks()
        olang = rev.column("obj_lang").combine_chunks()
        from shaclex_ray.terms import SEP as _SEP

        lit_key = pc.binary_join_element_wise(
            pc.binary_join_element_wise("L", olex, ""), odt, olang, _SEP
        )
        rkeys = pc.if_else(
            pc.equal(okind, "literal"),
            lit_key,
            pc.if_else(
                pc.equal(okind, "bnode"),
                pc.binary_join_element_wise("B", olex, ""),
                pc.binary_join_element_wise("I", olex, ""),
            ),
        )
        self._rev = _ArcIndex(
            rev.select(["subj", "pred"]), rkeys, spath("rev"), self._spill_rows
        )

        self._out_cache: dict[str, list] = {}
        self._in_cache: dict[str, list] = {}

    def arcs_out(self, key: str) -> list:
        got = self._out_cache.get(key)
        if got is None:
            sub = self._fwd.slice_of(key)
            if sub is None:
                got = []
            else:
                d = sub.to_pydict()
                got = []
                for p, k, lx, dt, lg in zip(
                    d["pred"], d["obj_kind"], d["obj_lex"], d["obj_dt"], d["obj_lang"]
                ):
                    if k == "iri":
                        o = ("iri", lx)
                    elif k == "bnode":
                        o = ("bnode", lx)
                    else:
                        o = ("lit", lx, dt, lg)
                    got.append((p, o))
            if len(self._out_cache) >= self.CACHE_CAP:
                self._out_cache.clear()  # coarse reset keeps memory bounded
            self._out_cache[key] = got
        return got

    def arcs_in(self, key: str) -> list:
        got = self._in_cache.get(key)
        if got is None:
            sub = self._rev.slice_of(key)
            if sub is None:
                got = []
            else:
                d = sub.to_pydict()
                got = []
                for s, p in zip(d["subj"], d["pred"]):
                    sterm = ("bnode", s[2:]) if s.startswith("_:") else ("iri", s)
                    got.append((p, sterm))
            if len(self._in_cache) >= self.CACHE_CAP:
                self._in_cache.clear()
            self._in_cache[key] = got
        return got

    # attribute views used by the in-memory validators' helper paths
    @property
    def by_subj(self):
        return {k: self.arcs_out(k) for k in self._fwd.keys()}

    @property
    def by_obj(self):
        return {k: self.arcs_in(k) for k in self._rev.keys()}


# ---------------------------------------------------------------------------
# vectorized flat-SHACL fast path (SURVEY.md M8 at bucket granularity):
# shapes whose property shapes are pred-path + scalar components evaluate
# for ALL pending focus nodes at once with Arrow/numpy kernels — the
# per-focus Python walk remains the semantics oracle and the fallback.

from shaclex_ray.terms import SEP as _TSEP
from shaclex_ray.terms import SH as _SH
from shaclex_ray.terms import XSD as _XSD

# datatypes whose lexical validity is vectorizable. ONLY xsd:string (any
# lexical form is valid) — numeric/boolean regexes differ subtly between
# Python re (unicode digits, '$' matches before a trailing newline) and
# Arrow's RE2, so those shapes take the per-focus Python path instead of
# risking a verdict divergence.
_VEC_DATATYPE_RE = {
    _XSD + "string": None,
}

_NODEKIND_ALLOWED = {
    _SH + "IRI": ("iri",),
    _SH + "BlankNode": ("bnode",),
    _SH + "Literal": ("literal",),
    _SH + "BlankNodeOrIRI": ("bnode", "iri"),
    _SH + "BlankNodeOrLiteral": ("bnode", "literal"),
    _SH + "IRIOrLiteral": ("iri", "literal"),
}


_split_block = ray.remote(_split_block_plain)


def flat_shacl_profile(schema: dict) -> dict[str, list]:
    """shape_key -> list of vectorizable property profiles (absent = use
    the per-focus Python path)."""
    out: dict[str, list] = {}
    for skey, sh in schema.get("shapes", {}).items():
        if not sh or sh.get("path") is not None:
            continue
        if sh.get("deactivated") or sh.get("closed") or sh.get("components"):
            continue
        props = []
        ok = True
        for pk in sh.get("properties", []):
            psh = schema["shapes"].get(pk)
            if (
                not psh
                or psh.get("deactivated")
                or psh.get("closed")
                or psh.get("properties")
                or not (psh.get("path") and set(psh["path"]) == {"pred"})
            ):
                ok = False
                break
            prof = {
                "pred": psh["path"]["pred"],
                "key": pk,
                "severity": psh["severity"],
                "message": psh["messages"][0] if psh["messages"] else "",
                "checks": [],
            }
            for kind, params in psh["components"]:
                if kind in ("minCount", "maxCount", "minLength", "maxLength"):
                    prof["checks"].append((kind, params["n"]))
                elif kind == "datatype" and params["iri"] in _VEC_DATATYPE_RE:
                    prof["checks"].append((kind, params["iri"]))
                elif kind == "nodeKind" and params["iri"] in _NODEKIND_ALLOWED:
                    prof["checks"].append((kind, params["iri"]))
                elif kind == "class":
                    prof["checks"].append((kind, params["cls"]))
                elif kind == "pattern":
                    prof["checks"].append(
                        (kind, (params["pattern"], params.get("flags", "")))
                    )
                elif kind in (
                    "minInclusive", "minExclusive", "maxInclusive", "maxExclusive",
                ):
                    prof["checks"].append((kind, params["value"]))
                elif kind == "in":
                    prof["checks"].append((kind, list(params["values"])))
                elif kind == "hasValue":
                    prof["checks"].append((kind, params["value"]))
                else:
                    ok = False
                    break
            if not ok:
                break
            props.append(prof)
        if ok:
            out[skey] = props
    return out


def _obj_key_col(sub: pa.Table) -> pa.Array:
    """Vectorized object term-key column ('I…'/'B…'/'L…')."""
    okind = sub.column("obj_kind").combine_chunks()
    olex = sub.column("obj_lex").combine_chunks()
    odt = sub.column("obj_dt").combine_chunks()
    olang = sub.column("obj_lang").combine_chunks()
    lit = pc.binary_join_element_wise(
        pc.binary_join_element_wise("L", olex, ""), odt, olang, _TSEP
    )
    return pc.if_else(
        pc.equal(okind, "literal"),
        lit,
        pc.if_else(
            pc.equal(okind, "bnode"),
            pc.binary_join_element_wise("B", olex, ""),
            pc.binary_join_element_wise("I", olex, ""),
        ),
    )


def _arrow_regex_safe(pattern: str, flags: str) -> bool:
    """True when ``pattern`` is in the dialect subset where Arrow's RE2
    and Python's ``re`` provably agree: literal chars, anchors,
    quantifiers, alternation, groups, char classes, and escapes of regex
    metacharacters only. Shorthand classes (\\d \\w \\s), lookaround,
    backrefs and the x flag differ (or are unsupported) in RE2 — those
    take the exact per-distinct Python path instead."""
    if any(c not in "ims" for c in flags or ""):
        return False
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n or pattern[i + 1] not in "\\.^$*+?()[]{}|/-":
                return False
            i += 2
            continue
        if c == "(" and pattern[i : i + 2] == "(?" and pattern[i : i + 3] != "(?:":
            return False
        i += 1
    return True


def _num_bound_ok(vk: str, kind: str, blex: str, bdt: str) -> bool:
    """Exact SHACL range-facet check for one value term-key (the scalar
    path's _cmp_term_to_bound semantics, shacl_local.py)."""
    from shaclex_ray.validate.shacl_local import _cmp_term_to_bound

    c = _cmp_term_to_bound(key_to_term(vk), blex, bdt)
    if c is None:
        return False
    return {
        "minInclusive": c >= 0,
        "minExclusive": c > 0,
        "maxInclusive": c <= 0,
        "maxExclusive": c < 0,
    }[kind]


def flat_shex_profile(schema: dict) -> dict[str, list]:
    """ShEx label -> list of vectorizable TC profiles, for shapes that are
    a plain (optionally EXTRA) flat EachOf of forward TripleConstraints
    with pairwise-distinct predicates — the counting decomposition
    (SURVEY.md C4) evaluated with Arrow kernels. valueExprs: None / plain
    shape refs (probe protocol) / NodeConstraints over ALL facet families
    (nodeKind, datatype, value sets, pattern, length, numeric,
    total/fractiondigits) — the simple subsets run fully Arrow-vectorized,
    the rest evaluate exactly once per DISTINCT value via the
    conformance-verified scalar and broadcast by dictionary codes."""
    out: dict[str, list] = {}
    if schema.get("_matching") == "greedy":
        # greedy matching is arc-order-sensitive; the counting kernels are
        # order-free — route every shape through the exact per-focus walk
        # (greedy schemas with distinct predicates would coincide, but the
        # suite pins order-sensitive cases; keep the lanes unambiguous)
        return out
    for lbl, se in schema.get("shapes", {}).items():
        if not isinstance(se, dict) or se.get("type") != "Shape":
            continue
        if se.get("closed") or se.get("semActs"):
            continue
        expr = se.get("expression")
        if expr is None or isinstance(expr, str):
            continue
        if expr.get("semActs"):
            # semantic actions dispatch per matched triple / group instance
            # — counting can't see them; take the exact per-focus walk
            continue
        if expr.get("type") == "TripleConstraint":
            tcs = [expr]
        elif expr.get("type") == "EachOf" and (
            expr.get("min", 1) == 1 and expr.get("max", 1) == 1
        ):
            tcs = expr.get("expressions", [])
            if not all(
                isinstance(t, dict) and t.get("type") == "TripleConstraint"
                for t in tcs
            ):
                continue
        else:
            continue
        preds = [t["predicate"] for t in tcs]
        if len(set(preds)) != len(preds):
            continue
        extra = set(se.get("extra", []) or [])
        profs = []
        ok = True
        for tc in tcs:
            if tc.get("inverse") or "id" in tc or tc.get("semActs"):
                ok = False
                break
            prof = {
                "pred": tc["predicate"],
                "min": tc.get("min", 1),
                "max": tc.get("max", 1),
                "extra": tc["predicate"] in extra,
                "check": None,  # None | ("nc", nc-dict masks) | ("ref", label)
            }
            ve = tc.get("valueExpr")
            if ve is None:
                pass
            elif isinstance(ve, str):
                prof["check"] = ("ref", ve)
            elif isinstance(ve, dict) and ve.get("type") == "NodeConstraint":
                known = {
                    "type", "nodeKind", "datatype", "values",
                    "length", "minlength", "maxlength", "pattern", "flags",
                    "mininclusive", "minexclusive", "maxinclusive",
                    "maxexclusive", "totaldigits", "fractiondigits",
                }
                if set(ve) - known:
                    ok = False
                    break
                prof["check"] = ("nc", ve)
            else:
                ok = False
                break
            profs.append(prof)
        if ok:
            out[lbl] = profs
    return out


def flat_shex_eval_kernel(
    profile: list,
    node_keys: list[str],
    graph: "LazyBucketGraph",
    ref_probe,
):
    """Vectorized flat-ShEx counting evaluation (C4 decomposition at
    bucket granularity): per TC, count matching arcs and arcs whose value
    satisfies the valueExpr; non-EXTRA predicates need every arc to match
    AND the total in [min,max]; EXTRA predicates bound only the satisfying
    count (exactly ShExValidator._match_flat, fuzzed in
    tests/test_property.py). ``ref_probe(value_key, label)`` returns
    True / False / "dep". Returns (conforms: bool[n] , blocked: {pos: deps})."""
    idx = graph._fwd
    n = len(node_keys)
    # vectorized ragged-range gather + column-at-a-time lazy takes (same
    # allocation discipline as flat_eval_kernel: Arrow columns for the
    # pred-matching rows only, no object-dtype numpy)
    codes = np.fromiter(
        (idx._code.get(nk, -1) for nk in node_keys), dtype=np.int64, count=n
    )
    have = np.flatnonzero(codes >= 0)
    if len(have):
        starts = idx._starts[codes[have]]
        lens = idx._starts[codes[have] + 1] - starts
        total = int(lens.sum())
        offsets = np.repeat(np.cumsum(lens) - lens, lens)
        rows = np.repeat(starts, lens) + (np.arange(total) - offsets)
        subj_of_row = np.repeat(have, lens)
        pred_np = idx._tbl.column("pred").take(pa.array(rows)).combine_chunks()
    else:
        rows = np.zeros(0, dtype=np.int64)
        subj_of_row = rows
        pred_np = None

    ok_nodes = np.ones(n, dtype=bool)
    blocked: dict[int, set] = {}
    probe_memo: dict[tuple[str, str], object] = {}

    for prof in profile:
        if pred_np is not None:
            pmask = pc.equal(pred_np, prof["pred"]).to_numpy(zero_copy_only=False)
        else:
            pmask = np.zeros(0, dtype=bool)
        c_tot = np.zeros(n, dtype=np.int64)
        np.add.at(c_tot, subj_of_row[pmask], 1)

        sel = np.flatnonzero(pmask)
        subj_sel = subj_of_row[sel]
        sel_pa = pa.array(rows[sel]) if len(sel) else None
        _pcols: dict[str, pa.Array] = {}

        def getpcol(name: str, _sp=sel_pa, _c=_pcols):
            if _sp is None:
                return None
            a = _c.get(name)
            if a is None:
                a = _c[name] = idx._tbl.column(name).take(_sp).combine_chunks()
            return a

        _vk: list = []

        def vk_arr(_sp=sel_pa, _vk=_vk):
            if not _vk:
                _vk.append(
                    _obj_key_col(idx._tbl.take(_sp))
                    if _sp is not None
                    else pa.array([], pa.string())
                )
            return _vk[0]

        check = prof["check"]
        _nc_fast = (
            check is not None
            and check[0] == "nc"
            and set(check[1]) <= {"type", "nodeKind", "datatype", "values"}
            and check[1].get("datatype") in (None, _XSD + "string")
            and all(isinstance(v, str) for v in check[1].get("values", []))
        )
        if check is None or sel_pa is None:
            sat_local = np.ones(len(sel), dtype=bool)
        elif check[0] == "nc" and not _nc_fast:
            # full facet families (pattern / length / numeric / typed
            # datatypes / literal value sets): exact per-DISTINCT-value
            # evaluation via the conformance-verified scalar, broadcast
            # to arcs by dictionary codes — per-vocabulary Python, never
            # per-row
            from shaclex_ray.validate.nodecheck import check_node_constraint

            nc = check[1]
            dic = pc.dictionary_encode(vk_arr())
            dvals = dic.dictionary.to_pylist()
            if dvals:
                dcodes = dic.indices.to_numpy(zero_copy_only=False)
                okd = np.fromiter(
                    (check_node_constraint(key_to_term(v), nc) for v in dvals),
                    dtype=bool,
                    count=len(dvals),
                )
                sat_local = okd[dcodes]
            else:
                sat_local = np.ones(0, dtype=bool)
        elif check[0] == "nc":
            nc = check[1]
            ga = None

            def andm(x):
                nonlocal ga
                ga = x if ga is None else pc.and_(ga, x)

            okind = getpcol("obj_kind")
            nk_kind = nc.get("nodeKind")
            if nk_kind == "iri":
                andm(pc.equal(okind, "iri"))
            elif nk_kind == "bnode":
                andm(pc.equal(okind, "bnode"))
            elif nk_kind == "literal":
                andm(pc.equal(okind, "literal"))
            elif nk_kind == "nonliteral":
                andm(pc.not_equal(okind, "literal"))
            if "datatype" in nc:  # xsd:string only (profile-enforced)
                andm(
                    pc.and_(
                        pc.equal(okind, "literal"),
                        pc.equal(getpcol("obj_dt"), nc["datatype"]),
                    )
                )
            if "values" in nc:
                allowed = pa.array(["I" + v for v in nc["values"]])
                andm(pc.is_in(vk_arr(), value_set=allowed))
            if ga is None:
                sat_local = np.ones(len(sel), dtype=bool)
            else:
                sat_local = pc.fill_null(ga, False).to_numpy(zero_copy_only=False)
        else:  # ("ref", label): resolve per DISTINCT value via the probe
            label = check[1]
            sat_local = np.ones(len(sel), dtype=bool)
            dic = pc.dictionary_encode(vk_arr())
            dvals = dic.dictionary.to_pylist()
            dcodes = dic.indices.to_numpy(zero_copy_only=False)
            st_false = np.zeros(len(dvals), dtype=bool)
            dep_dis = []
            for di, v in enumerate(dvals):
                st = probe_memo.get((v, label))
                if st is None:
                    st = ref_probe(v, label)
                    probe_memo[(v, label)] = st
                if st == "dep":
                    dep_dis.append(di)
                elif st is False:
                    st_false[di] = True
            sat_local[st_false[dcodes]] = False
            if dep_dis:
                for j in np.flatnonzero(np.isin(dcodes, dep_dis)):
                    blocked.setdefault(int(subj_sel[j]), set()).add(
                        (dvals[dcodes[j]], label)
                    )

        c_sat = np.zeros(n, dtype=np.int64)
        np.add.at(c_sat, subj_sel[sat_local], 1)
        mn, mx = prof["min"], prof["max"]
        if prof["extra"]:
            tc_ok = c_sat >= mn
            if mx != -1:
                tc_ok &= c_sat <= mx
        else:
            tc_ok = (c_sat == c_tot) & (c_tot >= mn)
            if mx != -1:
                tc_ok &= c_tot <= mx
        ok_nodes &= tc_ok

    return ok_nodes, blocked


def flat_eval_kernel(
    profile: list,
    node_keys: list[str],
    graph: "LazyBucketGraph",
    assumptions: dict,
    is_local_key,
    is_instance_fn,
):
    """Vectorized flat-SHACL evaluation of MANY focus nodes over the
    bucket's columnar arc table: Arrow/numpy kernels instead of a
    per-focus Python walk. Returns (viol: bool[n], blocked: {pos: deps},
    reports: list-of-row-lists per node). Semantics are pinned to
    ShaclValidator.validate_shape (fuzzed in tests/test_property.py)."""
    idx = graph._fwd
    n = len(node_keys)

    # gather each focus node's arc-row range from the sorted index —
    # vectorized ragged-range expansion (no per-node np.arange)
    codes = np.fromiter(
        (idx._code.get(nk, -1) for nk in node_keys), dtype=np.int64, count=n
    )
    have = np.flatnonzero(codes >= 0)
    if len(have):
        starts = idx._starts[codes[have]]
        lens = idx._starts[codes[have] + 1] - starts
        total = int(lens.sum())
        offsets = np.repeat(np.cumsum(lens) - lens, lens)
        rows = np.repeat(starts, lens) + (np.arange(total) - offsets)
        subj_of_row = np.repeat(have, lens)
    else:
        rows = np.zeros(0, dtype=np.int64)
        subj_of_row = rows

    # column-at-a-time lazy gather: only the columns a check touches are
    # taken, and they stay ARROW (no object-dtype numpy, no per-row Python
    # strings) — the per-round transient heap is O(selected columns), not
    # O(7-column table + object arrays)
    rows_pa = pa.array(rows) if len(rows) else None
    _cols: dict[str, pa.Array] = {}

    def getcol(name: str) -> pa.Array | None:
        if rows_pa is None:
            return None
        a = _cols.get(name)
        if a is None:
            a = _cols[name] = idx._tbl.column(name).take(rows_pa).combine_chunks()
        return a

    def vkeys_for(sel_rows) -> list[str]:
        """Object term-keys for a SUBSET of gathered rows (built on the
        slice only — never materialized for the whole arc range)."""
        if len(sel_rows) == 0:
            return []
        sub = idx._tbl.take(pa.array(rows[np.asarray(sel_rows)]))
        return _obj_key_col(sub).to_pylist()

    pred_np = getcol("pred")

    viol = np.zeros(n, dtype=bool)
    blocked: dict[int, set] = {}  # node position -> unresolved deps
    reports: list[list] = [[] for _ in range(n)]
    inst_memo: dict[tuple[str, str], object] = {}
    # pos -> [(value, class param, profile index)] for dep-unresolved class
    # checks: lets later rounds resolve JUST the deps from a stored partial
    # instead of re-running the whole kernel (see BucketWorker._flat_eval)
    pending_class: dict[int, list] = {}

    for prof_i, prof in enumerate(profile):
        pred = prof["pred"]
        if pred_np is not None:
            pmask = pc.equal(pred_np, pred).to_numpy(zero_copy_only=False)
        else:
            pmask = np.zeros(0, dtype=bool)
        counts = np.zeros(n, dtype=np.int64)
        np.add.at(counts, subj_of_row[pmask], 1)

        # value-level checks see only THIS predicate's rows (sel):
        # column takes shrink from |gathered rows| to |pred matches|
        sel = np.flatnonzero(pmask)
        sel_pa = pa.array(rows[sel]) if len(sel) else None
        _pcols: dict[str, pa.Array] = {}

        def getpcol(name: str) -> pa.Array | None:
            if sel_pa is None:
                return None
            a = _pcols.get(name)
            if a is None:
                a = _pcols[name] = (
                    idx._tbl.column(name).take(sel_pa).combine_chunks()
                )
            return a

        _vkc: list = []

        def vk_all(_sp=sel_pa, _v=_vkc):
            """Object term-keys for ALL of this predicate's rows (built
            once per profile, shared by the value-facet checks)."""
            if not _v:
                _v.append(
                    _obj_key_col(idx._tbl.take(_sp))
                    if _sp is not None
                    else pa.array([], pa.string())
                )
            return _v[0]

        def emit_rows(node_positions, component, values=None):
            for j, pos in enumerate(node_positions):
                reports[pos].append(
                    {
                        "focus": node_keys[pos],
                        "path": pred,
                        "value": values[j] if values is not None else None,
                        "component": _component_iri(component),
                        "severity": prof["severity"],
                        "source": prof["key"],
                        "message": prof["message"],
                    }
                )

        for kind, param in prof["checks"]:
            if kind == "minCount":
                bad = np.flatnonzero(counts < param)
                viol[bad] = True
                emit_rows(bad, "MinCount")
            elif kind == "maxCount":
                bad = np.flatnonzero(counts > param)
                viol[bad] = True
                emit_rows(bad, "MaxCount")
            elif kind == "datatype":
                rx = _VEC_DATATYPE_RE[param]
                okind = getpcol("obj_kind")
                if okind is None:
                    bad_local = np.zeros(0, dtype=np.int64)
                else:
                    good_a = pc.and_(
                        pc.equal(okind, "literal"),
                        pc.equal(getpcol("obj_dt"), param),
                    )
                    if rx is not None:
                        good_a = pc.and_(
                            good_a,
                            pc.match_substring_regex(getpcol("obj_lex"), rx),
                        )
                    good = pc.fill_null(good_a, False).to_numpy(
                        zero_copy_only=False
                    )
                    bad_local = np.flatnonzero(~good)
                if len(bad_local):
                    bad_rows = sel[bad_local]
                    viol[subj_of_row[bad_rows]] = True
                    emit_rows(
                        subj_of_row[bad_rows],
                        "Datatype",
                        values=vkeys_for(bad_rows),
                    )
            elif kind == "nodeKind":
                allowed = _NODEKIND_ALLOWED[param]
                okind = getpcol("obj_kind")
                if okind is None:
                    bad_local = np.zeros(0, dtype=np.int64)
                else:
                    good = pc.is_in(
                        okind, value_set=pa.array(list(allowed))
                    ).to_numpy(zero_copy_only=False)
                    bad_local = np.flatnonzero(~good)
                if len(bad_local):
                    bad_rows = sel[bad_local]
                    viol[subj_of_row[bad_rows]] = True
                    emit_rows(
                        subj_of_row[bad_rows],
                        "NodeKind",
                        values=vkeys_for(bad_rows),
                    )
            elif kind == "class":
                crow = sel
                if not len(crow):
                    continue
                vk = vkeys_for(crow)
                okind_small = getpcol("obj_kind").to_pylist()
                # literal values violate outright; iri/bnode values need
                # an instance check (local lookup / cross-bucket dep),
                # resolved once per DISTINCT value
                for j, r in enumerate(crow):
                    v = vk[j]
                    pos = subj_of_row[r]
                    if okind_small[j] == "literal":
                        viol[pos] = True
                        emit_rows([pos], "Class", values=[v])
                        continue
                    memo_key = (v, param)
                    st = inst_memo.get(memo_key)
                    if st is None:
                        a = assumptions.get((v, "class:" + param))
                        if a is not None:
                            st = bool(a)
                        elif is_local_key(v):
                            st = is_instance_fn(v, param)
                        else:
                            st = "dep"
                        inst_memo[memo_key] = st
                    if st == "dep":
                        blocked.setdefault(pos, set()).add((v, "class:" + param))
                        pending_class.setdefault(pos, []).append(
                            (v, param, prof_i)
                        )
                    elif st is False:
                        viol[pos] = True
                        emit_rows([pos], "Class", values=[v])
            elif kind in ("minLength", "maxLength"):
                okind = getpcol("obj_kind")
                if okind is None:
                    continue
                ln = pc.utf8_length(getpcol("obj_lex")).to_numpy(
                    zero_copy_only=False
                )
                good = (ln >= param) if kind == "minLength" else (ln <= param)
                good &= pc.not_equal(okind, "bnode").to_numpy(zero_copy_only=False)
                bad_local = np.flatnonzero(~good)
                if len(bad_local):
                    bad_rows = sel[bad_local]
                    viol[subj_of_row[bad_rows]] = True
                    emit_rows(
                        subj_of_row[bad_rows],
                        kind[0].upper() + kind[1:],
                        values=pc.take(vk_all(), pa.array(bad_local)).to_pylist(),
                    )
            elif kind == "pattern":
                okind = getpcol("obj_kind")
                if okind is None:
                    continue
                pat, pflags = param
                import re as _re

                try:
                    rx = compile_pattern(pat, pflags)
                except _re.error:
                    rx = None
                lex = getpcol("obj_lex")
                if rx is None:
                    good = np.zeros(len(sel), dtype=bool)
                elif _arrow_regex_safe(pat, pflags):
                    apat = ("(?" + pflags + ")" if pflags else "") + pat
                    good = pc.fill_null(
                        pc.match_substring_regex(lex, apat), False
                    ).to_numpy(zero_copy_only=False)
                else:
                    # exact per-DISTINCT-lexical Python regex, broadcast
                    # by dictionary codes (vocabulary-bounded, not per-row)
                    dic = pc.dictionary_encode(lex)
                    dvals = dic.dictionary.to_pylist()
                    okd = np.fromiter(
                        (rx.search(s) is not None for s in dvals),
                        dtype=bool,
                        count=len(dvals),
                    )
                    good = okd[dic.indices.to_numpy(zero_copy_only=False)]
                if rx is not None:
                    good &= pc.not_equal(okind, "bnode").to_numpy(
                        zero_copy_only=False
                    )
                bad_local = np.flatnonzero(~good)
                if len(bad_local):
                    bad_rows = sel[bad_local]
                    viol[subj_of_row[bad_rows]] = True
                    emit_rows(
                        subj_of_row[bad_rows],
                        "Pattern",
                        values=pc.take(vk_all(), pa.array(bad_local)).to_pylist(),
                    )
            elif kind in (
                "minInclusive", "minExclusive", "maxInclusive", "maxExclusive",
            ):
                if sel_pa is None:
                    continue
                blex, bdt = param
                dic = pc.dictionary_encode(vk_all())
                dvals = dic.dictionary.to_pylist()
                if not dvals:
                    continue
                okd = np.fromiter(
                    (_num_bound_ok(v, kind, blex, bdt) for v in dvals),
                    dtype=bool,
                    count=len(dvals),
                )
                good = okd[dic.indices.to_numpy(zero_copy_only=False)]
                bad_local = np.flatnonzero(~good)
                if len(bad_local):
                    bad_rows = sel[bad_local]
                    viol[subj_of_row[bad_rows]] = True
                    emit_rows(
                        subj_of_row[bad_rows],
                        kind[0].upper() + kind[1:],
                        values=pc.take(vk_all(), pa.array(bad_local)).to_pylist(),
                    )
            elif kind == "in":
                if sel_pa is None:
                    continue
                good = pc.is_in(
                    vk_all(), value_set=pa.array(param, pa.string())
                ).to_numpy(zero_copy_only=False)
                bad_local = np.flatnonzero(~good)
                if len(bad_local):
                    bad_rows = sel[bad_local]
                    viol[subj_of_row[bad_rows]] = True
                    emit_rows(
                        subj_of_row[bad_rows],
                        "In",
                        values=pc.take(vk_all(), pa.array(bad_local)).to_pylist(),
                    )
            elif kind == "hasValue":
                has = np.zeros(n, dtype=bool)
                if sel_pa is not None:
                    m = pc.equal(vk_all(), param).to_numpy(zero_copy_only=False)
                    has[subj_of_row[sel[m]]] = True
                bad = np.flatnonzero(~has)
                viol[bad] = True
                emit_rows(bad, "HasValue")

    return viol, blocked, reports, pending_class


@ray.remote
class BucketWorker:
    """Persistent per-bucket evaluator: the neighborhood index AND the
    bucket's pending worklist live here across rounds (schema compiled once
    per actor — SURVEY.md A1/A2). The driver only routes the (small)
    cross-bucket dependency traffic, so its per-round work is
    O(#dependencies + #buckets), independent of focus-pair count."""

    def __init__(
        self, schema_ref, engine: str, nbuckets: int, bucket_id: int,
        spill_rows: int | None = None,
    ):
        self.schema = ray.get(schema_ref) if isinstance(schema_ref, ray.ObjectRef) else schema_ref
        self.engine = engine
        self.nbuckets = nbuckets
        self.bucket_id = bucket_id
        import tempfile

        # oversized buckets spill their sorted arc table here and reopen
        # memory-mapped (degrade to OS paging instead of dying on heap)
        self._spill_dir = tempfile.mkdtemp(prefix=f"shaclex-b{bucket_id}-")
        self.graph = LazyBucketGraph(
            spill_dir=self._spill_dir, spill_rows=spill_rows
        )
        self.pending: dict[tuple[str, str], bool] = {}
        self.typing: dict[tuple[str, str], str] = {}
        self.focus_flags: dict[tuple[str, str], bool] = {}
        # pairs other buckets asked for — ONLY their answers cross the
        # driver (the focus typing never leaves the actor until collect)
        self.requested: set[tuple[str, str]] = set()
        self.assumptions: dict[tuple[str, str], bool] = {}
        self.reports: list[dict] = []
        # pair -> unanswered deps it is blocked on (skip re-evaluation until
        # one of them gets an assumption — semi-naive delta, SURVEY.md §7.4)
        self.blocked_on: dict[tuple[str, str], set] = {}
        # node-key -> is-local memo (the scalar stable-hash is ~50µs; value
        # nodes repeat heavily across focus pairs)
        self._local_cache: dict[str, bool] = {}
        # vectorizable-shape profiles (computed lazily once per actor)
        self._flat_profiles: dict[str, list] | None = None
        self._flat_shex_profiles: dict[str, list] | None = None
        # flat pair -> (viol_so_far, report rows, unresolved class deps):
        # later rounds finish from here instead of re-running the kernel
        self._flat_partial: dict[tuple[str, str], tuple] = {}

    def load(self, *parts: pa.Table) -> int:
        n = 0
        for tbl in parts:
            self.graph.add_part(tbl)
            n += tbl.num_rows
        self.graph.finalize()
        # the index (plus whatever a REUSED worker process carried in from
        # earlier task executions) is long-lived: freeze it out of the
        # cyclic GC so the round kernels' allocations don't pay repeated
        # gen2 scans over static objects. (Measured: modest — the dominant
        # round cost was transient page-fault volume in the flat kernels,
        # fixed by the column-at-a-time takes in flat_eval_kernel.)
        import gc

        gc.collect()
        gc.freeze()
        return n

    # ---- in-bucket SHACL target derivation (focus_tasks="shacl-targets"):
    # the bucket holds every outgoing arc of its subjects, so subject-side
    # targets (targetClass / implicit class / targetSubjectsOf) resolve and
    # enqueue LOCALLY; only rdfs:subClassOf rows (tiny) and
    # targetObjectsOf pairs (object nodes may live elsewhere) return to
    # the driver. Replaces a full second scan of the input Dataset.

    def subclass_rows(self) -> pa.Table:
        """(child_key, parent_key) pairs from this bucket's forward arcs."""
        idx_obj = self.graph._fwd
        t = idx_obj.table
        mask = pc.equal(t.column("pred"), RDFS_SUBCLASS).combine_chunks()
        rows = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
        if len(rows) == 0:
            return pa.table(
                {"child": pa.array([], pa.string()), "parent": pa.array([], pa.string())}
            )
        child = idx_obj.keys_of_rows(rows)
        sub = t.take(pa.array(rows))
        parent = pc.binary_join_element_wise(
            pc.if_else(
                pc.equal(sub.column("obj_kind").combine_chunks(), "iri"), "I", "B"
            ),
            sub.column("obj_lex").combine_chunks(),
            "",
        )
        return pa.table({"child": child, "parent": parent})

    def derive_targets(self, spec: dict, closure: dict) -> pa.Table:
        """Scan the local arc index for target matches; enqueue local
        (subject-side) pairs directly, return object-side pairs for the
        driver to route. ``closure`` is the subclass closure the schema
        was shipped without (it needed the subclass rows first)."""
        self.schema["subclass_closure"] = closure
        idx_obj = self.graph._fwd
        t = idx_obj.table
        pred = t.column("pred")
        for cls_iris, sk in spec["class_targets"]:
            mask = pc.and_(
                pc.equal(pred, RDF_TYPE),
                pc.is_in(
                    t.column("obj_lex"), value_set=pa.array(sorted(cls_iris))
                ),
            ).combine_chunks()
            rows = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
            keys = idx_obj.keys_of_rows(rows)
            self.submit(
                pa.table(
                    {"node": keys, "shape": pa.array([sk] * len(keys), pa.string())}
                ),
                True,
            )
        for p, sk in spec["subjects_of"]:
            mask = pc.equal(pred, p).combine_chunks()
            rows = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
            keys = idx_obj.keys_of_rows(rows)
            self.submit(
                pa.table(
                    {"node": keys, "shape": pa.array([sk] * len(keys), pa.string())}
                ),
                True,
            )
        remote_parts: list[pa.Table] = []
        for p, sk in spec["objects_of"]:
            sub = t.filter(pc.equal(pred, p))
            keys = _obj_key_col(sub)
            remote_parts.append(
                pa.table(
                    {"node": keys, "shape": pa.array([sk] * len(keys), pa.string())}
                )
            )
        if not remote_parts:
            return pa.table(
                {"node": pa.array([], pa.string()), "shape": pa.array([], pa.string())}
            )
        return pa.concat_tables(remote_parts)

    def derive_focus(self, assocs: list[dict]) -> pa.Table:
        """In-bucket shapemap pattern resolution (fixShapeMap,
        ShapeMaps.scala semantics): ``{FOCUS p o}`` matches are SUBJECTS of
        local arcs — every outgoing arc lives in its subject's home
        bucket, so they enqueue locally and completely. ``{s p FOCUS}``
        matches are OBJECTS, whose home bucket may differ — those pairs
        return to the driver for routing (mirrors targetObjectsOf in
        derive_targets). Replaces a full second scan of the input
        Dataset with a scan of the already-resident bucket index."""
        from shaclex_ray.terms import obj_cols, term_key

        idx_obj = self.graph._fwd
        t = idx_obj.table
        pred = t.column("pred")
        remote: list[pa.Table] = []
        for a in assocs:
            mask = pc.equal(pred, a["pred"])
            if a["kind"] == "focus_subj":
                if a.get("obj") is not None:
                    k, lx, _dt, _lg = obj_cols(a["obj"])
                    mask = pc.and_(mask, pc.equal(t.column("obj_kind"), k))
                    mask = pc.and_(mask, pc.equal(t.column("obj_lex"), lx))
                rows = np.nonzero(
                    mask.combine_chunks().to_numpy(zero_copy_only=False)
                )[0]
                keys = idx_obj.keys_of_rows(rows)
                self.submit(
                    pa.table(
                        {
                            "node": keys,
                            "shape": pa.array([a["shape"]] * len(keys), pa.string()),
                        }
                    ),
                    True,
                )
            else:  # focus_obj
                rows = np.nonzero(
                    mask.combine_chunks().to_numpy(zero_copy_only=False)
                )[0]
                if a.get("subj") is not None:
                    skey = term_key(a["subj"])
                    keys = idx_obj.keys_of_rows(rows)
                    keep = pc.equal(keys, skey).to_numpy(zero_copy_only=False)
                    rows = rows[keep]
                sub = t.take(pa.array(rows))
                keys = _obj_key_col(sub)
                remote.append(
                    pa.table(
                        {
                            "node": keys,
                            "shape": pa.array(
                                [a["shape"]] * len(keys), pa.string()
                            ),
                        }
                    )
                )
        if not remote:
            return pa.table(
                {"node": pa.array([], pa.string()), "shape": pa.array([], pa.string())}
            )
        return pa.concat_tables(remote)

    def submit(self, tasks: pa.Table, is_focus: bool) -> list:
        """Enqueue (node, shape) pairs; idempotent (already-known pairs are
        skipped), so upstream dedup of focus pairs is unnecessary — the
        worklist IS the dedup. Non-focus submissions are *requests* from
        other buckets: only those pairs' answers ever travel back through
        the driver. Returns already-decided requested pairs immediately."""
        already = []
        for nk, sk in zip(
            tasks.column("node").to_pylist(), tasks.column("shape").to_pylist()
        ):
            key = (nk, sk)
            if not is_focus:
                self.requested.add(key)
                val = self.typing.get(key)
                if val is not None:
                    already.append((nk, sk, val))
                    continue
            if key not in self.typing and key not in self.pending:
                self.pending[key] = True
            if is_focus:
                self.focus_flags[key] = True
        return already

    def add_assumptions(self, asms: list):
        for nk, sk, val in asms:
            if isinstance(val, str) and val.startswith("vals:"):
                import json as _json

                val = _json.loads(val[5:])  # hop answer: value-key list
            elif isinstance(val, str) and val.startswith("rows:"):
                import json as _json

                val = _json.loads(val[5:])  # vshape answer: report rows
            self.assumptions[(nk, sk)] = val
        answered = {(nk, sk) for nk, sk, _v in asms}
        # non-mutating subtraction: dep sets may be shared across pairs
        for pair in list(self.blocked_on):
            remaining = self.blocked_on[pair] - answered
            if remaining:
                self.blocked_on[pair] = remaining
            else:
                del self.blocked_on[pair]

    def _flat_eval(self, shape_key, node_keys, is_local_key, decided, all_deps):
        """Vectorized evaluation of one flat shape for MANY focus nodes
        (module-level kernel; this wrapper merges results into worker
        state). Produces identical verdicts and report rows (multiset) to
        ShaclValidator.validate_shape — pinned by tests comparing against
        the local path and fuzzed in tests/test_property.py."""
        viol, blocked, reports, pending_class = flat_eval_kernel(
            self._flat_profiles[shape_key],
            node_keys,
            self.graph,
            self.assumptions,
            is_local_key,
            self._local_is_instance,
        )
        # decide the unblocked; register deps for the blocked (identical
        # dep combinations share ONE set object — millions of pairs block
        # on a handful of hub values). Blocked pairs keep a PARTIAL result
        # (violation state so far + report rows + unresolved class deps):
        # later rounds resolve just the deps, never re-running the kernel.
        interned: dict[tuple, set] = {}
        for pos, nk in enumerate(node_keys):
            key = (nk, shape_key)
            if pos in blocked:
                sig = tuple(sorted(blocked[pos]))
                shared = interned.get(sig)
                if shared is None:
                    shared = interned[sig] = set(sig)
                    all_deps |= {d for d in shared if d not in self.assumptions}
                self.blocked_on[key] = shared
                self._flat_partial[key] = (
                    bool(viol[pos]),
                    reports[pos],
                    pending_class.get(pos, []),
                )
                continue
            self.typing[key] = "notConforms" if viol[pos] else "conforms"
            decided.append(key)
            if key in self.focus_flags:
                self.reports.extend(reports[pos])

    def _flat_resolve_partial(self, key, decided, all_deps):
        """Finish a flat-SHACL pair from its stored partial: resolve the
        remaining class deps against assumptions (emitting the same Class
        report rows the kernel would), re-block on any still-unanswered
        dep. Verdict/report parity with a full kernel re-run is pinned by
        tests/test_dist_regressions.py."""
        viol_so_far, rows, pend = self._flat_partial[key]
        profile = self._flat_profiles[key[1]]
        still = []
        for v, param, prof_i in pend:
            a = self.assumptions.get((v, "class:" + param))
            if a is None:
                still.append((v, param, prof_i))
            elif not a:
                viol_so_far = True
                prof = profile[prof_i]
                rows.append(
                    {
                        "focus": key[0],
                        "path": prof["pred"],
                        "value": v,
                        "component": _component_iri("Class"),
                        "severity": prof["severity"],
                        "source": prof["key"],
                        "message": prof["message"],
                    }
                )
        if still:
            self._flat_partial[key] = (viol_so_far, rows, still)
            deps = {(v, "class:" + p) for v, p, _ in still}
            self.blocked_on[key] = deps
            all_deps |= deps
            return
        del self._flat_partial[key]
        self.typing[key] = "notConforms" if viol_so_far else "conforms"
        decided.append(key)
        if key in self.focus_flags:
            self.reports.extend(rows)

    def _shex_ref_probe(self, vkey: str, label: str, is_local_key):
        """Resolve a flat-ShEx ref valueExpr for one distinct value:
        assumption → term-local inline evaluation → dependency (the pair
        is routed to the value's home bucket as normal pending work)."""
        a = self.assumptions.get((vkey, label))
        if a is not None:
            return a
        se = self.schema["shapes"].get(label)
        if se is not None and not _needs_neighborhood(se, self.schema):
            v = ShExValidator(self.schema, self.graph)
            return v.satisfies(key_to_term(vkey), se)
        return "dep"

    def _flat_shex_eval(self, shape_key, node_keys, is_local_key, decided, all_deps):
        """Vectorized flat-ShEx evaluation (no reports in ShEx mode)."""
        ok_nodes, blocked = flat_shex_eval_kernel(
            self._flat_shex_profiles[shape_key],
            node_keys,
            self.graph,
            lambda v, lbl: self._shex_ref_probe(v, lbl, is_local_key),
        )
        interned: dict[tuple, set] = {}
        for pos, nk in enumerate(node_keys):
            key = (nk, shape_key)
            if pos in blocked:
                sig = tuple(sorted(blocked[pos]))
                shared = interned.get(sig)
                if shared is None:
                    shared = interned[sig] = set(sig)
                    all_deps |= {d for d in shared if d not in self.assumptions}
                self.blocked_on[key] = shared
                continue
            self.typing[key] = "conforms" if ok_nodes[pos] else "notConforms"
            decided.append(key)

    def _local_is_instance(self, node_key: str, cls_key: str) -> bool:
        closure = set(
            self.schema.get("subclass_closure", {}).get(cls_key, [cls_key])
        )
        from shaclex_ray.terms import term_key as _tk

        for p, o in self.graph.arcs_out(node_key):
            if p == RDF_TYPE and _tk(o) in closure:
                return True
        return False

    def run_round(self):
        """Evaluate every pending pair against local arcs + assumptions.
        Returns (n_decided, n_pending, deps, answered):
          deps     — still-unanswered (child_node, child_shape) this bucket
                     needs from other buckets
          answered — (node, shape, val) decided this round (the driver
                     forwards the ones other buckets wait on)
        """
        nb = self.nbuckets
        me = self.bucket_id
        assumptions = self.assumptions
        cache = self._local_cache

        import os as _os
        import time as _time

        _dbg = _os.environ.get("SHACLEX_ROUND_DEBUG")
        _tcal = _tflat = 0.0
        _n_in = 0
        _tloop0 = 0.0
        if _dbg:
            # fixed pure-Python calibration burn: if THIS inflates in a
            # slow run, the interpreter/environment is slower (GC, cgroup,
            # frequency), not the kernels
            _c0 = _time.perf_counter()
            _acc = 0
            for _i in range(500_000):
                _acc += _i ^ (_i >> 3)
            _tcal = _time.perf_counter() - _c0
            _n_in = len(self.pending)
            if not hasattr(self, "_ru0"):
                import resource as _res

                self._ru0 = _res.getrusage(_res.RUSAGE_SELF)
            _t0 = _time.perf_counter()

        # literals have no outgoing arcs, so without inverse constraints any
        # bucket evaluates them correctly (term-local fast path); WITH
        # inverse constraints a literal focus must run in its home bucket
        # where its reversed copies live
        lit_local = not self.schema.get("_has_inverse")

        def is_local_key(nk: str) -> bool:
            v = cache.get(nk)
            if v is None:
                if nk.startswith("L") and lit_local:
                    v = True
                else:
                    v = node_key_bucket(nk, nb) == me
                cache[nk] = v
            return v

        def is_local_term(t: tuple) -> bool:
            return is_local_key(term_key(t))

        decided = []
        all_deps: set = set()

        # vectorized flat-SHACL pass: pending pairs of vectorizable shapes
        # evaluate in bulk with Arrow/numpy kernels (per-focus Python walk
        # only for the rest)
        flat_handled: set = set()
        if not self.schema.get("_no_flat"):
            if self.engine == "shacl":
                if self._flat_profiles is None:
                    self._flat_profiles = flat_shacl_profile(self.schema)
                profiles = self._flat_profiles
                evaluator = self._flat_eval
            else:
                if self._flat_shex_profiles is None:
                    self._flat_shex_profiles = flat_shex_profile(self.schema)
                profiles = self._flat_shex_profiles
                evaluator = self._flat_shex_eval
            by_shape: dict[str, list] = {}
            for key in self.pending:
                if key in self.blocked_on:
                    continue
                nk_, sk_ = key
                if sk_ in profiles:
                    if key in self._flat_partial:
                        # deps answered: finish from the stored partial
                        # (no kernel re-run over the pair's arcs)
                        self._flat_resolve_partial(key, decided, all_deps)
                        flat_handled.add(key)
                        continue
                    by_shape.setdefault(sk_, []).append(nk_)
                    flat_handled.add(key)
            if (
                by_shape
                and me == 0
                and _os.environ.get("SHACLEX_ROUND_PROFILE")
                and not getattr(self, "_profiled", False)
            ):
                self._profiled = True
                import cProfile
                import io as _io
                import pstats

                pr = cProfile.Profile()
                pr.enable()
                for sk_, nks_ in sorted(by_shape.items()):
                    evaluator(sk_, nks_, is_local_key, decided, all_deps)
                pr.disable()
                s = _io.StringIO()
                pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
                print(s.getvalue(), flush=True)
            else:
                for sk_, nks_ in sorted(by_shape.items()):
                    evaluator(sk_, nks_, is_local_key, decided, all_deps)

        if _dbg:
            _tflat = _time.perf_counter() - _t0
            _tloop0 = _time.perf_counter()
            import resource as _res

            _ru = _res.getrusage(_res.RUSAGE_SELF)
            print(
                f"[ru b{me}] ut={_ru.ru_utime - self._ru0.ru_utime:.2f} "
                f"st={_ru.ru_stime - self._ru0.ru_stime:.2f} "
                f"minflt={_ru.ru_minflt - self._ru0.ru_minflt} "
                f"majflt={_ru.ru_majflt - self._ru0.ru_majflt} "
                f"maxrss={_ru.ru_maxrss // 1024}MB",
                flush=True,
            )
            self._ru0 = _ru

        for key in list(self.pending):
            if key in flat_handled:
                continue
            if key in self.blocked_on:
                all_deps |= self.blocked_on[key]
                continue  # still waiting on the same unanswered children
            nk, shape_key = key
            deps: set = set()

            def record(c, s, d=deps):
                if (c, s) not in assumptions:
                    d.add((c, s))

            try:
                if shape_key.startswith("class:"):
                    cls_key = shape_key[len("class:") :]
                    v = _DistShacl(self.schema, self.graph, assumptions, is_local_key, record)
                    ok = ShaclValidator._is_instance(v, nk, cls_key)
                    self.typing[key] = "conforms" if ok else "notConforms"
                    decided.append(key)
                    continue
                if shape_key.startswith("hop:"):
                    # elementary path hop: answer = the node's local values
                    _tag, direction, pred = shape_key.split(":", 2)
                    if direction == "fwd":
                        vals = [
                            term_key(o)
                            for p, o in self.graph.arcs_out(nk)
                            if p == pred
                        ]
                    else:
                        vals = [
                            term_key(s)
                            for p, s in self.graph.arcs_in(nk)
                            if p == pred
                        ]
                    import json as _json

                    self.typing[key] = "vals:" + _json.dumps(sorted(set(vals)))
                    decided.append(key)
                    continue
                if shape_key.startswith("vshape:"):
                    # nested property-shape validation in REPORT context:
                    # validate fully here and ship the result ROWS back to
                    # the requesting parent(s) — each parent appends its
                    # own copy, preserving the per-traversal multiplicity
                    # of the local call stack (a value reached from two
                    # parents reports twice, as the W3C fixtures expect)
                    real_key = shape_key[len("vshape:") :]
                    v = _DistShacl(
                        self.schema, self.graph, assumptions, is_local_key,
                        record, reporting=True,
                    )
                    rres = v.validate_shape(nk, real_key)
                    if not v.provisional:
                        import json as _json

                        rows = [
                            r for r in rres
                            if r["component"] != _REMOTE_NC_COMPONENT
                        ]
                        self.typing[key] = "rows:" + _json.dumps(rows)
                        decided.append(key)
                elif self.engine == "shex":
                    v = _DistShEx(self.schema, self.graph, assumptions, is_local_term, record)
                    node = key_to_term(nk)
                    # The pair's OWN coinductive assumption (set by a
                    # cycle-break) must not decide the pair vacuously —
                    # hide it during its top-level evaluation so local
                    # constraint failures still surface. Direct
                    # self-reference inside the evaluation still closes
                    # coinductively via the in-progress guard
                    # (ValidateND.scala:51-54 semantics).
                    self_assumption = assumptions.pop(key, None)
                    try:
                        if shape_key.startswith("inline:"):
                            # anonymous nested Shape routed here as a dep:
                            # resolve through the inline registry
                            se = self.schema.get("inline", {}).get(shape_key)
                            if se is None:
                                raise ValueError(
                                    f"unregistered inline shape {shape_key}"
                                )
                            ok = v.satisfies(node, se)
                        else:
                            ok = v.validate_node_shape(
                                node, shape_key if shape_key != "START" else None
                            )
                    finally:
                        if self_assumption is not None:
                            assumptions[key] = self_assumption
                    if not v.provisional:
                        self.typing[key] = "conforms" if ok else "notConforms"
                        decided.append(key)
                else:
                    # report rows are emitted only for FOCUS validations —
                    # a conformance probe requested by another bucket must
                    # not add its inner violations to the report (matches
                    # the local validator / SHACL sh:node semantics)
                    is_focus_pair = key in self.focus_flags
                    v = _DistShacl(
                        self.schema, self.graph, assumptions, is_local_key,
                        record, reporting=is_focus_pair,
                    )
                    rres = v.validate_shape(nk, shape_key)
                    if not v.provisional:
                        self.typing[key] = "conforms" if not rres else "notConforms"
                        decided.append(key)
                        if is_focus_pair:
                            self.reports.extend(
                                r
                                for r in rres
                                if r["component"] != _REMOTE_NC_COMPONENT
                            )
            except _NeedRemote as e:
                self.typing[key] = f"error:{e}"
                decided.append(key)
                continue
            if deps:
                self.blocked_on[key] = deps
            all_deps |= deps
        for key in decided:
            self.pending.pop(key, None)
            self.blocked_on.pop(key, None)
        # only dep-requested answers travel to the driver — the rest of the
        # typing stays actor-side (driver memory is O(#cross-bucket deps),
        # not O(#focus pairs))
        answered = [
            (k[0], k[1], self.typing[k]) for k in decided if k in self.requested
        ]
        if _dbg:
            print(
                f"[round b{me}] cal={_tcal * 1000:.0f}ms flat={_tflat:.2f}s "
                f"loop={_time.perf_counter() - _tloop0:.2f}s "
                f"in={_n_in} flat_n={len(flat_handled)} decided={len(decided)}",
                flush=True,
            )
        return len(decided), len(self.pending), sorted(all_deps), answered

    def ping(self):
        return self.bucket_id

    def cleanup(self) -> None:
        """Remove the spill directory (called by the driver before kill —
        ray.kill skips destructors)."""
        import shutil

        shutil.rmtree(self._spill_dir, ignore_errors=True)

    def mark_pending_unknown(self) -> int:
        """Loop-exit fallback: pairs the fixpoint could not decide become
        val='unknown' (result_json/_summary treat them as not valid)."""
        n = 0
        for key in list(self.pending):
            if key not in self.typing:
                self.typing[key] = "unknown"
                n += 1
        self.pending.clear()
        self.blocked_on.clear()
        self._flat_partial.clear()
        return n

    def assume_deps(self, deps: list):
        """Cycle-breaking: treat listed unanswered deps as conforming
        (coinductive close, ValidateND.scala:51-54 reading); unanswered
        path hops close with an empty value set."""
        for nk, sk in deps:
            default = [] if sk.startswith("hop:") else True
            self.assumptions.setdefault((nk, sk), default)
        answered = set(map(tuple, deps))
        for pair in list(self.blocked_on):
            remaining = self.blocked_on[pair] - answered
            if remaining:
                self.blocked_on[pair] = remaining
            else:
                del self.blocked_on[pair]

    def _typing_table(self) -> pa.Table:
        keys = sorted(self.typing)
        return pa.table(
            {
                "node": pa.array([k[0] for k in keys], pa.string()),
                "shape": pa.array([k[1] for k in keys], pa.string()),
                "val": pa.array([self.typing[k] for k in keys], pa.string()),
                "is_focus": pa.array(
                    [self.focus_flags.get(k, False) for k in keys], pa.bool_()
                ),
            }
        )

    def _report_table(self) -> pa.Table:
        return _reports_to_table(self.reports)

    def collect(self):
        return self._typing_table(), self.reports

    def write_shard(self, out_dir: str) -> dict:
        """Actor-side result sink: each bucket writes its own typing/report
        parquet shard — the full tables never concat on the driver
        (SURVEY.md §4.2 resumable-output layout)."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(f"{out_dir}/typing", exist_ok=True)
        os.makedirs(f"{out_dir}/report", exist_ok=True)
        t = self._typing_table()
        r = self._report_table()
        pq.write_table(t, f"{out_dir}/typing/part-{self.bucket_id:05d}.parquet")
        pq.write_table(r, f"{out_dir}/report/part-{self.bucket_id:05d}.parquet")
        vals = t.column("val").to_pylist()
        focus = t.column("is_focus").to_pylist()
        stats: dict[str, int] = {"violations": r.num_rows}
        for v, f in zip(vals, focus):
            if f:
                stats[v] = stats.get(v, 0) + 1
        return stats


def _reports_to_table(reports: list) -> pa.Table:
    return pa.table(
        {
            "focus_node": pa.array([r["focus"] for r in reports], pa.string()),
            "path": pa.array([r["path"] or "" for r in reports], pa.string()),
            "value_lex": pa.array([r["value"] or "" for r in reports], pa.string()),
            "source_shape": pa.array([r["source"] for r in reports], pa.string()),
            "component": pa.array([r["component"] for r in reports], pa.string()),
            "severity": pa.array([r["severity"] for r in reports], pa.string()),
            "message": pa.array([r["message"] for r in reports], pa.string()),
        }
    )


def _route_tasks(tasks: pa.Table, nbuckets: int) -> dict[int, pa.Table]:
    """Vectorized (node,shape) routing to buckets."""
    if tasks.num_rows == 0:
        return {}
    nodes = tasks.column("node").to_pandas()
    subj = nodes.str.slice(1)
    is_b = nodes.str.startswith("B")
    subj = subj.where(~is_b, "_:" + subj)
    is_l = nodes.str.startswith("L")
    subj = subj.where(~is_l, nodes)
    buckets = pd.Series(stable_bucket_array(subj.to_numpy(dtype=object), nbuckets))
    out = {}
    for b, idx in buckets.groupby(buckets).groups.items():
        out[int(b)] = tasks.take(pa.array(idx.to_numpy()))
    return out


def _submit_focus_dataset(focus_ds, workers, nbuckets: int) -> None:
    """Stream a focus Dataset straight into the bucket actors: each read
    task routes its batch and blocks on acceptance (backpressure). The
    focus set NEVER materializes on the driver — submit() dedups
    actor-side, so no global drop_duplicates pass is needed."""

    def route(batch: pa.Table) -> pa.Table:
        refs = [
            workers[b].submit.remote(tbl, True)
            for b, tbl in _route_tasks(batch, nbuckets).items()
        ]
        if refs:
            ray.get(refs)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    # consume with a tiny aggregate — only per-batch counts reach the driver
    focus_ds.map_batches(route, batch_format="pyarrow").sum("n")


def distributed_validate(
    triples_ds,
    engine: str,
    schema: dict,
    focus_tasks,
    nbuckets: int | None = 32,
    include_inverse: bool = False,
    max_rounds: int = 12,
    output_dir: str | None = None,
    spill_rows: int | None = None,
    parquet_path: str | None = None,
):
    """Run the BSP typing fixpoint.

    ``focus_tasks``: pa.Table(node: term key, shape: shape key) for small
    shapemaps, or a Ray Dataset of the same schema (streamed task→actor,
    never driver-materialized).
    Returns (typing, report) as pyarrow Tables — unless ``output_dir`` is
    given, in which case each bucket actor writes its own parquet shard
    under ``{output_dir}/typing`` and ``{output_dir}/report`` and the
    return value is (typing_ds, report_ds) lazily read back plus the
    summary stats are attached to ``distributed_validate.last_stats``.
    """
    import os as _os
    import time as _time

    dbg = _os.environ.get("SHACLEX_DIST_DEBUG")
    t0 = _time.perf_counter()

    def _mark(label):
        nonlocal t0
        if dbg:
            print(f"[dist] {label}: {_time.perf_counter() - t0:.2f}s", flush=True)
        t0 = _time.perf_counter()

    if engine == "shex":
        # EXTERNAL shapes with an attached resolver schema merge in here on
        # the driver: the extern definition replaces the ShapeExternal under
        # its label, so the bucket protocol (ref probes, neighborhood
        # co-location) treats it like any other labeled shape
        ext = schema.get("externs")
        if ext:
            schema = dict(schema)
            shapes = dict(schema.get("shapes", {}))
            for lbl, se in list(shapes.items()):
                if (
                    isinstance(se, dict)
                    and se.get("type") == "ShapeExternal"
                    and lbl in ext.get("shapes", {})
                ):
                    shapes[lbl] = ext["shapes"][lbl]
            for lbl, se in ext.get("shapes", {}).items():
                shapes.setdefault(lbl, se)
            te = dict(schema.get("te_refs", {}))
            te.update(ext.get("te_refs", {}) or {})
            schema["shapes"], schema["te_refs"] = shapes, te
            schema["externs"] = None
        # schema startActs run once per validation invocation; a failing
        # one fails every node — decided here on the driver (pure,
        # data-free) by rewriting every shape to an always-false expr,
        # so no bucket machinery needs a special case
        from shaclex_ray.validate.local import run_sem_acts

        if not run_sem_acts(schema.get("startActs")):
            always_fail = {"type": "ShapeNot", "shapeExpr": {"type": "Shape"}}
            schema = dict(schema)
            schema["shapes"] = {
                lbl: always_fail for lbl in schema.get("shapes", {})
            }
            if schema.get("start") is not None:
                schema["start"] = always_fail
            schema["startActs"] = None
        register_inline_shapes(schema)
    # inverse constraints require reversed arc copies (and route literal
    # focus nodes to a home bucket so their arcs_in are co-located)
    has_inv = schema_has_inverse(engine, schema)
    schema["_has_inverse"] = has_inv
    include_inverse = include_inverse or has_inv
    schema_ref = ray.put(schema)

    # size the input FIRST (parquet metadata / materialized block count —
    # cheap), so an auto fleet (nbuckets=None) scales with data volume:
    # a 100k-triple corpus pays 1 actor spawn, a 100-TB one the whole
    # cluster. SHACLEX_BUCKET_ROWS is the per-bucket row target (the cap
    # is the cluster CPU count — on a real multi-node cluster that is
    # node_count x cpus, so the fleet grows with the cluster).
    import math as _math

    if parquet_path is not None:
        import glob as _glob

        import pyarrow.parquet as _pq

        files = sorted(_glob.glob(f"{parquet_path}/*.parquet"))
        if not files:
            raise FileNotFoundError(f"no parquet shards under {parquet_path}")
        total_rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
    else:
        mat = triples_ds.materialize()
        block_refs = mat.to_arrow_refs()
        total_rows = mat.count()
    if nbuckets is None:
        bucket_rows = int(_os.environ.get("SHACLEX_BUCKET_ROWS", "250000"))
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nbuckets = max(1, min(ncpu, _math.ceil(total_rows / bucket_rows)))
    distributed_validate.last_nbuckets = nbuckets
    _mark("materialize")

    # spawn the actor fleet before the split: worker-process startup (the
    # dominant fixed cost at high bucket counts) overlaps the split below.
    # default actor semantics: num_cpus=1 for placement, 0 reserved while
    # alive — a large fleet never deadlocks a small cluster
    _actor_cls = BucketWorker
    if _os.environ.get("SHACLEX_FRESH_WORKERS"):
        # debug: a distinct runtime_env forces dedicated (fresh) worker
        # processes instead of reusing idle ones from earlier stages
        _actor_cls = BucketWorker.options(
            runtime_env={"env_vars": {"SHACLEX_FRESH": "1"}}
        )
    workers = [
        _actor_cls.remote(schema_ref, engine, nbuckets, b, spill_rows)
        for b in range(nbuckets)
    ]
    warmups = [w.ping.remote() for w in workers]

    # ---- one-time shuffle: block groups -> per-bucket parts -> actors
    target = int(_os.environ.get("SHACLEX_SPLIT_ROWS", "2000000"))
    if parquet_path is not None:
        # file-granular exchange: split tasks read their parquet shards
        # directly (storage → task heap, no object-store staging).
        # bound rows per split group (not groups per cpu): task heap must
        # hold a group + working copies at ANY corpus scale
        ngroups = max(1, min(len(files), _math.ceil(total_rows / target)))
        fgroups = [files[g::ngroups] for g in range(ngroups)]
        split_refs = [
            _split_block_files.options(num_returns=nbuckets).remote(
                nbuckets, include_inverse, grp
            )
            for grp in fgroups
        ]
    else:
        # split-group count follows data volume both ways: a small corpus
        # must not fan out nbuckets x nbuckets near-empty objects, and a
        # huge one must not exceed SHACLEX_SPLIT_ROWS rows per group (task
        # heap holds a group + working copies)
        ngroups = max(
            1,
            min(
                len(block_refs),
                max(
                    min(nbuckets, _math.ceil(total_rows / 200_000)),
                    _math.ceil(total_rows / target),
                ),
            ),
        )
        groups = [block_refs[g::ngroups] for g in range(ngroups)]
        split_refs = [
            _split_block.options(num_returns=nbuckets).remote(
                nbuckets, include_inverse, *grp
            )
            for grp in groups
        ]
    if nbuckets == 1:
        split_refs = [[r] for r in split_refs]
    ray.wait(
        [r for blk in split_refs for r in blk],
        num_returns=ngroups * nbuckets,
        fetch_local=False,
    )
    _mark("split")
    ray.get(warmups)
    _mark("warmup")
    load_refs = [
        workers[b].load.remote(*[blk[b] for blk in split_refs])
        for b in range(nbuckets)
    ]

    # initial focus submission (vectorized routing; worklists live in
    # actors). Submit calls queue behind load in each actor's mailbox, so
    # the focus-resolution scan OVERLAPS the bucket index builds.
    if isinstance(focus_tasks, str) and focus_tasks == "shacl-targets":
        # in-bucket target derivation: every bucket already holds all
        # outgoing arcs of its subjects, so subject-side targets resolve
        # where they live — no second scan of the input Dataset. Only the
        # (tiny) rdfs:subClassOf rows and targetObjectsOf pairs cross the
        # driver.
        ray.get(load_refs)
        _mark("load")
        sub_tbl = pa.concat_tables(
            ray.get([w.subclass_rows.remote() for w in workers])
        )
        children: dict[str, set[str]] = {}
        for child, parent in zip(
            sub_tbl.column("child").to_pylist(), sub_tbl.column("parent").to_pylist()
        ):
            children.setdefault(parent, set()).add(child)
        spec, node_pairs = _build_target_spec(schema, children)
        closure = schema["subclass_closure"]
        remote_parts = ray.get(
            [w.derive_targets.remote(spec, closure) for w in workers]
        )
        extra = pa.table(
            {
                "node": pa.array([p[0] for p in node_pairs], pa.string()),
                "shape": pa.array([p[1] for p in node_pairs], pa.string()),
            }
        )
        routed = pa.concat_tables([extra] + remote_parts)
        if routed.num_rows:
            ray.get(
                [
                    workers[b].submit.remote(tbl, True)
                    for b, tbl in _route_tasks(routed, nbuckets).items()
                ]
            )
        _mark("targets+submit")
    elif isinstance(focus_tasks, tuple) and focus_tasks[0] == "shex-patterns":
        # in-bucket shapemap pattern resolution: subject-side matches
        # enqueue where they live; only object-side matches (plus the
        # concrete node-selector pairs) cross the driver. No second scan
        # of the input Dataset.
        _, passocs, concrete = focus_tasks
        ray.get(load_refs)
        _mark("load")
        remote_parts = ray.get([w.derive_focus.remote(passocs) for w in workers])
        routed = pa.concat_tables([concrete] + remote_parts)
        if routed.num_rows:
            ray.get(
                [
                    workers[b].submit.remote(tbl, True)
                    for b, tbl in _route_tasks(routed, nbuckets).items()
                ]
            )
        _mark("focus+submit")
    elif isinstance(focus_tasks, pa.Table):
        ray.get(
            [
                workers[b].submit.remote(tbl, True)
                for b, tbl in _route_tasks(focus_tasks, nbuckets).items()
            ]
        )
        ray.get(load_refs)
        _mark("load+submit")
    else:  # Ray Dataset: streamed task→actor, no driver materialization
        _submit_focus_dataset(focus_tasks, workers, nbuckets)
        ray.get(load_refs)
        _mark("load+submit")

    # ---- driver loop: only dependency traffic crosses the driver
    need_by: dict[tuple[str, str], set[int]] = {}
    answered_vals: dict[tuple[str, str], str] = {}
    forwarded: set[tuple[tuple[str, str], int]] = set()

    # Productive rounds never count against the cap (a deep shape-reference
    # chain legitimately needs depth-many rounds); only consecutive
    # non-productive rounds do. Pairs still pending when the loop exits are
    # marked val='unknown' — never silently dropped (a truncated validation
    # must not read as a clean pass).
    rounds = 0
    stalls = 0
    just_broke = False
    while rounds < 100_000:  # safety valve; real exits are below
        rounds += 1
        results = ray.get([w.run_round.remote() for w in workers])
        total_decided = sum(r[0] for r in results)
        total_pending = sum(r[1] for r in results)
        new_child_tasks: list[tuple[str, str]] = []
        progress = total_decided > 0
        for b, (_nd, _np, deps, answered) in enumerate(results):
            for nk, sk, val in answered:
                answered_vals[(nk, sk)] = val
            for child in deps:
                if b not in need_by.setdefault(child, set()):
                    need_by[child].add(b)
                    progress = True
                if child not in answered_vals:
                    new_child_tasks.append(child)
        # route newly-requested child pairs to their buckets; a request for
        # an already-decided pair returns its answer immediately
        if new_child_tasks:
            uniq = sorted(set(new_child_tasks))
            tbl = pa.table(
                {
                    "node": pa.array([c[0] for c in uniq], pa.string()),
                    "shape": pa.array([c[1] for c in uniq], pa.string()),
                }
            )
            sub_refs = [
                workers[b].submit.remote(sub, False)
                for b, sub in _route_tasks(tbl, nbuckets).items()
            ]
            for already in ray.get(sub_refs):
                for nk, sk, val in already:
                    answered_vals[(nk, sk)] = val
        # forward decided answers to the buckets waiting on them
        fwd: dict[int, list] = {}
        done_children: list = []
        for child, buckets in need_by.items():
            val = answered_vals.get(child)
            if val is None:
                continue
            for b in buckets:
                if (child, b) not in forwarded:
                    forwarded.add((child, b))
                    # hop answers carry their value-list payload verbatim;
                    # everything else reduces to a conformance boolean
                    payload = (
                        val
                        if child[1].startswith(("hop:", "vshape:"))
                        else (val == "conforms")
                    )
                    fwd.setdefault(b, []).append((child[0], child[1], payload))
                    progress = True
            done_children.append(child)  # every requester now forwarded
        for b, asms in fwd.items():
            workers[b].add_assumptions.remote(asms)
        # evict fully-forwarded deps: driver state stays O(in-flight deps),
        # not O(all deps ever). A LATE request for an evicted child is
        # answered straight from its bucket's typing on submit(), so
        # nothing is lost by forgetting it here.
        for child in done_children:
            for b in need_by.pop(child):
                forwarded.discard((child, b))
            answered_vals.pop(child, None)

        _mark(f"round{rounds} decided={total_decided} pending={total_pending}")
        if total_pending == 0 and not new_child_tasks:
            break
        if progress:
            stalls = 0
            just_broke = False
            continue
        stalls += 1
        unresolved = sorted(c for c in need_by if c not in answered_vals)
        if unresolved and not just_broke:
            # cross-bucket cycle: close coinductively (assume conforms).
            # Repeated breaks are allowed as long as each one unblocks
            # progress — a break that moves nothing ends the loop.
            ray.get([w.assume_deps.remote(unresolved) for w in workers])
            just_broke = True
            continue
        if just_broke or not unresolved or stalls >= max(2, max_rounds):
            break

    # observable driver-state bound (tests assert these stay at the
    # in-flight level, not the all-deps-ever level)
    distributed_validate.last_dep_state = {
        "need_by": len(need_by),
        "answered_vals": len(answered_vals),
        "forwarded": len(forwarded),
    }

    # anything still pending is UNDECIDED — surface it, don't drop it
    n_unknown = sum(ray.get([w.mark_pending_unknown.remote() for w in workers]))
    if n_unknown and dbg:
        print(f"[dist] WARNING: {n_unknown} pairs left unknown", flush=True)

    if output_dir is not None:
        # actor-side sink: each bucket writes its own shard; only per-bucket
        # summary counts reach the driver
        stats_list = ray.get([w.write_shard.remote(output_dir) for w in workers])
        ray.get([w.cleanup.remote() for w in workers])
        for w in workers:
            ray.kill(w)
        stats: dict[str, int] = {}
        for s in stats_list:
            for k, v in s.items():
                stats[k] = stats.get(k, 0) + v
        distributed_validate.last_stats = stats
        _mark("write_shards")
        import ray.data as rd

        return (
            rd.read_parquet(f"{output_dir}/typing"),
            rd.read_parquet(f"{output_dir}/report"),
        )

    collected = ray.get([w.collect.remote() for w in workers])
    ray.get([w.cleanup.remote() for w in workers])
    for w in workers:
        ray.kill(w)

    typing_tbl = pa.concat_tables([c[0] for c in collected])
    reports: list[dict] = []
    for c in collected:
        reports.extend(c[1])
    return typing_tbl, _reports_to_table(reports)



# ---------------------------------------------------------------------------
# SHACL target resolution over the triples Dataset (SURVEY.md J2)

def _build_target_spec(schema: dict, children: dict[str, set[str]]):
    """Turn the schema's target declarations + the subclass-children map
    into a scan spec. Attaches ``subclass_closure`` to ``schema`` (the
    sh:class components need it) and returns ``(spec, node_pairs)``."""

    def closure(cls_key: str) -> list[str]:
        seen = {cls_key}
        frontier = [cls_key]
        while frontier:
            cur = frontier.pop()
            for ch in children.get(cur, ()):
                if ch not in seen:
                    seen.add(ch)
                    frontier.append(ch)
        return sorted(seen)

    class_targets: list[tuple[str, str]] = []
    node_pairs: list[tuple[str, str]] = []
    subjects_of: list[tuple[str, str]] = []
    objects_of: list[tuple[str, str]] = []
    closures: dict[str, list[str]] = {}
    for skey in schema["with_targets"]:
        shape = schema["shapes"][skey]
        for kind, val in shape["targets"]:
            if kind == "node":
                node_pairs.append((val, skey))
            elif kind == "class":
                class_targets.append((val, skey))
                closures[val] = closure(val)
            elif kind == "subjectsOf":
                subjects_of.append((val, skey))
            elif kind == "objectsOf":
                objects_of.append((val, skey))
        if shape["implicit_class"]:
            class_targets.append((skey, skey))
            closures[skey] = closure(skey)
    schema["subclass_closure"] = {
        ck: closure(ck) for ck in _all_class_params(schema)
    }

    spec = {
        "class_targets": [
            (set("".join(c[1:]) for c in closures[ck]), sk) for ck, sk in class_targets
        ],
        "subjects_of": subjects_of,
        "objects_of": objects_of,
    }
    return spec, node_pairs


def resolve_shacl_targets(triples_ds, schema: dict):
    """Resolve SHACL targets into a *streaming* focus Dataset of
    (node term key, shape key) pairs — the focus set never materializes on
    the driver (it is submitted task→actor and deduped in the bucket
    worklists). Only the rdfs:subClassOf rows (class hierarchy — tiny) are
    collected driver-side to attach the subclass closure to the schema.

    ``distributed_validate(..., focus_tasks="shacl-targets")`` derives the
    same pairs IN-BUCKET from the already-loaded arc index (no second scan
    of the input); this Dataset variant remains for callers validating a
    Dataset without loading buckets, and as the equivalence oracle for the
    in-bucket path (tests pin both to identical typing)."""

    def _sub_filter(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("pred"), RDFS_SUBCLASS)
        sub = batch.filter(mask)
        return sub.select(["subj", "obj_kind", "obj_lex"])

    sub_rows = triples_ds.map_batches(_sub_filter, batch_format="pyarrow").take_all()
    children: dict[str, set[str]] = {}
    for r in sub_rows:
        child = subj_to_key(r["subj"])
        parent = "I" + r["obj_lex"] if r["obj_kind"] == "iri" else "B" + r["obj_lex"]
        children.setdefault(parent, set()).add(child)

    spec, node_pairs = _build_target_spec(schema, children)

    def _subj_keys(subj_arr) -> pa.Array:
        subj_arr = (
            subj_arr.combine_chunks() if isinstance(subj_arr, pa.ChunkedArray) else subj_arr
        )
        is_b = pc.starts_with(subj_arr, "_:")
        as_b = pc.binary_join_element_wise(
            "B", pc.utf8_replace_slice(subj_arr, 0, 2, ""), ""
        )
        as_i = pc.binary_join_element_wise("I", subj_arr, "")
        return pc.if_else(is_b, as_b, as_i)

    def find_targets(batch: pa.Table) -> pa.Table:
        parts = []
        pred = batch.column("pred")
        for cls_iris, sk in spec["class_targets"]:
            mask = pc.and_(
                pc.equal(pred, RDF_TYPE),
                pc.is_in(batch.column("obj_lex"), value_set=pa.array(sorted(cls_iris))),
            )
            keys = _subj_keys(pc.filter(batch.column("subj"), mask))
            parts.append(
                pa.table({"node": keys, "shape": pa.array([sk] * len(keys), pa.string())})
            )
        for p, sk in spec["subjects_of"]:
            keys = _subj_keys(pc.filter(batch.column("subj"), pc.equal(pred, p)))
            parts.append(
                pa.table({"node": keys, "shape": pa.array([sk] * len(keys), pa.string())})
            )
        for p, sk in spec["objects_of"]:
            sub = batch.filter(pc.equal(pred, p))
            keys = _obj_key_col(sub)
            parts.append(
                pa.table({"node": keys, "shape": pa.array([sk] * len(keys), pa.string())})
            )
        if not parts:
            return pa.table(
                {"node": pa.array([], pa.string()), "shape": pa.array([], pa.string())}
            )
        out = pa.concat_tables(parts)
        # batch-local dedup (combiner); Arrow group_by keeps it C++-side
        return out.group_by(out.column_names, use_threads=False).aggregate([]).cast(
            out.schema
        )

    import ray.data as rd

    targets_ds = triples_ds.map_batches(find_targets, batch_format="pyarrow")
    extra = pa.table(
        {
            "node": pa.array([p[0] for p in node_pairs], pa.string()),
            "shape": pa.array([p[1] for p in node_pairs], pa.string()),
        }
    )
    if extra.num_rows:
        targets_ds = targets_ds.union(rd.from_arrow(extra))
    return targets_ds


def _all_class_params(schema: dict) -> set[str]:
    out = set()
    for sh in schema["shapes"].values():
        if not sh:
            continue
        for kind, params in sh["components"]:
            if kind == "class":
                out.add(params["cls"])
    return out
