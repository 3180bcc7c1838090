"""Distributed shape validation: a semi-naive BSP fixpoint over Ray Data.

This is the Ray-native re-expression of the reference's recursive
neighborhood-closure validation (SURVEY.md §2.9; worklist semantics per
weso/shaclex modules/slang/src/main/scala/es/weso/slang/ValidateND.scala:44-122):

  * triples are routed once into ``nbuckets`` coarse partitions by a stable
    hash of the subject, so every focus node's *outgoing* neighborhood is
    co-located (J3); optional reversed copies co-locate incoming arcs
  * each BSP round is ONE ``groupby(bucket).map_groups`` shuffle: a bucket
    evaluates its pending (node, shape) pairs with the in-memory semantics
    (the conformance-verified local validators) against its local arcs
  * a pair whose evaluation needs the conformance of a *remote* node
    (value-shape recursion J5 / sh:class of a value node) emits a dependency
    request routed to the child's bucket; the child's decided conformance is
    routed back as an assumption the next round (the typing-join G9)
  * rounds repeat until no pair flips; unresolved cross-bucket cycles are
    then closed coinductively (assume conforms — the greatest-fixpoint
    reading the local validators use, ValidateND.scala:51-54)

Driver-side state is O(|focus pairs| + |dependency edges|) — the typing
table; arcs (the 100-TB side) stay distributed and stream through the
shuffle. Scale note: at extreme focus counts the typing bookkeeping moves
onto ``Dataset.join``; the round structure is unchanged.

Supported in distributed mode: full ShEx semantics minus cross-bucket
inverse TCs unless ``include_inverse=True``; SHACL core with predicate and
inverse paths (multi-hop sequence/closure paths are served by the local
validator, which the conformance suite exercises — the KG pipeline's shapes
use predicate paths only).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from shaclex_ray.terms import RDF_TYPE, key_to_term, obj_key, subj_to_key, term_key
from shaclex_ray.validate.local import Graph, ShExValidator
from shaclex_ray.validate.shacl_local import RDFS_SUBCLASS, ShaclValidator

WIDE_FIELDS = [
    ("role", pa.string()),      # arc | rarc | task | asm | res | dep | rep
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj_kind", pa.string()),
    ("obj_lex", pa.string()),
    ("obj_dt", pa.string()),
    ("obj_lang", pa.string()),
    ("node", pa.string()),      # term key
    ("shape", pa.string()),
    ("pnode", pa.string()),     # dep: requesting parent
    ("pshape", pa.string()),
    ("val", pa.string()),       # res/asm: "conforms" | "notConforms"
    ("component", pa.string()),  # rep rows
    ("bucket", pa.int64()),
]
WIDE_SCHEMA = pa.schema([pa.field(n, t) for n, t in WIDE_FIELDS])


def stable_bucket_series(strings: pa.Array, nbuckets: int) -> pa.Array:
    arr = np.asarray(strings.to_pylist(), dtype=object)
    if len(arr) == 0:
        return pa.array([], pa.int64())
    h = pd.util.hash_array(arr) % np.uint64(nbuckets)
    return pa.array(h.astype("int64"), pa.int64())


def stable_bucket(s: str, nbuckets: int) -> int:
    return int(pd.util.hash_array(np.array([s], dtype=object))[0] % np.uint64(nbuckets))


def _node_key_bucket_col(node_keys: pa.Array, nbuckets: int) -> pa.Array:
    # node term keys are "I<iri>"/"B<id>"; arcs bucket on the raw subj string
    subj = pc.utf8_replace_slice(node_keys, 0, 1, "")
    is_b = pc.equal(pc.utf8_slice_codeunits(node_keys, 0, 1), "B")
    subj = pc.if_else(is_b, pc.binary_join_element_wise("_:", subj, ""), subj)
    return stable_bucket_series(subj.combine_chunks() if isinstance(subj, pa.ChunkedArray) else subj, nbuckets)


def _wide(n: int, **cols) -> pa.Table:
    data = {}
    for name, typ in WIDE_FIELDS:
        if name in cols:
            v = cols[name]
            data[name] = v if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.array(v, typ)
        else:
            fill = 0 if name == "bucket" else ""
            data[name] = pa.array([fill] * n, typ)
    return pa.table(data).cast(WIDE_SCHEMA)


def arcs_to_wide(nbuckets: int, include_inverse: bool):
    """map_batches fn: triples batch -> wide arc rows (+ reversed copies)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        subj = batch.column("subj").combine_chunks()
        out = _wide(
            n,
            role=pa.array(["arc"] * n, pa.string()),
            subj=subj,
            pred=batch.column("pred").combine_chunks(),
            obj_kind=batch.column("obj_kind").combine_chunks(),
            obj_lex=batch.column("obj_lex").combine_chunks(),
            obj_dt=batch.column("obj_dt").combine_chunks(),
            obj_lang=batch.column("obj_lang").combine_chunks(),
            bucket=stable_bucket_series(subj, nbuckets),
        )
        if not include_inverse:
            return out
        # reversed copies live in the object's bucket (only IRI/bnode objects
        # can be focus nodes of incoming arcs)
        mask = pc.not_equal(batch.column("obj_kind"), "literal")
        rev = batch.filter(mask)
        m = rev.num_rows
        okind = rev.column("obj_kind").combine_chunks()
        olex = rev.column("obj_lex").combine_chunks()
        ostr = pc.if_else(
            pc.equal(okind, "bnode"),
            pc.binary_join_element_wise("_:", olex, ""),
            olex,
        )
        rout = _wide(
            m,
            role=pa.array(["rarc"] * m, pa.string()),
            subj=rev.column("subj").combine_chunks(),
            pred=rev.column("pred").combine_chunks(),
            obj_kind=okind,
            obj_lex=olex,
            obj_dt=rev.column("obj_dt").combine_chunks(),
            obj_lang=rev.column("obj_lang").combine_chunks(),
            bucket=stable_bucket_series(ostr.combine_chunks() if isinstance(ostr, pa.ChunkedArray) else ostr, nbuckets),
        )
        return pa.concat_tables([out, rout])

    return fn


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


class _DistShacl(ShaclValidator):
    """Bucket-local SHACL evaluator with cross-bucket dependency capture."""

    def __init__(self, schema, graph, assumptions, is_local_key, record_dep):
        super().__init__(schema, graph)
        self.assumptions = assumptions
        self.is_local_key = is_local_key
        self.record_dep = record_dep
        self.provisional = False
        self._closure = schema.get("subclass_closure", {})

    def conforms(self, focus_key, shape_key):
        a = self.assumptions.get((focus_key, shape_key))
        if a is not None:
            return a
        if not self.is_local_key(focus_key):
            self.record_dep(focus_key, shape_key)
            self.provisional = True
            return True
        return super().conforms(focus_key, shape_key)

    def _subclasses(self, cls_key):
        return set(self._closure.get(cls_key, [cls_key]))

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

    def path_values(self, focus_key, path):
        if set(path) <= {"pred"} or ("inverse" in path and "pred" in path["inverse"]):
            return super().path_values(focus_key, path)
        raise _NeedRemote(
            "multi-hop SHACL paths are not supported in distributed mode"
        )


class EvalGroup:
    """map_groups callable: evaluate one bucket's pending pairs.

    Schema is deserialized ONCE per actor (SURVEY.md A1) — pass
    ``compute``/``concurrency`` for an actor pool on large runs.
    """

    def __init__(self, schema_ref, engine: str, nbuckets: int):
        self.schema = ray.get(schema_ref) if isinstance(schema_ref, ray.ObjectRef) else schema_ref
        self.engine = engine
        self.nbuckets = nbuckets

    def __call__(self, group: pa.Table) -> pa.Table:
        nb = self.nbuckets
        role = group.column("role")
        bucket_vals = group.column("bucket")
        this_bucket = bucket_vals[0].as_py() if group.num_rows else 0

        arcs_mask = pc.equal(role, "arc")
        arc_tbl = group.filter(arcs_mask)
        triples = []
        d = arc_tbl.select(["subj", "pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang"]).to_pydict()
        for i in range(arc_tbl.num_rows):
            s = d["subj"][i]
            sterm = ("bnode", s[2:]) if s.startswith("_:") else ("iri", s)
            k = d["obj_kind"][i]
            if k == "iri":
                o = ("iri", d["obj_lex"][i])
            elif k == "bnode":
                o = ("bnode", d["obj_lex"][i])
            else:
                o = ("lit", d["obj_lex"][i], d["obj_dt"][i], d["obj_lang"][i])
            triples.append((sterm, d["pred"][i], o))
        graph = Graph(triples)
        # incoming arcs routed as reversed copies
        rarc_tbl = group.filter(pc.equal(role, "rarc"))
        rd_ = rarc_tbl.select(["subj", "pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang"]).to_pydict()
        for i in range(rarc_tbl.num_rows):
            s = rd_["subj"][i]
            sterm = ("bnode", s[2:]) if s.startswith("_:") else ("iri", s)
            k = rd_["obj_kind"][i]
            o = ("iri", rd_["obj_lex"][i]) if k == "iri" else ("bnode", rd_["obj_lex"][i])
            graph.by_obj[term_key(o)].append((rd_["pred"][i], sterm))

        asm_tbl = group.filter(pc.equal(role, "asm"))
        assumptions = {}
        ad = asm_tbl.select(["node", "shape", "val"]).to_pydict()
        for i in range(asm_tbl.num_rows):
            assumptions[(ad["node"][i], ad["shape"][i])] = ad["val"][i] == "conforms"

        local_subjects = set(graph.by_subj)

        def is_local_key(nk: str) -> bool:
            if nk[0] == "L":
                # literals are never subjects: empty out-neighborhood is
                # correct in any bucket
                return True
            subj = nk[1:] if nk[0] == "I" else "_:" + nk[1:]
            return stable_bucket(subj, nb) == this_bucket

        def is_local_term(t: tuple) -> bool:
            return is_local_key(term_key(t))

        out_rows = {name: [] for name, _ in WIDE_FIELDS}

        def emit(role_, **kw):
            for name, typ in WIDE_FIELDS:
                if name == "role":
                    out_rows["role"].append(role_)
                elif name == "bucket":
                    out_rows["bucket"].append(kw.get("bucket", 0))
                else:
                    out_rows[name].append(kw.get(name, ""))

        task_tbl = group.filter(pc.equal(role, "task"))
        td = task_tbl.select(["node", "shape"]).to_pydict()
        seen_tasks = set()
        for i in range(task_tbl.num_rows):
            nk, shape_key = td["node"][i], td["shape"][i]
            if (nk, shape_key) in seen_tasks:
                continue
            seen_tasks.add((nk, shape_key))
            deps: set = set()

            def record_dep(cnk, cshape):
                deps.add((cnk, cshape))

            try:
                if shape_key.startswith("class:"):
                    cls_key = shape_key[len("class:") :]
                    v = _DistShacl(self.schema, graph, assumptions, is_local_key, record_dep)
                    ok = ShaclValidator._is_instance(v, nk, cls_key)
                    emit("res", node=nk, shape=shape_key, val="conforms" if ok else "notConforms")
                    continue
                if self.engine == "shex":
                    v = _DistShEx(self.schema, graph, assumptions, is_local_term, record_dep)
                    node = key_to_term(nk)
                    ok = v.validate_node_shape(node, shape_key if shape_key != "START" else None)
                    if not v.provisional:
                        emit("res", node=nk, shape=shape_key, val="conforms" if ok else "notConforms")
                else:
                    v = _DistShacl(self.schema, graph, assumptions, is_local_key, record_dep)
                    results = v.validate_shape(nk, shape_key)
                    if not v.provisional:
                        emit(
                            "res",
                            node=nk,
                            shape=shape_key,
                            val="conforms" if not results else "notConforms",
                        )
                        for r in results:
                            emit(
                                "rep",
                                node=r["focus"],
                                shape=r["source"],
                                pred=r["path"] or "",
                                obj_lex=r["value"] or "",
                                obj_dt=r["severity"],
                                obj_lang=r["message"],
                                component=r["component"],
                            )
            except _NeedRemote as e:
                emit("res", node=nk, shape=shape_key, val=f"error:{e}")
                continue
            for cnk, cshape in sorted(deps):
                emit("dep", node=cnk, shape=cshape, pnode=nk, pshape=shape_key)

        out = pa.table(
            {name: pa.array(vals, typ) for (name, typ), vals in zip(WIDE_FIELDS, out_rows.values())}
        ).cast(WIDE_SCHEMA)
        return out


def distributed_validate(
    triples_ds,
    engine: str,
    schema: dict,
    focus_tasks: pa.Table,
    nbuckets: int = 32,
    include_inverse: bool = False,
    max_rounds: int = 12,
):
    """Run the BSP typing fixpoint.

    ``focus_tasks``: pa.Table(node: term key, shape: shape key).
    Returns (typing_table, report_table) as pyarrow Tables.
    """
    if engine == "shex":
        register_inline_shapes(schema)
    schema_ref = ray.put(schema)

    arcs = triples_ds.map_batches(
        arcs_to_wide(nbuckets, include_inverse), batch_format="pyarrow"
    ).materialize()

    typing: dict[tuple[str, str], str] = {}
    dep_edges: set[tuple[str, str, str, str]] = set()  # child nk, child shape, parent nk, parent shape
    reports: list[pa.Table] = []
    pending: set[tuple[str, str]] = {
        (n, s)
        for n, s in zip(
            focus_tasks.column("node").to_pylist(), focus_tasks.column("shape").to_pylist()
        )
    }
    root_tasks = set(pending)

    rounds = 0
    cycle_broken = False
    while pending and rounds < max_rounds:
        rounds += 1
        # task rows routed to each node's bucket
        nodes = pa.array([n for n, _ in sorted(pending)], pa.string())
        shapes_a = pa.array([s for _, s in sorted(pending)], pa.string())
        tasks_wide = _wide(
            len(nodes),
            role=pa.array(["task"] * len(nodes), pa.string()),
            node=nodes,
            shape=shapes_a,
            bucket=_node_key_bucket_col(nodes, nbuckets),
        )
        # assumptions: every decided (node, shape) needed by a pending parent,
        # routed to the parent's bucket
        asm_rows = []
        for cnk, cs, pnk, ps in dep_edges:
            if (pnk, ps) in pending and (cnk, cs) in typing:
                asm_rows.append((cnk, cs, typing[(cnk, cs)], pnk))
        if asm_rows:
            anodes = pa.array([r[0] for r in asm_rows], pa.string())
            ashapes = pa.array([r[1] for r in asm_rows], pa.string())
            avals = pa.array([r[2] for r in asm_rows], pa.string())
            apar = pa.array([r[3] for r in asm_rows], pa.string())
            asm_wide = _wide(
                len(asm_rows),
                role=pa.array(["asm"] * len(asm_rows), pa.string()),
                node=anodes,
                shape=ashapes,
                val=avals,
                bucket=_node_key_bucket_col(apar, nbuckets),
            )
        else:
            asm_wide = _wide(0)

        round_ds = arcs.union(rd.from_arrow(tasks_wide), rd.from_arrow(asm_wide))
        out = (
            round_ds.groupby("bucket")
            .map_groups(
                EvalGroup,
                fn_constructor_args=(schema_ref, engine, nbuckets),
                batch_format="pyarrow",
                concurrency=(1, 8),
            )
            .materialize()
        )
        batches = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
        out_tbl = pa.concat_tables(batches) if batches else _wide(0)

        progress = False
        res = out_tbl.filter(pc.equal(out_tbl.column("role"), "res"))
        rdict = res.select(["node", "shape", "val"]).to_pydict()
        for i in range(res.num_rows):
            key = (rdict["node"][i], rdict["shape"][i])
            if key not in typing:
                typing[key] = rdict["val"][i]
                progress = True
            pending.discard(key)
        rep = out_tbl.filter(pc.equal(out_tbl.column("role"), "rep"))
        if rep.num_rows:
            reports.append(rep)
        dep = out_tbl.filter(pc.equal(out_tbl.column("role"), "dep"))
        ddict = dep.select(["node", "shape", "pnode", "pshape"]).to_pydict()
        for i in range(dep.num_rows):
            edge = (ddict["node"][i], ddict["shape"][i], ddict["pnode"][i], ddict["pshape"][i])
            if edge not in dep_edges:
                dep_edges.add(edge)
                progress = True
            ck = (edge[0], edge[1])
            if ck not in typing and ck not in pending:
                pending.add(ck)
                progress = True

        if not progress:
            if cycle_broken:
                break
            # cross-bucket cycle: close coinductively (assume conforms)
            for cnk, cs, pnk, ps in dep_edges:
                if (cnk, cs) in pending:
                    typing[(cnk, cs)] = "conforms"
                    pending.discard((cnk, cs))
            cycle_broken = True

    typing_tbl = pa.table(
        {
            "node": pa.array([k[0] for k in sorted(typing)], pa.string()),
            "shape": pa.array([k[1] for k in sorted(typing)], pa.string()),
            "val": pa.array([typing[k] for k in sorted(typing)], pa.string()),
            "is_focus": pa.array([k in root_tasks for k in sorted(typing)], pa.bool_()),
        }
    )
    if reports:
        rep_all = pa.concat_tables(reports)
        report_tbl = pa.table(
            {
                "focus_node": rep_all.column("node"),
                "path": rep_all.column("pred"),
                "value_lex": rep_all.column("obj_lex"),
                "source_shape": rep_all.column("shape"),
                "component": rep_all.column("component"),
                "severity": rep_all.column("obj_dt"),
                "message": rep_all.column("obj_lang"),
            }
        )
    else:
        report_tbl = pa.table(
            {
                "focus_node": pa.array([], pa.string()),
                "path": pa.array([], pa.string()),
                "value_lex": pa.array([], pa.string()),
                "source_shape": pa.array([], pa.string()),
                "component": pa.array([], pa.string()),
                "severity": pa.array([], pa.string()),
                "message": pa.array([], pa.string()),
            }
        )
    return typing_tbl, report_tbl


# ---------------------------------------------------------------------------
# SHACL target resolution over the triples Dataset (SURVEY.md J2)

def resolve_shacl_targets(triples_ds, schema: dict) -> pa.Table:
    """Compute (node term key, shape key) focus pairs with vectorized
    Dataset filters; also attaches the data-graph subclass closure to the
    schema (small side, collected on the driver)."""
    sub_rows = triples_ds.filter(
        lambda r: r["pred"] == RDFS_SUBCLASS, concurrency=2
    ).take_all()
    children: dict[str, set[str]] = {}
    for r in sub_rows:
        child = subj_to_key(r["subj"])
        parent = "I" + r["obj_lex"] if r["obj_kind"] == "iri" else "B" + r["obj_lex"]
        children.setdefault(parent, set()).add(child)

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

    # collect per-shape target specs
    class_targets: list[tuple[str, str]] = []  # (class key, shape key)
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

    def find_targets(batch: pa.Table) -> pa.Table:
        nodes, shapes = [], []
        pred = batch.column("pred")
        for cls_iris, sk in spec["class_targets"]:
            mask = pc.and_(
                pc.equal(pred, RDF_TYPE),
                pc.is_in(batch.column("obj_lex"), value_set=pa.array(sorted(cls_iris))),
            )
            for s in pc.filter(batch.column("subj"), mask).to_pylist():
                nodes.append(subj_to_key(s))
                shapes.append(sk)
        for p, sk in spec["subjects_of"]:
            mask = pc.equal(pred, p)
            for s in pc.filter(batch.column("subj"), mask).to_pylist():
                nodes.append(subj_to_key(s))
                shapes.append(sk)
        for p, sk in spec["objects_of"]:
            mask = pc.equal(pred, p)
            sub = batch.filter(mask)
            for k, lx, dt, lg in zip(
                sub.column("obj_kind").to_pylist(),
                sub.column("obj_lex").to_pylist(),
                sub.column("obj_dt").to_pylist(),
                sub.column("obj_lang").to_pylist(),
            ):
                nodes.append(obj_key(k, lx, dt, lg))
                shapes.append(sk)
        return pa.table(
            {"node": pa.array(nodes, pa.string()), "shape": pa.array(shapes, pa.string())}
        )

    found = triples_ds.map_batches(find_targets, batch_format="pyarrow").take_all()
    pairs = {(r["node"], r["shape"]) for r in found}
    pairs.update(node_pairs)
    pairs_sorted = sorted(pairs)
    return pa.table(
        {
            "node": pa.array([p[0] for p in pairs_sorted], pa.string()),
            "shape": pa.array([p[1] for p in pairs_sorted], pa.string()),
        }
    )


def _all_class_params(schema: dict) -> set[str]:
    out = set()
    for sh in schema["shapes"].values():
        if not sh:
            continue
        for kind, params in sh["components"]:
            if kind == "class":
                out.add(params["cls"])
    return out
