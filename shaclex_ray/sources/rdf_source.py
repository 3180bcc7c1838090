"""RDF file sources/sinks (SURVEY.md S1/S9/S13).

  * N-Triples: line-splittable → ``read_text`` + per-batch parse, fully
    parallel (the reference funnels every format through a single in-heap
    Jena model, Main.scala:253-274; N-Triples is our parallel-native format)
  * Turtle: not line-splittable → one parse task per file
    (``read_binary_files`` + flat_map)
  * N-Triples sink: vectorized render to one `line` column, written with a
    text datasink (one file per block — resumable layout)
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from shaclex_ray.rdfio import parse_turtle
from shaclex_ray.terms import (
    TRIPLES_SCHEMA,
    XSD_STRING,
    term_str,
    triples_to_table,
)


def _parse_lines_batch(batch: pa.Table) -> pa.Table:
    text = "\n".join(batch.column("text").to_pylist())
    triples = parse_turtle(text)  # N-Triples ⊂ Turtle
    return triples_to_table(triples)


def read_ntriples(paths, **kwargs) -> "ray.data.Dataset":
    """Parallel N-Triples reader → triples Dataset (TRIPLES_SCHEMA)."""
    ds = ray.data.read_text(paths, **kwargs)
    return ds.map_batches(_parse_lines_batch, batch_format="pyarrow")


def read_turtle_files(paths, **kwargs) -> "ray.data.Dataset":
    """Turtle reader: one parse task per file (Turtle needs whole-document
    prefix state, so files are the parallelism unit)."""
    ds = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse_file(row):
        # bnode ids are file-scoped (reference semantics: bnodes are
        # graph-scoped, SURVEY.md O6) so cross-file joins stay disjoint
        triples = parse_turtle(
            row["bytes"].decode("utf-8"),
            base="file://" + row["path"],
            bnode_prefix=row["path"] + "#",
        )
        tbl = triples_to_table(triples, doc_id=row["path"])
        return tbl.to_pylist()

    return ds.flat_map(parse_file)


def read_rdfxml_files(paths, **kwargs) -> "ray.data.Dataset":
    """RDF/XML reader: one parse task per file (document-scoped syntax,
    like Turtle — files are the parallelism unit; DataFormats parity with
    the reference, DataFormats.scala:8-29)."""
    from shaclex_ray.rdfio.rdfxml import parse_rdfxml

    ds = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse_file(row):
        triples = parse_rdfxml(
            row["bytes"].decode("utf-8"),
            base="file://" + row["path"],
            bnode_prefix=row["path"] + "#",
        )
        tbl = triples_to_table(triples, doc_id=row["path"])
        return tbl.to_pylist()

    return ds.flat_map(parse_file)


def _looks_like_rdfjson(doc) -> bool:
    """RDF/JSON vs JSON-LD sniff: RDF/JSON is {subject: {pred: [value-obj…]}}
    with no '@'-keyword keys; JSON-LD node objects carry @id/@context/@graph
    (or are arrays). A value object must have 'type' and 'value'."""
    if not isinstance(doc, dict) or not doc:
        return False
    for s, po in doc.items():
        if s.startswith("@") or not isinstance(po, dict):
            return False
        for vals in po.values():
            if not isinstance(vals, list):
                return False
            for vo in vals:
                if not isinstance(vo, dict) or "type" not in vo or "value" not in vo:
                    return False
    return True


def parse_rdf_text(text: str, fmt: str | None = None, base: str = "", bnode_prefix: str = ""):
    """Driver-side any-format parse (format sniffed when not given):
    'turtle' (⊇ N-Triples, ⊆ TriG), 'rdfxml', 'jsonld' or 'rdfjson'."""
    if fmt is None:
        stripped = text.lstrip()
        if stripped.startswith("<?xml") or stripped.startswith("<rdf:"):
            fmt = "rdfxml"
        elif stripped.startswith(("{", "[")):
            # '[' and '{' also start valid Turtle/TriG (bnode property
            # list / default-graph block) — only actual JSON is JSON-LD
            import json as _json

            try:
                doc = _json.loads(text)
                fmt = "rdfjson" if _looks_like_rdfjson(doc) else "jsonld"
            except ValueError:
                fmt = "turtle"
        else:
            fmt = "turtle"
    if fmt in ("rdfxml", "rdf/xml", "xml"):
        from shaclex_ray.rdfio.rdfxml import parse_rdfxml

        return parse_rdfxml(text, base=base, bnode_prefix=bnode_prefix)
    if fmt in ("rdfjson", "rdf/json", "rdf-json"):
        from shaclex_ray.rdfio.rdfjson import parse_rdfjson

        return parse_rdfjson(text, base=base, bnode_prefix=bnode_prefix)
    if fmt in ("jsonld", "json-ld", "json"):
        from shaclex_ray.rdfio.jsonld import parse_jsonld

        return parse_jsonld(text, base=base, bnode_prefix=bnode_prefix)
    return parse_turtle(text, base=base, bnode_prefix=bnode_prefix)


def read_jsonld_files(paths, **kwargs) -> "ray.data.Dataset":
    """JSON-LD reader: one parse task per file (document-scoped contexts)."""
    from shaclex_ray.rdfio.jsonld import parse_jsonld

    ds = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse_file(row):
        triples = parse_jsonld(
            row["bytes"].decode("utf-8"),
            base="file://" + row["path"],
            bnode_prefix=row["path"] + "#",
        )
        tbl = triples_to_table(triples, doc_id=row["path"])
        return tbl.to_pylist()

    return ds.flat_map(parse_file)


def read_rdfjson_files(paths, **kwargs) -> "ray.data.Dataset":
    """RDF/JSON reader: one parse task per file (document-scoped bnode
    labels, like the other document syntaxes)."""
    from shaclex_ray.rdfio.rdfjson import parse_rdfjson

    ds = ray.data.read_binary_files(paths, include_paths=True, **kwargs)

    def parse_file(row):
        triples = parse_rdfjson(
            row["bytes"].decode("utf-8"),
            base="file://" + row["path"],
            bnode_prefix=row["path"] + "#",
        )
        tbl = triples_to_table(triples, doc_id=row["path"])
        return tbl.to_pylist()

    return ds.flat_map(parse_file)


def write_triples(triples_ds, path: str) -> str:
    """North-star triple sink (SURVEY.md S13): Lance when the package is
    available, else partitioned parquet with the identical Arrow schema."""
    try:
        import lance  # noqa: F401

        triples_ds.write_lance(path)
        return "lance"
    except ImportError:
        triples_ds.write_parquet(path)
        return "parquet"


def render_ntriples_batch(batch: pa.Table) -> pa.Table:
    """Triples batch -> one N-Triples text line per row (vectorized-ish;
    escaping rare in practice, handled per-row only for literals)."""
    import pyarrow.compute as pc

    subj = batch.column("subj").to_pylist()
    pred = batch.column("pred").to_pylist()
    okind = batch.column("obj_kind").to_pylist()
    olex = batch.column("obj_lex").to_pylist()
    odt = batch.column("obj_dt").to_pylist()
    olang = batch.column("obj_lang").to_pylist()
    lines = []
    for s, p, k, lx, dt, lg in zip(subj, pred, okind, olex, odt, olang):
        sstr = s if s.startswith("_:") else f"<{s}>"
        if k == "iri":
            ostr = f"<{lx}>"
        elif k == "bnode":
            ostr = "_:" + lx
        else:
            ostr = term_str(("lit", lx, dt or XSD_STRING, lg))
        lines.append(f"{sstr} <{p}> {ostr} .")
    return pa.table({"line": pa.array(lines, pa.string())})


def write_ntriples(triples_ds, path: str):
    """Write the triple table as N-Triples part-files (one per block)."""
    import os

    os.makedirs(path, exist_ok=True)
    lines = triples_ds.map_batches(render_ntriples_batch, batch_format="pyarrow")

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib

        body = "\n".join(batch.column("line").to_pylist()) + "\n"
        name = hashlib.md5(body.encode()).hexdigest()[:16]
        with open(os.path.join(path, f"part-{name}.nt"), "w") as f:
            f.write(body)
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    counts = lines.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sum(r["rows"] for r in counts)
