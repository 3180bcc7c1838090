"""The flagship end-to-end KG-construction pipeline (north star):

  read interleaved documents → extract triples (lineage-carrying) →
  entity-link + canonicalize → exact dedup → materialize triple table →
  validate in-pipeline against SHACL shapes (distributed BSP fixpoint) →
  typing + validation-report tables

Stage outputs checkpoint to partitioned parquet with manifests
(state/checkpoint.py), so a failed run resumes from the last finished
stage. Equivalent reference flow: parse → schema → trigger → validate →
report (weso/shaclex src/main/scala/es/weso/shaclex/Main.scala:103-135),
re-expressed as streaming Dataset stages.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from shaclex_ray.rdfio import parse_turtle
from shaclex_ray.shapes.shacl import compile_shacl
from shaclex_ray.sources.documents import read_documents
from shaclex_ray.stages.dedup import dedup_triples, dedup_triples_fast
from shaclex_ray.stages.extract import extract_triples
from shaclex_ray.stages.link import build_entity_links, canonicalize_triples
from shaclex_ray.state.checkpoint import StageRunner, ensure_parquet_schema
from shaclex_ray.validate.dist import distributed_validate

# canonical stage-output schemas — written as an empty part when a stage
# produces zero rows, so pruned read-backs never hit a file-less directory
TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj_kind", pa.string()),
        ("obj_lex", pa.string()),
        ("obj_dt", pa.string()),
        ("obj_lang", pa.string()),
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
    ]
)
LINKS_SCHEMA = pa.schema(
    [("mention", pa.string()), ("canonical_iri", pa.string())]
)

# SHACL shapes for the constructed KG — parsed with our own Turtle parser.
# DocumentShape's ex:mentions sh:class ex:Entity forces a cross-bucket
# typing join (the fixpoint's round-2 dependency); ex:mentions sh:minCount 1
# makes mention-free documents non-conformant (deliberate mixed outcomes).
KG_SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:DocumentShape a sh:NodeShape ;
  sh:targetClass ex:Document ;
  sh:property [ sh:path ex:lang ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:datatype xsd:string ] ;
  sh:property [ sh:path ex:source ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:datatype xsd:string ] ;
  sh:property [ sh:path ex:mentions ; sh:nodeKind sh:IRI ;
                sh:class ex:Entity ; sh:minCount 1 ] ;
  sh:property [ sh:path ex:hasMedia ; sh:nodeKind sh:IRI ] .

ex:EntityShape a sh:NodeShape ;
  sh:targetClass ex:Entity ;
  sh:property [ sh:path ex:surface ; sh:minCount 1 ; sh:maxCount 1 ;
                sh:datatype xsd:string ] .
"""


def kg_schema() -> dict:
    return compile_shacl(parse_turtle(KG_SHAPES_TTL))


def build_triples(sf_dir: str):
    """documents → canonical deduped triple Dataset (no checkpointing —
    the streaming composition used by queries()/tests). Broadcast-size
    link tables take the fused canonicalize+dedup exchange (same rows,
    pinned by tests/test_dedup_kernel.py)."""
    docs = read_documents(sf_dir)
    raw = extract_triples(docs).materialize()
    links = build_entity_links(raw)
    if isinstance(links, pa.Table):
        from shaclex_ray.stages.link import entity_triples

        t1, t2 = entity_triples(links)
        dd = dedup_triples_fast(
            raw, canonicalize_with=links, extra_tables=[t1, t2]
        )
        return dd, links
    cano = canonicalize_triples(raw, links)
    return dedup_triples(cano), links


def run_kg_pipeline(
    sf_dir: str,
    out_dir: str,
    nbuckets: int | None = None,
    validate: bool = True,
    resume: bool = True,
):
    """Checkpointed end-to-end run. Returns dict of result handles.

    ``nbuckets`` defaults to the cluster CPU count — partition count grows
    with the cluster, as it would across real node counts."""
    if nbuckets is None:
        import ray as _ray

        nbuckets = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    runner = StageRunner(out_dir, resume=resume)
    # digest covers inputs AND code/shape revision, so stale checkpoints
    # from an older engine version are never resumed
    import hashlib as _hl

    import shaclex_ray as _pkg

    rev = _hl.md5((_pkg.__version__ + KG_SHAPES_TTL).encode()).hexdigest()[:12]
    digest = f"{sf_dir}|nb={nbuckets}|rev={rev}"

    # extract is PARTITION-checkpointed: one restartable task per input
    # row-group range, each streaming its docs through the vectorized span
    # + triple kernels straight into its own parquet shard with a lineage
    # manifest. A run that dies mid-extract resumes at the partition
    # boundary, not the stage boundary. (Non-parquet inputs — the Lance
    # lane — take the stage-granular streaming produce instead: Lance
    # fragments don't slice like parquet row groups.)
    import os as _os0

    if _os0.path.exists(f"{sf_dir}/documents.parquet"):
        from shaclex_ray.sources.documents import document_partitions
        from shaclex_ray.stages.extract import extract_partition

        raw = runner.run_partitioned(
            "triples_raw",
            digest,
            document_partitions(sf_dir),
            extract_partition,
            lambda p: rd.read_parquet(p),
            empty_schema=TRIPLES_SCHEMA,
        )
    else:

        def produce_raw(path):
            import glob as _glob

            import pyarrow.parquet as _pq

            extract_triples(read_documents(sf_dir)).write_parquet(path)
            return sum(
                _pq.ParquetFile(f).metadata.num_rows
                for f in _glob.glob(f"{path}/*.parquet")
            )

        raw = runner.run(
            "triples_raw",
            digest,
            produce_raw,
            lambda p: rd.read_parquet(p),
            empty_schema=TRIPLES_SCHEMA,
        )

    def produce_links(path):
        import os as _os3

        _os3.makedirs(f"{path}/shards", exist_ok=True)
        # mention harvesting touches only (pred, obj_lex): prune at the read
        raw_pruned = rd.read_parquet(
            f"{out_dir}/triples_raw", columns=["pred", "obj_lex"]
        )
        links = build_entity_links(raw_pruned)
        if isinstance(links, pa.Table):
            import pyarrow.parquet as pq

            pq.write_table(links, f"{path}/shards/links.parquet")
            return links.num_rows
        # distributed regime: the links Dataset checkpoints as parquet
        # SHARDS, written by the workers — never concatenated on the driver
        links = links.materialize()
        links.write_parquet(f"{path}/shards")
        n = links.count()
        if n == 0:
            ensure_parquet_schema(f"{path}/shards", LINKS_SCHEMA)
        return n

    def read_links(path):
        """Size-adaptive read-back: small link tables load driver-side for
        the broadcast rewrite; big ones stay a lazy shard Dataset feeding
        the join rewrite."""
        import os as _os2

        import pyarrow.parquet as pq

        shard_dir = f"{path}/shards"
        n = sum(
            pq.ParquetFile(f"{shard_dir}/{f}").metadata.num_rows
            for f in _os2.listdir(shard_dir)
            if f.endswith(".parquet")
        )
        if n < int(_os.environ.get("SHACLEX_LINK_BCAST_THRESHOLD", "5000000")):
            tbl = pq.read_table(shard_dir)
            order = pa.compute.sort_indices(tbl.column("mention"))
            return tbl.take(order)
        return rd.read_parquet(shard_dir)

    import os as _os

    links = runner.run("entity_links", digest, produce_links, read_links)

    def produce_canonical(path):
        bcast_max = int(_os.environ.get("SHACLEX_LINK_BCAST_THRESHOLD", "5000000"))
        if isinstance(links, pa.Table) and links.num_rows < bcast_max:
            # broadcast regime: canonicalization FUSES into the dedup
            # exchange's map side, and the split tasks read the raw-triples
            # checkpoint shards DIRECTLY — neither the raw input nor the
            # rewritten table stages through the object store
            from shaclex_ray.stages.dedup import dedup_triples_fast_from_parquet
            from shaclex_ray.stages.link import entity_triples

            t1, t2 = entity_triples(links)
            dd = dedup_triples_fast_from_parquet(
                f"{out_dir}/triples_raw",
                nbuckets=nbuckets,
                canonicalize_with=links,
                extra_tables=[t1, t2],
            ).materialize()
        else:
            cano = canonicalize_triples(raw, links)
            dd = dedup_triples_fast(cano, nbuckets=nbuckets).materialize()
        dd.write_parquet(path)
        return dd.count()

    triples = runner.run(
        "triples_canonical",
        digest,
        produce_canonical,
        lambda p: rd.read_parquet(p),
        empty_schema=TRIPLES_SCHEMA,
    )

    out = {"triples": triples, "links": links, "metrics": runner.metrics}
    if validate:

        def produce_validation(path):
            schema = kg_schema()
            # size the actor fleet to the DATA: a 100k-triple corpus must
            # not pay 32 actor spawns (cluster-sized nbuckets stays the
            # cap so big corpora use the whole cluster)
            import glob as _glob
            import math as _math

            import pyarrow.parquet as _pq

            canon_rows = sum(
                _pq.ParquetFile(f).metadata.num_rows
                for f in _glob.glob(f"{out_dir}/triples_canonical/*.parquet")
            )
            nb = max(1, min(nbuckets, _math.ceil(canon_rows / 100_000)))
            # targets derive in-bucket (focus="shacl-targets"): the split
            # scan is the ONLY pass over the triples; bucket actors write
            # their own typing/report shards — the full tables never
            # concat on the driver
            typing_ds, _report_ds = distributed_validate(
                triples, "shacl", schema, "shacl-targets",
                nbuckets=nb, output_dir=path,
                parquet_path=f"{out_dir}/triples_canonical",
            )
            stats = distributed_validate.last_stats
            return sum(v for k, v in stats.items() if k != "violations")

        def read_validation(path):
            import pyarrow.parquet as pq

            return (
                pq.read_table(f"{path}/typing"),
                pq.read_table(f"{path}/report"),
            )

        typing, report = runner.run(
            "validation", digest, produce_validation, read_validation
        )
        out["typing"] = typing
        out["report"] = report
    runner.write_metrics()
    return out
