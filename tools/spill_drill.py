"""Spill/OOM drill for the curation exchanges (VERDICT r4 item 8).

The KG validation path has mmap-spill + big-bucket evidence; this drill
covers the curation side: run the full checkpointed curation pipeline —
including the substring-dedup span exchange, the heaviest all-to-all the
curation path owns — over the ×FACTOR permuted corpus inside a Ray
session whose object store is deliberately tiny, so the exchanges MUST
stream through plasma spill instead of holding the corpus in memory.

Pass criterion: the run completes with correct output counts AND the
raylet reports objects spilled to disk (i.e. the pipeline's liveness
never depends on the store fitting the data — the property that holds
on a 100-TB cluster where it never does).

Usage: python tools/spill_drill.py [--factor 300] [--store-mb 512]
Prints one JSON line with wall, kept/chunks counts, and spill stats.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=300)
    ap.add_argument("--store-mb", type=int, default=512)
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from bench import _build_curation_scale_input

    corpus = _build_curation_scale_input(args.sf_dir, args.factor)

    import ray

    # spill dir on real disk (/tmp), NOT /dev/shm — the point is that the
    # store overflows to storage the way a loaded cluster node's does
    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        object_store_memory=args.store_mb * 1024 * 1024,
        logging_level="ERROR",
        log_to_driver=False,
        _system_config={
            "object_spilling_config": json.dumps(
                {"type": "filesystem",
                 "params": {"directory_path": "/tmp/graft_spill"}}
            )
        },
    )
    from shaclex_ray.pipelines.curation import run_curation_pipeline

    out = "/tmp/graft_bench/spill_drill"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_curation_pipeline(corpus, out, resume=False, substring_dedup=True)
    wall = time.perf_counter() - t0

    # spill evidence straight from the raylet's own accounting (the
    # grpc-based memory_summary API is unavailable in this container —
    # no grpc module — so read the raylet log of THIS session directly)
    session_dir = ray._private.worker.global_worker.node.get_session_dir_path()
    spilled = []
    for logname in ("raylet.out", "raylet.err"):
        p = os.path.join(session_dir, "logs", logname)
        if os.path.exists(p):
            with open(p, errors="replace") as fh:
                spilled += [
                    l.strip() for l in fh
                    if "Spilled" in l or "spill" in l.lower()
                ][-5:]
    print(json.dumps({
        "metric": "curation_spill_drill",
        "factor": args.factor,
        "object_store_mb": args.store_mb,
        "num_cpus": args.num_cpus,
        "wall_s": round(wall, 1),
        "kept": res["kept"],
        "chunks": res["chunks"],
        "spill_lines": spilled,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
