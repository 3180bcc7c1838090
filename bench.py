"""Benchmark driver: headline KG pipeline + operator timings over
$GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "triples_per_sec": ...}

--scaling: runs the headline pipeline in two fresh subprocesses
(num_cpus=8 and num_cpus=32) on the same input and reports throughput at
both plus the scaling efficiency (the sandbox substitute for the north
rule's N vs 4N cluster sizes — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )


def run_headline(sf_dir: str, out_dir: str, nbuckets: int | None = None) -> dict:
    """Full pipeline: docs -> triples -> links -> canonical -> validate."""
    from shaclex_ray.pipelines.kg import run_kg_pipeline

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    out = run_kg_pipeline(sf_dir, out_dir, nbuckets=nbuckets, resume=False)
    wall = time.perf_counter() - t0
    n_triples = out["triples"].count()
    return {
        "wall_sec": wall,
        "triples": n_triples,
        "triples_per_sec": n_triples / wall,
        "stages": {k: round(v.get("wall_sec", 0), 3) for k, v in out["metrics"].items()},
    }


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as e

    import ray.data

    timings = {}
    qs = e.queries()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.count()  # force execution
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings


def _build_scale_input(sf_dir: str, factor: int) -> str:
    """Deterministic corpus enlargement: replicate documents.parquet with
    offset doc_ids (content-identical copies; linking/dedup behavior is
    unchanged, volume scales by ``factor``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out_dir = f"{base}/graft_scale_input_x{factor}"
    marker = os.path.join(out_dir, "_built.json")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{sf_dir}/documents.parquet")
    n = src.num_rows
    parts = []
    for k in range(factor):
        t = src.set_column(
            src.schema.get_field_index("doc_id"),
            "doc_id",
            pa.compute.add(src.column("doc_id"), k * n),
        )
        parts.append(t)
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out_dir}/documents.parquet", row_group_size=max(1024, (n * factor) // 64))
    for t in ("embeddings",):
        pq.write_table(pq.read_table(f"{sf_dir}/{t}.parquet"), f"{out_dir}/{t}.parquet")
    with open(marker, "w") as f:
        json.dump({"src": sf_dir, "factor": factor, "rows": n * factor}, f)
    return out_dir


def _build_curation_scale_input(sf_dir: str, factor: int) -> str:
    """Curation-scale corpus: ``factor`` replicas of documents.parquet,
    replica k>0 = per-doc token permutation seeded by k (offset doc_ids),
    ONE FILE PER REPLICA.

    Two deliberate differences from ``_build_scale_input``: (a) permuted
    replicas preserve the base corpus's natural duplicate rate — the
    per-token permutation keys are seeded from the DOC'S CONTENT HASH
    (mixed with k and the within-doc position), so identical texts
    permute identically inside every replica and stay exact duplicates,
    while cross-replica pairs don't collide — dedup work scales linearly
    with the corpus instead of quadratically (verbatim replication makes
    EVERY doc a 300-way near-dup: billions of candidate pairs, a corpus
    no curation pipeline is sized for); (b) the many-file layout is the
    one a 100-TB corpus actually has — a single giant parquet file
    serializes the read into one task and caps scaling at 1x regardless
    of CPUs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out_dir = f"{base}/graft_curation_input_x{factor}"
    marker = os.path.join(out_dir, "_built.json")
    if os.path.exists(marker):
        try:
            if json.load(open(marker)).get("layout") == "multifile-cseed":
                return out_dir
        except (OSError, ValueError):
            pass
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)  # stale layout: rebuild
    os.makedirs(f"{out_dir}/documents.parquet", exist_ok=True)
    src = pq.read_table(f"{sf_dir}/documents.parquet")
    n = src.num_rows
    text = src.column("text").combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    did_idx = src.schema.get_field_index("doc_id")
    txt_idx = src.schema.get_field_index("text")
    # content-seeded permutation keys: splitmix64 over (doc content hash,
    # replica k, within-doc position) — identical texts get IDENTICAL
    # permutations in a given replica, preserving exact duplicates
    from shaclex_ray.functions.md5batch import md5_u64_batch

    doc_h = md5_u64_batch(text)[par]
    pos = np.arange(len(par), dtype=np.uint64) - offs[:-1].astype(np.uint64)[par]
    for k in range(factor):
        if k == 0:
            t = src
        else:
            kmix = np.uint64((k * 0x9E3779B97F4A7C15) % (1 << 64))
            x = doc_h + kmix + pos * np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            order = np.lexsort((x, par))
            lst = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), flat.take(pa.array(order))
            )
            t = src.set_column(txt_idx, "text", pc.binary_join(lst, " "))
        t = t.set_column(
            did_idx, "doc_id", pa.compute.add(src.column("doc_id"), k * n)
        )
        pq.write_table(t, f"{out_dir}/documents.parquet/part-{k:05d}.parquet")
    with open(marker, "w") as f:
        json.dump(
            {
                "src": sf_dir,
                "factor": factor,
                "rows": n * factor,
                "layout": "multifile-cseed",
            },
            f,
        )
    return out_dir


def _substrate_calibration(levels=(8, 32)) -> dict:
    """Wall time per parallelism level of a pure embarrassingly-parallel
    CPU burn in fresh Ray sessions — the empirical parallelism ceiling of
    this sandbox (virtualized cores do not deliver 4x; see BASELINE.md).
    Returns {level: wall_sec}; {} on failure."""
    code = (
        "import ray, time, sys\n"
        "n = int(sys.argv[1])\n"
        "ray.init(address='local', num_cpus=n, include_dashboard=False,"
        " logging_level='ERROR', log_to_driver=False)\n"
        "@ray.remote\n"
        "def burn(k):\n"
        "    s = 0\n"
        "    for i in range(20_000_000): s += i*i\n"
        "    return s\n"
        "t0 = time.time(); ray.get([burn.remote(i) for i in range(64)])\n"
        "print(time.time()-t0)\n"
        "ray.shutdown()\n"
    )
    walls = {}
    for n in levels:
        p = subprocess.run(
            [sys.executable, "-c", code, str(n)], capture_output=True, text=True
        )
        try:
            walls[n] = float(p.stdout.strip().splitlines()[-1])
        except (ValueError, IndexError):
            return {}
    return walls


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--curation-scaling" in sys.argv:
        # the second headline (curation pipeline) at two-or-more
        # parallelism levels on the permuted multi-file scale corpus
        factor = int(os.environ.get("GRAFT_SCALE_FACTOR", "300"))
        scale_dir = _build_curation_scale_input(sf_dir, factor)
        levels = sorted(
            int(x)
            for x in os.environ.get("GRAFT_SCALE_LEVELS", "8,32").split(",")
        )
        code = (
            "import ray, sys, time, shutil, json\n"
            "sys.path.insert(0, %r)\n"
            "n, sf = int(sys.argv[1]), sys.argv[2]\n"
            "import os as _os\n"
            "sub = _os.environ.get('GRAFT_SUBSTRING_DEDUP', '0') == '1'\n"
            "ray.init(address='local', num_cpus=n, include_dashboard=False,"
            " logging_level='ERROR', log_to_driver=False)\n"
            "from shaclex_ray.pipelines.curation import run_curation_pipeline\n"
            "from shaclex_ray.sources.documents import parquet_num_rows\n"
            "out = '/tmp/graft_bench/curation_scale_%%d' %% n\n"
            "shutil.rmtree(out, ignore_errors=True)\n"
            "t0 = time.perf_counter()\n"
            "res = run_curation_pipeline(sf, out, resume=False,"
            " substring_dedup=sub)\n"
            "wall = time.perf_counter() - t0\n"
            "nd = parquet_num_rows(sf + '/documents.parquet')\n"
            "print(json.dumps({'wall': wall, 'docs': nd,"
            " 'docs_per_sec': nd / wall, 'kept': res['kept']}))\n"
            "ray.shutdown()\n"
        ) % os.path.dirname(os.path.abspath(__file__))
        os.makedirs("/tmp/graft_bench", exist_ok=True)
        results = {}
        for n in sorted(levels, reverse=True):
            p = subprocess.run(
                [sys.executable, "-c", code, str(n), scale_dir],
                capture_output=True,
                text=True,
            )
            results[n] = json.loads(
                [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            )
            time.sleep(10)
        lo, hi = levels[0], levels[-1]
        sp = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
        cal_walls = _substrate_calibration((lo, hi))
        cal = round(cal_walls[lo] / cal_walls[hi], 3) if cal_walls else 0.0
        out = {
            "metric": "curation_pipeline_scaling",
            "value": round(sp / (hi / lo), 4),
            "unit": "efficiency",
            "substring_dedup": os.environ.get("GRAFT_SUBSTRING_DEDUP", "0") == "1",
            "sf": scale_dir,
            "docs": results[hi]["docs"],
            "throughputs": {
                str(n): round(results[n]["docs_per_sec"]) for n in levels
            },
            "walls": {str(n): round(results[n]["wall"], 1) for n in levels},
            "substrate_speedup": cal,
            "substrate_normalized_efficiency": round(sp / cal, 4) if cal else None,
        }
        print(json.dumps(out))
        return

    if "--scaling" in sys.argv:
        # the sf0.1 corpus alone is overhead-bound; replicate it
        # deterministically (distinct doc_ids, identical content) so each
        # parallelism level has real work to chew (BASELINE.md protocol:
        # ≥64 blocks at the higher level)
        # factor 300 puts real per-CPU work behind the per-run fixed costs
        # (session init, actor spawn, stage scheduling) — the regime the
        # north rule's 100-TB cluster actually runs in
        scale_dir = _build_scale_input(sf_dir, factor=int(os.environ.get("GRAFT_SCALE_FACTOR", "300")))
        # GRAFT_SCALE_LEVELS="8,16,32" runs a three-point curve (monotone
        # efficiency evidence, BASELINE.md); default stays the driver's
        # two-level 8-vs-32 protocol
        levels = sorted(
            int(x)
            for x in os.environ.get("GRAFT_SCALE_LEVELS", "8,32").split(",")
        )
        results = {}
        for n in sorted(levels, reverse=True):
            p = subprocess.run(
                [sys.executable, __file__, "--headline-only"],
                env={**os.environ, "RAY_GRAFT_CPUS": str(n), "GRAFT_SF_DIR": scale_dir},
                capture_output=True,
                text=True,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            results[n] = json.loads(line)
            os.makedirs("/tmp/graft_bench", exist_ok=True)
            with open(f"/tmp/graft_bench/scaling_{n}.log", "w") as f:
                f.write(p.stdout + "\n--- stderr ---\n" + p.stderr[-4000:])
            time.sleep(10)  # let the previous cluster's workers fully reap
        lo, hi = levels[0], levels[-1]
        t_lo = results[lo]["triples_per_sec"]
        t_hi = results[hi]["triples_per_sec"]
        eff = (t_hi / t_lo) / (hi / lo)
        cal_walls = _substrate_calibration(levels)
        cal = round(cal_walls[lo] / cal_walls[hi], 3) if cal_walls else 0.0
        out = {
            "metric": "kg_pipeline_scaling",
            "value": round(eff, 4),
            "unit": "efficiency",
            "sf": sf_dir,
            f"throughput_{lo}": round(t_lo, 1),
            f"throughput_{hi}": round(t_hi, 1),
            f"wall_{lo}": round(results[lo]["value"], 2),
            f"wall_{hi}": round(results[hi]["value"], 2),
            # embarrassingly-parallel CPU-burn speedup lo->hi on this
            # exact substrate: the ceiling any workload can reach here
            "substrate_speedup_8_32": cal,
            "substrate_normalized_efficiency": round((t_hi / t_lo) / cal, 4)
            if cal
            else None,
        }
        if len(levels) > 2:
            curve = {}
            for a, b in zip(levels, levels[1:]):
                sp = results[b]["triples_per_sec"] / results[a]["triples_per_sec"]
                seg = {
                    "speedup": round(sp, 3),
                    "efficiency": round(sp / (b / a), 4),
                }
                if cal_walls:
                    sub_sp = cal_walls[a] / cal_walls[b]
                    seg["substrate_speedup"] = round(sub_sp, 3)
                    seg["normalized_efficiency"] = round(sp / sub_sp, 4)
                curve[f"{a}->{b}"] = seg
            out["curve"] = curve
            out["throughputs"] = {
                str(n): round(results[n]["triples_per_sec"], 1) for n in levels
            }
        print(json.dumps(out))
        return

    _init_ray(num_cpus)
    bench_base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    # two back-to-back headline runs, report the min: this VM's kernel
    # page daemons (kdamond/kcompactd) intermittently inflate minor-fault
    # costs 10-40x, so a single sample can read 2x slow (variance history
    # in BASELINE.md); min-of-2 measures the pipeline, not the daemon
    runs = [
        run_headline(sf_dir, f"{bench_base}/graft_bench/{num_cpus}")
        for _ in range(int(os.environ.get("GRAFT_HEADLINE_RUNS", "2")))
    ]
    headline = min(runs, key=lambda h: h["wall_sec"])
    out = {
        "metric": "kg_pipeline_wall_sec",
        "value": round(headline["wall_sec"], 3),
        "unit": "sec",
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "triples": headline["triples"],
        "triples_per_sec": round(headline["triples_per_sec"], 1),
        "stages": headline["stages"],
        "headline_runs": [round(h["wall_sec"], 3) for h in runs],
    }
    if "--headline-only" not in sys.argv:
        out["queries"] = run_queries(sf_dir)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
