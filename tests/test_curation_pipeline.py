"""End-to-end curation pipeline: verdict-consistency with curate_corpus,
hive-partitioned output, checkpoint resume, and pack equivalence."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
OUT = "/tmp/test_curation_out"


def _run(resume=True):
    from shaclex_ray.pipelines.curation import run_curation_pipeline

    return run_curation_pipeline(SF, OUT, capacity=128, resume=resume)


def test_curation_pipeline_end_to_end(ray_session):
    from shaclex_ray.functions.curate import curate_corpus

    shutil.rmtree(OUT, ignore_errors=True)
    out = _run()

    verdicts = curate_corpus(SF).to_pandas()
    kept = verdicts[verdicts.keep]
    assert out["kept"] == len(kept)

    # hive layout: one directory per split, only kept docs inside
    splits = sorted(
        os.path.basename(d)
        for d in glob.glob(f"{OUT}/curated/split=*")
        if os.path.isdir(d)
    )
    assert splits == sorted(
        "split=" + s for s in kept.split.unique()
    )
    cur = out["curated"].to_pandas()
    assert sorted(cur.doc_id) == sorted(kept.doc_id)
    # curated rows carry the original text columns
    assert {"doc_id", "text", "lang", "source"} <= set(cur.columns)

    # packed chunks cover exactly the kept-train token mass
    train_ids = set(kept[kept.split == "train"].doc_id)
    packed = out["packed"].to_pandas()
    assert set(packed.doc_id) <= train_ids
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    ntok = {
        r.doc_id: len(r.text.split(" "))
        for r in docs.itertuples()
        if r.doc_id in train_ids
    }
    got_tok = packed.groupby("doc_id").ntok_in_chunk.sum().to_dict()
    exp_tok = {k: v for k, v in ntok.items() if v > 0}
    assert got_tok == exp_tok


def test_curation_pipeline_resumes(ray_session):
    # both stage manifests exist from the previous test's run
    m1 = json.load(open(f"{OUT}/curated/_manifest.json"))
    out2 = _run()
    assert out2["metrics"]["curated"].get("resumed") is True
    assert out2["metrics"]["packed"].get("resumed") is True
    assert out2["metrics"]["curated"]["rows"] == m1["rows"]

    # a knob change invalidates only what it affects: capacity re-runs
    # the pack stage but resumes the curated stage
    from shaclex_ray.pipelines.curation import run_curation_pipeline

    out3 = run_curation_pipeline(SF, OUT, capacity=64)
    assert out3["metrics"]["curated"].get("resumed") is True
    assert out3["metrics"]["packed"].get("resumed") is None


def test_curation_pipeline_substring_dedup(ray_session):
    """--substring-dedup inserts the span-trim stage: packed sequences
    are built from span-trimmed text, and per-doc token mass equals the
    scalar-reference trim of the curated train shard."""
    import pandas as pd

    from shaclex_ray.pipelines.curation import run_curation_pipeline

    out_dir = "/tmp/test_curation_substr_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    out = run_curation_pipeline(
        SF, out_dir, capacity=128, substring_dedup=True, substring_k=8
    )
    assert os.path.isdir(f"{out_dir}/trimmed")
    trimmed = pd.concat(
        [
            pq.read_table(f).to_pandas()
            for f in glob.glob(f"{out_dir}/trimmed/**/*.parquet", recursive=True)
        ]
    )
    # scalar reference: recompute duplicated k-window spans over the
    # curated train shard and cut every covered token
    k = 8
    train = pd.concat(
        [
            pq.read_table(f).to_pandas()
            for f in glob.glob(
                f"{out_dir}/curated/split=train/**/*.parquet", recursive=True
            )
        ]
    )
    from collections import Counter

    counts: Counter = Counter()
    toks = {r.doc_id: r.text.split(" ") for r in train.itertuples()}
    for t in toks.values():
        for i in range(len(t) - k + 1):
            counts[" ".join(t[i : i + k])] += 1
    exp = {}
    for did, t in toks.items():
        cut = [False] * len(t)
        for i in range(len(t) - k + 1):
            if counts[" ".join(t[i : i + k])] >= 2:
                for j in range(i, i + k):
                    cut[j] = True
        kept = [w for w, c in zip(t, cut) if not c]
        exp[did] = (" ".join(kept), len(kept), len(t) - len(kept))
    got = {
        r.doc_id: (r.text, r.ntok, r.ntok_cut) for r in trimmed.itertuples()
    }
    assert got == {d: v for d, v in exp.items() if v[1] > 0}

    # packed token mass equals the trimmed shard's
    packed = out["packed"].to_pandas()
    got_tok = packed.groupby("doc_id").ntok_in_chunk.sum().to_dict()
    exp_tok = {
        r.doc_id: len(r.text.split(" "))
        for r in trimmed.itertuples()
        if r.ntok > 0
    }
    assert got_tok == exp_tok
    shutil.rmtree(out_dir, ignore_errors=True)
