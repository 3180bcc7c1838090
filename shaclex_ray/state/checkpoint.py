"""Per-stage checkpoint manifests + stage metrics (SURVEY.md §4.2:
"resumable output layout").

Each pipeline stage writes its output as a parquet directory
``<out_dir>/<stage>/`` plus ``<out_dir>/<stage>/_manifest.json`` recording
an input digest, row count and wall time. On resume, a stage whose
manifest matches the input digest is skipped and its parquet is read back.
Lineage columns (doc_id, span_idx) persist in the triple tables, so any
partition can be traced to its source rows.
"""

from __future__ import annotations

import json
import os
import time


class StageRunner:
    def __init__(self, out_dir: str, resume: bool = True):
        self.out_dir = out_dir
        self.resume = resume
        self.metrics: dict[str, dict] = {}
        os.makedirs(out_dir, exist_ok=True)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage, "_manifest.json")

    def is_done(self, stage: str, digest: str) -> bool:
        p = self._manifest_path(stage)
        if not (self.resume and os.path.exists(p)):
            return False
        try:
            m = json.load(open(p))
            return m.get("digest") == digest
        except (OSError, ValueError):
            return False

    def run(self, stage: str, digest: str, produce, read_back):
        """``produce(path)`` writes the stage output and returns row count;
        ``read_back(path)`` loads it. Completed stages are skipped."""
        path = os.path.join(self.out_dir, stage)
        if self.is_done(stage, digest):
            self.metrics[stage] = json.load(open(self._manifest_path(stage)))
            self.metrics[stage]["resumed"] = True
            return read_back(path)
        # stale or partial output (digest mismatch / interrupted run) must
        # not mix with the fresh write — clear the stage dir first
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        t0 = time.perf_counter()
        rows = produce(path)
        wall = time.perf_counter() - t0
        manifest = {"stage": stage, "digest": digest, "rows": rows, "wall_sec": wall}
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f)
        self.metrics[stage] = manifest
        return read_back(path)

    def write_metrics(self):
        with open(os.path.join(self.out_dir, "stage_metrics.json"), "w") as f:
            json.dump(self.metrics, f, indent=2)
