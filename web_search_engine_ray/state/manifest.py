"""Build manifest (T8) + corpus stats (T5) sidecars — the checkpoint /
resume substrate (SURVEY.md §4.3, BASELINE.json north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

The manifest records, per completed stage, what was consumed and what
was produced (content hashes for segments).  ``build_index(resume=True)``
loads it, validates the config hash, and skips completed stages; a build
killed after the partials checkpoint restarts the merge from partials,
not from raw text.  All writes are atomic (tmp + os.replace).
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST_NAME = "manifest.json"
STATS_NAME = "stats.json"

STAGES = ("doc_table", "stats", "hot_terms", "partials", "segments", "finalize")


def _atomic_write_json(obj: Any, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class Manifest:
    def __init__(self, out_dir: str, config_hash: str):
        self.path = os.path.join(out_dir, MANIFEST_NAME)
        self.data: dict[str, Any] = {
            "config_hash": config_hash,
            "stages": {},
            "inputs": {},
            "buckets": {},
        }

    @classmethod
    def load_or_create(cls, out_dir: str, config_hash: str,
                       resume: bool) -> "Manifest":
        m = cls(out_dir, config_hash)
        if resume and os.path.exists(m.path):
            with open(m.path) as f:
                data = json.load(f)
            if data.get("config_hash") == config_hash:
                m.data = data
            # config changed -> ignore stale manifest, rebuild everything
        return m

    def done(self, stage: str) -> bool:
        return self.data["stages"].get(stage, {}).get("done", False)

    def mark_done(self, stage: str, **meta: Any) -> None:
        self.data["stages"][stage] = {"done": True, **meta}
        _atomic_write_json(self.data, self.path)

    def record_buckets(self, rows: list[dict]) -> None:
        for r in rows:
            self.data["buckets"][str(r["bucket"])] = {
                "sha256": r["sha256"], "n_terms": r["n_terms"],
                "n_postings": r["n_postings"], "path": r["path"],
                "dl_sum": r.get("dl_sum", 0), "dl_min": r.get("dl_min", 0),
            }
        _atomic_write_json(self.data, self.path)


def write_stats(out_dir: str, stats: dict[str, Any]) -> None:
    _atomic_write_json(stats, os.path.join(out_dir, STATS_NAME))


def read_stats(index_dir: str) -> dict[str, Any]:
    with open(os.path.join(index_dir, STATS_NAME)) as f:
        return json.load(f)
