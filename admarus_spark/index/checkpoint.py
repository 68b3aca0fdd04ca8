"""Per-stage checkpointing: lineage + metrics + _SUCCESS markers.

The reference's resumability is its re-crawl dedup sets
(``/root/reference/daemon/src/index/index.rs:37-38,68-75``) and its LMDB
write-back sweep (``inner_db.rs:95-112``). Our batch analog (north rule):
every build stage writes ``_checkpoints/<stage>/{lineage.json, metrics.json,
_SUCCESS}`` keyed by the input token + engine config, so a restarted
``IndexBuilder.build`` skips every stage whose lineage matches — resume
mid-DAG with no recomputation.
"""

from __future__ import annotations

import json
import os
import time


def _stage_dir(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, "_checkpoints", stage)


def stage_is_valid(index_dir: str, stage: str, lineage: dict) -> bool:
    d = _stage_dir(index_dir, stage)
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        return False
    try:
        with open(os.path.join(d, "lineage.json")) as f:
            existing = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return existing.get("key") == lineage.get("key")


def write_stage(index_dir: str, stage: str, lineage: dict, metrics: dict) -> None:
    d = _stage_dir(index_dir, stage)
    os.makedirs(d, exist_ok=True)
    metrics = dict(metrics, wall_clock_completed=time.time())
    with open(os.path.join(d, "lineage.json"), "w") as f:
        json.dump(lineage, f, indent=2, default=str)
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")


def read_metrics(index_dir: str, stage: str) -> dict:
    try:
        with open(os.path.join(_stage_dir(index_dir, stage), "metrics.json")) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def patch_metrics(index_dir: str, stage: str, updates: dict) -> None:
    """Update individual metric values in place (e.g. n_terms after a
    compaction rewrote the postings) without touching the stage lineage."""
    d = _stage_dir(index_dir, stage)
    m = read_metrics(index_dir, stage)
    m.update(updates)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(m, f, indent=2, default=str)


def invalidate(index_dir: str, stage: str) -> None:
    p = os.path.join(_stage_dir(index_dir, stage), "_SUCCESS")
    if os.path.exists(p):
        os.remove(p)
