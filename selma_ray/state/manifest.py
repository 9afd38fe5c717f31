"""Checkpoint manifest: per-partition lineage + metrics, resumable restarts.

North-rule requirement: every partition emits lineage records and
extraction metrics (turns processed, bytes stripped, selector hit counts)
to a manifest enabling resume at 10^12-turn scale.

Design: one JSON file per completed shard, written atomically
(tmp + rename) into ``<dir>/shards/``. Resume = list that directory —
O(#shards) metadata, no data reads. A shard is the unit of both failure
and resume; shard ids are deterministic functions of the INPUT layout
(file names), so a restarted job computes the same ids and skips the
done ones. Works on any shared filesystem / object store with rename.
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.shards_dir = os.path.join(path, "shards")
        os.makedirs(self.shards_dir, exist_ok=True)

    # -- write ---------------------------------------------------------------

    def mark_done(self, shard_id: str, metrics: dict | None = None,
                  lineage: dict | None = None) -> None:
        rec = {
            "shard_id": shard_id,
            "status": "done",
            "completed_at": time.time(),
            "metrics": metrics or {},
            "lineage": lineage or {},
        }
        final = os.path.join(self.shards_dir, f"{shard_id}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, final)  # atomic on POSIX

    # -- read ----------------------------------------------------------------

    def completed(self) -> set[str]:
        out = set()
        for name in os.listdir(self.shards_dir):
            if name.endswith(".json"):
                out.add(name[:-5])
        return out

    def records(self) -> list[dict]:
        recs = []
        for name in sorted(os.listdir(self.shards_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.shards_dir, name)) as f:
                    recs.append(json.load(f))
        return recs

    def summary(self) -> dict:
        recs = self.records()
        agg: dict = {"shards_done": len(recs), "metrics": {}}
        for r in recs:
            for k, v in (r.get("metrics") or {}).items():
                if isinstance(v, (int, float)):
                    agg["metrics"][k] = agg["metrics"].get(k, 0) + v
        return agg
