"""Per-stage lineage + metrics — the analog of the reference's
classification_statistics / timers (/root/reference/src/
classification_statistics.h:40-241, timer.h, querying.h:594: per-phase
wall times and RSS printed per rank).

Each pipeline run appends one row per stage to ``metrics.jsonl`` in the
checkpoint root: (run_id, stage, rows_out, t_start, t_end, seconds,
status). Append-only JSONL so a crashed run's partial lineage survives
for postmortem (the reference loses everything on abort).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class MetricsRecorder:
    def __init__(self, root: str, run_id: str | None = None):
        self.path = os.path.join(root, "metrics.jsonl")
        self.run_id = run_id or uuid.uuid4().hex[:12]

    def record(self, stage: str, *, rows_out: int | None, t_start: float, status: str = "ok", **extra):
        t_end = time.time()
        row = {
            "run_id": self.run_id,
            "stage": stage,
            "rows_out": rows_out,
            "t_start": t_start,
            "t_end": t_end,
            "seconds": round(t_end - t_start, 3),
            "status": status,
            **extra,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        return row

    def read_all(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
