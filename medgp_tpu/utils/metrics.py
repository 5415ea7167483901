"""Structured metrics/observability: one JSONL writer per run.

The reference's observability is `cout` redirected to per-job log files
(SURVEY §5.5). Here every stage appends typed scalar records (NLML
distributions, patients/sec, accept rates, cluster diagnostics) to a single
metrics.jsonl, with process/host identity for multi-host runs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, path: Optional[str], run_id: str = "run"):
        self.path = path
        self.run_id = run_id
        try:
            import jax

            self.process = jax.process_index()
        except Exception:
            self.process = 0
        if path and self.process != 0:
            # one file per process: concurrent appends to a shared path can
            # interleave mid-line on network filesystems in multi-host pods
            root, ext = os.path.splitext(path)
            self.path = path = f"{root}.p{self.process}{ext}"
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def write(self, stage: str, **scalars: Any) -> Dict[str, Any]:
        rec = dict(
            ts=time.time(),
            run=self.run_id,
            process=self.process,
            stage=stage,
        )
        for k, v in scalars.items():
            if isinstance(v, (np.ndarray, list, tuple)):
                a = np.asarray(v, float).ravel()
                if a.size:
                    rec[f"{k}_mean"] = float(np.nanmean(a))
                    rec[f"{k}_p50"] = float(np.nanpercentile(a, 50))
                    rec[f"{k}_p95"] = float(np.nanpercentile(a, 95))
            else:
                try:
                    rec[k] = float(v)
                except (TypeError, ValueError):
                    rec[k] = str(v)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec
