"""Checkpoint / resume at cohort-batch granularity (orbax).

The reference's checkpoints are its stage artifacts: re-running a stage
overwrites per-patient files; nothing resumes mid-optimization (SURVEY §5.4).
Here a cohort run checkpoints the padded batch state — trained hypers,
flags, varEM state, and the sampler state for HMC — so a preempted pod job
resumes at the last completed bucket instead of recomputing the cohort.

Per-patient train artifacts are *also* written in the reference formats
(data/formats.py), which double as the inter-stage interface; this module is
about whole-run resumability.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


class CohortCheckpointer:
    """Append-style checkpointing keyed by bucket index."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if _HAS_ORBAX:
            self._mngr = ocp.CheckpointManager(
                self.ckpt_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=None),
            )
        else:
            self._mngr = None

    def save_bucket(self, bucket_idx: int, state: dict) -> None:
        state = {k: np.asarray(v) for k, v in state.items() if v is not None}
        if self._mngr is not None:
            self._mngr.save(bucket_idx, args=ocp.args.StandardSave(state))
            self._mngr.wait_until_finished()
        else:  # plain-npz fallback
            np.savez(
                os.path.join(self.ckpt_dir, f"bucket_{bucket_idx}.npz"),
                **state,
            )

    def load_bucket(self, bucket_idx: int) -> Optional[dict]:
        if self._mngr is not None:
            if bucket_idx not in (self._mngr.all_steps() or []):
                return None
            out = self._mngr.restore(
                bucket_idx, args=ocp.args.StandardRestore()
            )
            return dict(out)
        path = os.path.join(self.ckpt_dir, f"bucket_{bucket_idx}.npz")
        if not os.path.exists(path):
            return None
        with np.load(path) as z:
            return {k: z[k] for k in z.files}

    def completed_buckets(self) -> list:
        if self._mngr is not None:
            return sorted(self._mngr.all_steps() or [])
        out = []
        for f in os.listdir(self.ckpt_dir):
            if f.startswith("bucket_") and f.endswith(".npz"):
                out.append(int(f[len("bucket_"):-len(".npz")]))
        return sorted(out)
