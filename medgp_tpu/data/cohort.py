"""Cohort assembly: ragged patients -> fixed-shape padded batches.

The reference sizes one Slurm job per patient with 5 resource tiers keyed by
observation count (scripts/slurm_della.json; run_exp_generator.py:213-263).
The TPU equivalent is *bucketing*: patients are grouped by padded length so
each bucket compiles once and vmaps/shard_maps as a dense (B, n_max) batch,
and cost-balanced over devices (the reference's tier table becomes a
bin-packing shard assigner in :mod:`medgp_tpu.parallel.bucketing`).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from medgp_tpu.data import formats


@dataclasses.dataclass
class PatientRecord:
    """Host-side (numpy, ragged) observations of one patient."""

    pan: str
    t: np.ndarray     # (n,) float32
    y: np.ndarray     # (n,) float32 (normalized)
    meta: np.ndarray  # (n,) int32

    @property
    def n_obs(self) -> int:
        return len(self.t)


@dataclasses.dataclass
class PaddedBatch:
    """A dense bucket of patients, ready to become a device array batch."""

    pans: List[str]
    t: np.ndarray     # (B, n_max) float32
    y: np.ndarray     # (B, n_max) float32
    meta: np.ndarray  # (B, n_max) int32
    mask: np.ndarray  # (B, n_max) float32
    n_max: int

    def __len__(self) -> int:
        return len(self.pans)


def load_cohort(
    data_dir: str,
    pans: Sequence[str],
    feature_index: Sequence[int],
) -> List[PatientRecord]:
    recs = []
    for pan in pans:
        t, y, meta = formats.load_patient(data_dir, str(pan), feature_index)
        recs.append(PatientRecord(pan=str(pan), t=t, y=y, meta=meta))
    return recs


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def bucket_edges(ns: Sequence[int], multiple: int = 128, growth: float = 2.0):
    """Padded-length buckets: powers of `growth` times `multiple`, covering
    max(ns). Keeps the number of distinct compiled shapes logarithmic."""
    top = max(max(ns), 1)
    edges = []
    e = multiple
    while e < top:
        edges.append(e)
        e = int(e * growth)
    edges.append(_round_up(top, multiple))
    return edges


def pack_patients(
    records: Sequence[PatientRecord],
    multiple: int = 128,
    growth: float = 2.0,
    max_batch: int | None = None,
    batch_multiple: int = 1,
    footprint_mult: int = 1,
) -> List[PaddedBatch]:
    """Group patients into padded batches by bucketed length.

    Patients keep their identity (pans list); padding entries have mask 0,
    meta 0, t 0, y 0 — exactly neutral in the masked NLML.

    `batch_multiple` (the device-mesh size, when sharding) promotes each
    length-bucket's remainder patients into the next-longer bucket so every
    non-final bucket's population is a device multiple: dummy-patient padding
    then occurs at most once (the cohort-size remainder in the longest
    bucket) instead of once per bucket — without it, an 8-device mesh pads a
    2-patient bucket with 6 full dummy computations.
    """
    if not records:
        return []
    edges = bucket_edges([r.n_obs for r in records], multiple, growth)
    buckets: dict[int, list[PatientRecord]] = {}
    for r in records:
        for e in edges:
            if r.n_obs <= e:
                buckets.setdefault(e, []).append(r)
                break

    if batch_multiple > 1:
        order = sorted(buckets)
        for i, e in enumerate(order[:-1]):
            group = buckets[e]
            rem = len(group) % batch_multiple
            if rem:
                # promote the longest `rem` patients (least extra padding)
                group.sort(key=lambda r: r.n_obs)
                buckets[order[i + 1]] = group[len(group) - rem:] + buckets[
                    order[i + 1]
                ]
                del group[len(group) - rem:]
                if not group:
                    del buckets[e]

    batches = []
    for n_max in sorted(buckets):
        group = buckets[n_max]
        # HBM envelope: cap each bucket's batch so B * n_max^2 stays
        # inside the device-scaled gram-entry budget (utils/hbm.py) —
        # validated at 64 x 512^2 on a 16 GiB v5e, where the full-budget
        # train program at B=128 x n=512 compiled to ~16 GB HBM and hit
        # reproducible device faults at execute; B=64 at n=512 (and
        # B=128 at n<=256) are measured-stable (round 4). Larger-HBM
        # devices (v5p: 95 GiB) get proportionally larger caps.
        # `footprint_mult` scales the per-patient gram count for programs
        # that materialize MORE than one (n, n) buffer per patient — the
        # posterior samplers build one per chain per leapfrog step (round
        # 5: the 2-chain 512-draw HMC program at B=32 x n=512 device-
        # faulted exactly like the round-4 train program; B*mult*n^2
        # inside the envelope is the validated-stable regime).
        from medgp_tpu.utils.hbm import bucket_cap

        cap = max(1, bucket_cap(n_max) // max(footprint_mult, 1))
        if batch_multiple > 1:
            cap = max(batch_multiple, cap - cap % batch_multiple)
        eff = cap if max_batch is None else min(max_batch, cap)
        chunks = [
            group[i : i + eff] for i in range(0, len(group), eff)
        ]
        for chunk in chunks:
            B = len(chunk)
            t = np.zeros((B, n_max), np.float32)
            y = np.zeros((B, n_max), np.float32)
            meta = np.zeros((B, n_max), np.int32)
            mask = np.zeros((B, n_max), np.float32)
            for i, r in enumerate(chunk):
                n = r.n_obs
                t[i, :n] = r.t
                y[i, :n] = r.y
                meta[i, :n] = r.meta
                mask[i, :n] = 1.0
            batches.append(
                PaddedBatch(
                    pans=[r.pan for r in chunk],
                    t=t, y=y, meta=meta, mask=mask, n_max=n_max,
                )
            )
    return batches
