"""Device-derived HBM envelopes.

Every batch/chunk cap in the framework derives from one validated
datapoint: on a 16 GiB v5e, ``B * n_max^2 = 64 * 512^2`` fp32 gram
entries per device is the largest measured-stable full-budget train
footprint (round 4 — programs above it compiled to ~16 GB and hit
reproducible device faults at execute). Rather than hardcode v5e
numbers, the caps scale linearly with the actual accelerator HBM
reported by ``Device.memory_stats()['bytes_limit']``, falling back to
the validated v5e constants when stats are unavailable (CPU meshes,
older runtimes). A v5p (95 GiB) therefore gets ~6x larger envelopes
without retuning.

Override for tests / manual tuning: set ``MEDGP_HBM_BYTES``.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

# validated on a 16 GiB v5e (round 4):
V5E_HBM_BYTES = 16 << 30
V5E_GRAM_ENTRY_BUDGET = 64 * 512 * 512  # per-device B * n_max^2 cap
V5E_SCREEN_BUDGET_BYTES = 4 << 30       # restart-screen live buffers
V5E_TEST_BUDGET_BYTES = 2 << 30         # test timestamp-map chunking

_cached_device_bytes: Optional[int] = None


def device_hbm_bytes() -> int:
    """Per-device accelerator memory in bytes.

    Resolution order: ``MEDGP_HBM_BYTES`` env override, then
    ``jax.local_devices()[0].memory_stats()['bytes_limit']``, then the
    validated v5e fallback. The device query is cached per process."""
    env = os.environ.get("MEDGP_HBM_BYTES")
    if env:
        return int(env)
    global _cached_device_bytes
    if _cached_device_bytes is None:
        _cached_device_bytes = _query_device()
    return _cached_device_bytes


def _query_device() -> int:
    try:
        import jax

        dev = jax.local_devices()[0]
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit"
            )
            if limit and limit > 0:
                return int(limit)
    except Exception as e:  # CPU backends / old runtimes: fall back
        log.debug("memory_stats unavailable (%s); assuming v5e HBM", e)
    return V5E_HBM_BYTES


def hbm_scale() -> float:
    """Linear scale factor vs the validated 16 GiB v5e."""
    return device_hbm_bytes() / float(V5E_HBM_BYTES)


def gram_entry_budget() -> int:
    """Per-device cap on B * n_max^2 fp32 gram entries for full-budget
    training programs (scaled from the validated 64*512^2 @ 16 GiB)."""
    return max(1, int(V5E_GRAM_ENTRY_BUDGET * hbm_scale()))


def screen_budget_bytes() -> int:
    """HBM byte budget for concurrently-live restart-screen buffers."""
    return max(1, int(V5E_SCREEN_BUDGET_BYTES * hbm_scale()))


def test_budget_bytes() -> int:
    """HBM byte budget for the online-test timestamp-map chunk."""
    return max(1, int(V5E_TEST_BUDGET_BYTES * hbm_scale()))


def bucket_cap(n_max: int) -> int:
    """Largest per-device batch for an n_max bucket inside the envelope."""
    return max(1, gram_entry_budget() // max(n_max * n_max, 1))
