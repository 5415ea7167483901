"""Device-derived HBM envelopes (utils/hbm.py) and envelope-aware batch
padding (runner._pad_batch_pow2).

The validated datapoint is a 16 GiB v5e: B * n_max^2 <= 64 * 512^2 gram
entries per device (round 4 device-fault bisect). A 95 GiB v5p must get
~6x larger caps without retuning; padding must never re-inflate a bucket
that pack_patients capped for the envelope (advisor round-4 high)."""

import numpy as np
import pytest

from medgp_tpu.utils import hbm


V5P_BYTES = 95 * (1 << 30)


@pytest.fixture
def v5p(monkeypatch):
    monkeypatch.setenv("MEDGP_HBM_BYTES", str(V5P_BYTES))


@pytest.fixture
def v5e(monkeypatch):
    monkeypatch.setenv("MEDGP_HBM_BYTES", str(hbm.V5E_HBM_BYTES))


def test_fallback_is_v5e_constants(v5e):
    assert hbm.gram_entry_budget() == 64 * 512 * 512
    assert hbm.screen_budget_bytes() == 4 << 30
    assert hbm.test_budget_bytes() == 2 << 30


def test_v5p_scales_6x(v5p):
    scale = hbm.hbm_scale()
    assert scale == pytest.approx(95 / 16)
    assert hbm.gram_entry_budget() == int(64 * 512 * 512 * scale)
    assert hbm.bucket_cap(512) == int(64 * 512 * 512 * scale) // 512**2
    # ~6x the v5e cap of 64
    assert 350 <= hbm.bucket_cap(512) <= 400


def test_bucket_cap_never_zero(v5e):
    assert hbm.bucket_cap(8192) == 1
    assert hbm.bucket_cap(1 << 20) == 1


def test_screen_chunk_scales_with_device(v5e, monkeypatch):
    from medgp_tpu.infer.map_train import adaptive_screen_chunk

    small = adaptive_screen_chunk(128, 512)
    monkeypatch.setenv("MEDGP_HBM_BYTES", str(V5P_BYTES))
    big = adaptive_screen_chunk(128, 512)
    assert big >= 5 * small or big == 32  # 6x budget (clamped at 32)
    assert big > small


def test_pad_never_exceeds_envelope(v5e):
    from medgp_tpu.parallel.runner import _pad_batch_pow2

    # n_max=2048: envelope cap = 64*512^2 / 2048^2 = 4. A raw B=4 bucket
    # must NOT be padded to the minimum of 8 (advisor round-4 high: 8 *
    # 2048^2 = the exact 128*512^2 footprint that device-faults).
    assert _pad_batch_pow2(4, n_max=2048) == 4
    assert _pad_batch_pow2(3, n_max=2048) == 4
    assert _pad_batch_pow2(1, n_max=8192) == 1
    # small n_max keeps the pow-2 churn bound
    assert _pad_batch_pow2(5, n_max=128) == 8
    assert _pad_batch_pow2(33, n_max=128) == 64
    # without n_max: legacy behavior
    assert _pad_batch_pow2(5) == 8


def test_pad_envelope_scales_with_mesh(v5e):
    """Sharded batches split rows across devices, so the envelope applies
    per device: an 8-device mesh may pad an n_max=2048 bucket to 32
    (4 rows per device), not beyond."""
    import jax
    from jax.sharding import Mesh

    from medgp_tpu.parallel.runner import _pad_batch_pow2

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    assert _pad_batch_pow2(4, mesh, n_max=2048) == 8  # mesh multiple floor
    assert _pad_batch_pow2(30, mesh, n_max=2048) == 32
    assert _pad_batch_pow2(33, mesh, n_max=2048) == 33 + (8 - 33 % 8)


def test_pack_patients_cap_uses_device_budget(v5p):
    from medgp_tpu.data.cohort import PatientRecord, pack_patients

    recs = []
    for i in range(512):
        n = 400
        recs.append(
            PatientRecord(
                pan=f"p{i}",
                t=np.linspace(0, 1, n).astype(np.float32),
                y=np.zeros(n, np.float32),
                meta=np.zeros(n, np.int32),
            )
        )
    batches = pack_patients(recs, max_batch=512)
    # v5e cap at n_max=512 is 64; v5p should allow ~6x bigger buckets
    assert max(len(b) for b in batches) > 64


def test_sampler_footprint_mult_caps_bucket(v5e):
    """Round-5: sampler programs build ~2 gram buffers per chain per
    patient; pack_patients' envelope cap must scale down accordingly
    (the 2-chain 512-draw HMC program at the train cap B=32, n=512
    device-faulted on a 16 GiB v5e)."""
    from medgp_tpu.data.cohort import PatientRecord, pack_patients
    from medgp_tpu.parallel.runner import _pad_batch_pow2

    recs = [
        PatientRecord(
            pan=f"p{i}",
            t=np.linspace(0, 1, 500).astype(np.float32),
            y=np.zeros(500, np.float32),
            meta=np.zeros(500, np.int32),
        )
        for i in range(128)
    ]
    plain = pack_patients(recs, max_batch=128)
    sampler = pack_patients(recs, max_batch=128, footprint_mult=4)
    assert max(len(b) for b in plain) == 64     # train cap at n=512
    assert max(len(b) for b in sampler) == 16   # / (2 chains * 2 buffers)
    assert _pad_batch_pow2(16, n_max=512, cap_div=4) == 16
    assert _pad_batch_pow2(3, n_max=512, cap_div=4) == 8   # pow2 min, <= cap
    assert _pad_batch_pow2(3, n_max=1024, cap_div=4) == 4  # cap binds
