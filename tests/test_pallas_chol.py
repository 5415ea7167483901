"""Pallas batched Cholesky chain: correctness vs numpy/XLA, vmap
collapsing, failure semantics, and the flagged masked_nlml integration.

On CPU these run in interpreter mode (tests/conftest.py pins the cpu
platform); the same kernels compile under Mosaic on TPU (exercised by
tools/profile3.py and the bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.ops.pallas_chol import (
    chol_solve,
    pallas_chol_supported,
    tri_inv,
)


def _spd(rng, B, n):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    return np.einsum("bij,bkj->bik", A, A) + 10 * np.eye(n, dtype=np.float32)


def test_supported_boundaries():
    assert pallas_chol_supported(128)
    assert pallas_chol_supported(256)
    assert pallas_chol_supported(384)
    assert pallas_chol_supported(512)
    assert pallas_chol_supported(1024)
    # n=2048 fits the 100 MB VMEM cap at BT=1 but is measured 2.3x
    # slower than XLA's blocked cholesky there (BT=1 loses the batch
    # amortization of the serial column loop) — deliberately unsupported
    # (tools/chol_n2048_check.py).
    for bad in (0, 64, 100, 192, 193, 2048):
        assert not pallas_chol_supported(bad), bad


def test_supported_respects_vmem_env(monkeypatch):
    monkeypatch.setenv("MEDGP_CHOL_VMEM", str(16 * 1024 * 1024))
    assert pallas_chol_supported(512)
    assert not pallas_chol_supported(1024)


def test_chol_solve_matches_numpy(rng):
    B, n = 3, 128
    K = _spd(rng, B, n)
    y = rng.normal(size=(B, n)).astype(np.float32)
    nz = np.zeros((B, n), np.float32)
    L, alpha, linvd = jax.jit(chol_solve)(
        jnp.asarray(K), jnp.asarray(nz), jnp.asarray(y)
    )
    L_ref = np.linalg.cholesky(K)
    a_ref = np.stack([np.linalg.solve(K[b], y[b]) for b in range(B)])
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(alpha), a_ref, rtol=1e-4, atol=1e-4
    )
    # upper triangle is exactly zero (no Schur garbage leaks)
    assert np.all(np.triu(np.asarray(L), 1) == 0.0)


def test_tri_inv_matches_numpy(rng):
    B, n = 2, 128
    K = _spd(rng, B, n)
    L = np.linalg.cholesky(K)
    _, _, linvd = jax.jit(chol_solve)(
        jnp.asarray(K), jnp.zeros((B, n)), jnp.zeros((B, n))
    )
    X = jax.jit(tri_inv)(jnp.asarray(L), linvd)
    X_ref = np.stack([np.linalg.inv(L[b]) for b in range(B)])
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-4, atol=1e-4)


def test_vmap_collapsing_nested(rng):
    """vmap stacks collapse into ONE kernel batch (the custom_vmap rule),
    including nested vmaps and the single-sample signature."""
    B, n = 4, 128
    K = _spd(rng, B, n)
    y = rng.normal(size=(B, n)).astype(np.float32)
    L_ref = np.linalg.cholesky(K)

    nz = jnp.zeros((B, n))
    Lv, _, _ = jax.jit(jax.vmap(chol_solve))(
        jnp.asarray(K), nz, jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(Lv), L_ref, rtol=1e-5, atol=1e-5)

    K2 = jnp.asarray(K).reshape(2, 2, n, n)
    y2 = jnp.asarray(y).reshape(2, 2, n)
    Ln, _, _ = jax.jit(jax.vmap(jax.vmap(chol_solve)))(
        K2, nz.reshape(2, 2, n), y2
    )
    np.testing.assert_allclose(
        np.asarray(Ln).reshape(B, n, n), L_ref, rtol=1e-5, atol=1e-5
    )


def test_failure_produces_nan_diag(rng):
    """A non-SPD matrix must yield NaN on the diagonal (what _chol_ok and
    the jitter-escalation loop detect), without corrupting other batch
    members."""
    B, n = 3, 128
    K = _spd(rng, B, n)
    K[1] = -np.eye(n, dtype=np.float32)
    L, _, _ = jax.jit(chol_solve)(
        jnp.asarray(K), jnp.zeros((B, n)),
        jnp.asarray(rng.normal(size=(B, n)).astype(np.float32)),
    )
    d = np.diagonal(np.asarray(L), axis1=1, axis2=2)
    assert np.isnan(d[1]).any()
    assert np.isfinite(d[0]).all() and np.isfinite(d[2]).all()


def test_masked_nlml_pallas_path_matches_xla(rng, monkeypatch):
    """masked_nlml value+grad with MEDGP_PALLAS_CHOL=1 (kernel path,
    interpret mode on CPU) against the XLA path — including a padded
    patient and the jitter-retry escalation."""
    monkeypatch.setenv("MEDGP_PALLAS_GRAM", "0")
    from medgp_tpu.models.gp import objective_and_grad
    from medgp_tpu.models.params import LMCSMSpec
    from tests.test_nlml import random_theta
    from tests.test_varem import synth_lmcsm_patient

    spec = LMCSMSpec(1, 2, 1)
    d = synth_lmcsm_patient(rng, spec, n=100, n_pad=28)  # padded to 128
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)

    monkeypatch.setenv("MEDGP_PALLAS_CHOL", "0")
    v0, g0, ok0 = objective_and_grad(spec, d)(theta)
    monkeypatch.setenv("MEDGP_PALLAS_CHOL", "1")
    v1, g1, ok1 = objective_and_grad(spec, d)(theta)
    assert bool(ok0) and bool(ok1)
    assert float(v1) == pytest.approx(float(v0), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=2e-3, atol=2e-3
    )


def test_jitter_retry_pallas_path(rng, monkeypatch):
    """Near-singular gram: the pallas fast path must escalate the jitter
    multiplier exactly like the XLA path (c_inference_exact.cpp:99-111)."""
    monkeypatch.setenv("MEDGP_PALLAS_CHOL", "1")
    monkeypatch.setenv("MEDGP_PALLAS_GRAM", "0")
    from medgp_tpu.models.gp import nlml_fn
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.gp import PatientData
    from tests.test_nlml import random_theta

    spec = LMCSMSpec(1, 2, 1)
    n = 128
    t = np.repeat(np.sort(rng.uniform(0, 72, size=n // 4)), 4)
    meta = np.tile(np.arange(2), n // 2)
    y = rng.normal(size=n)
    theta = random_theta(rng, spec)
    theta[: spec.n_lik] = np.log(1e-4)
    d = PatientData(
        t=jnp.asarray(t, jnp.float32), y=jnp.asarray(y, jnp.float32),
        meta=jnp.asarray(meta, jnp.int32), mask=jnp.ones(n, jnp.float32),
    )
    v, res = nlml_fn(spec, d)(jnp.asarray(theta, jnp.float32))
    assert bool(res.ok)
    assert int(res.mult) > 1  # escalation actually happened
    assert np.isfinite(float(v))


def test_tile_clipped_to_batch_pow2():
    """Round-5: BT=16 default must not pad a small batch past its own
    pow-2 roundup (sampler buckets run at B<=16; tests at B=2)."""
    from medgp_tpu.ops.pallas_chol import _batch_tile, _tile_for

    assert _batch_tile(512) == 16
    assert _tile_for(512, 8) == 8
    assert _tile_for(512, 2) == 2
    assert _tile_for(512, 12) == 16   # Bp is 16 either way; bigger tile
    assert _tile_for(512, 128) == 16
    assert _tile_for(1024, 128) == 4  # VMEM formula unchanged at n=1024
