"""Fused Pallas gram kernel vs the XLA builder (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.ops.gram import gram_lmcsm
from medgp_tpu.ops.pallas_gram import gram_lmcsm_fused, pallas_supported
from tests.test_kernels import random_lmcsm_params


def _case(rng, Q, D, R, n):
    spec = LMCSMSpec(Q, D, R)
    t = np.sort(rng.uniform(0, 72, size=n)).astype(np.float32)
    meta = rng.integers(0, D, size=n).astype(np.int32)
    A, mu, v, kappa = random_lmcsm_params(rng, Q, D, R)
    args = (
        jnp.asarray(t), jnp.asarray(meta),
        jnp.asarray(A, jnp.float32), jnp.asarray(mu, jnp.float32),
        jnp.asarray(v, jnp.float32), jnp.asarray(kappa, jnp.float32),
    )
    return spec, args


def test_fused_matches_xla(rng):
    spec, args = _case(rng, Q=3, D=4, R=2, n=256)
    assert pallas_supported(256)
    K_fused = gram_lmcsm_fused(spec, *args)
    K_xla = gram_lmcsm(spec, *args)
    np.testing.assert_allclose(
        np.asarray(K_fused), np.asarray(K_xla), rtol=1e-4, atol=1e-5
    )


def test_fused_fallback_for_odd_n(rng):
    spec, args = _case(rng, Q=2, D=3, R=1, n=100)
    assert not pallas_supported(100)
    K = gram_lmcsm_fused(spec, *args)
    K_xla = gram_lmcsm(spec, *args)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_xla), atol=1e-6)


def test_pallas_supported_boundaries():
    """The grid covers n exactly: multiples of 128 up to the tile, then
    multiples of the tile; everything else (incl. n=0) falls back."""
    assert not pallas_supported(0)
    for good in (128, 256, 384, 512, 640, 896, 1024):
        assert pallas_supported(good), good
    for bad in (64, 100, 1152, 2048):
        assert not pallas_supported(bad), bad


def test_fused_fallback_at_tile_uncovered_n(rng):
    """n=1152 is 128-aligned but exceeds the batched kernels' 1024 VMEM
    cap: must take the XLA fallback path and still be exact."""
    spec, args = _case(rng, Q=2, D=3, R=1, n=1152)
    K = gram_lmcsm_fused(spec, *args)
    K_xla = gram_lmcsm(spec, *args)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_xla), atol=1e-6)


def test_fused_gradients_match_xla(rng):
    """Custom-VJP hyper gradients vs autodiff through the XLA builder."""
    spec, args = _case(rng, Q=2, D=3, R=2, n=128)
    t, meta, A, mu, v, kappa = args
    w = jnp.asarray(
        np.random.default_rng(0).normal(size=(128, 128)), jnp.float32
    )
    w = 0.5 * (w + w.T)

    def loss_fused(A, mu, v, kappa):
        return jnp.sum(w * gram_lmcsm_fused(spec, t, meta, A, mu, v, kappa))

    def loss_xla(A, mu, v, kappa):
        return jnp.sum(w * gram_lmcsm(spec, t, meta, A, mu, v, kappa))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(A, mu, v, kappa)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(A, mu, v, kappa)
    for gf, gx, name in zip(g_fused, g_xla, ["A", "mu", "v", "kappa"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )


def test_fused_vmaps(rng):
    spec, args = _case(rng, Q=2, D=2, R=1, n=128)
    t, meta, A, mu, v, kappa = args
    As = jnp.stack([A, A * 0.5])
    Ks = jax.vmap(
        lambda a: gram_lmcsm_fused(spec, t, meta, a, mu, v, kappa)
    )(As)
    assert Ks.shape == (2, 128, 128)
    K0 = gram_lmcsm_fused(spec, t, meta, A, mu, v, kappa)
    np.testing.assert_allclose(np.asarray(Ks[0]), np.asarray(K0), atol=1e-5)


def test_fused_masked_epilogue_matches_mask_gram(rng):
    """Round-5 glue-gap closure: mask folded into the gram kernel epilogue
    equals the separate mask_gram pass, forward and backward."""
    from medgp_tpu.ops.nlml import mask_gram

    spec, args = _case(rng, Q=3, D=4, R=2, n=128)
    mask = np.ones(128, np.float32)
    mask[100:] = 0.0
    mask = jnp.asarray(mask)

    K_fused = gram_lmcsm_fused(spec, *args, mask=mask)
    K_ref = mask_gram(gram_lmcsm(spec, *args), mask)
    np.testing.assert_allclose(
        np.asarray(K_fused), np.asarray(K_ref), rtol=1e-4, atol=1e-5
    )

    # backward: weighted-sum cotangent through both paths
    t, meta, A, mu, v, kappa = args
    w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32))

    def f_fused(A, mu, v, kappa):
        return jnp.sum(
            w * gram_lmcsm_fused(spec, t, meta, A, mu, v, kappa, mask=mask)
        )

    def f_ref(A, mu, v, kappa):
        return jnp.sum(
            w * mask_gram(gram_lmcsm(spec, t, meta, A, mu, v, kappa), mask)
        )

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2, 3))(A, mu, v, kappa)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(A, mu, v, kappa)
    for gf, gr, name in zip(g_fused, g_ref, ("A", "mu", "v", "kappa")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-3, atol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_masked_objective_path_matches_unmasked_mask_gram(rng):
    """nlml_fn's pre-masked fast path (noiseless_gram(masked=True) +
    masked_nlml(pre_masked=True)) equals the legacy composition."""
    from medgp_tpu.models.gp import PatientData, noiseless_gram
    from medgp_tpu.ops.nlml import mask_gram, masked_nlml
    from tests.test_nlml import random_theta

    spec = LMCSMSpec(2, 2, 1)
    n = 128
    t = np.sort(rng.uniform(0, 72, size=n)).astype(np.float32)
    meta = rng.integers(0, 2, size=n).astype(np.int32)
    y = rng.normal(size=n).astype(np.float32)
    mask = np.ones(n, np.float32)
    mask[96:] = 0.0
    data = PatientData(
        t=jnp.asarray(t), y=jnp.asarray(y), meta=jnp.asarray(meta),
        mask=jnp.asarray(mask),
    )
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)

    Km = noiseless_gram(spec, theta, data, masked=True)
    K = noiseless_gram(spec, theta, data)
    nv = jnp.ones(n, jnp.float32) * 0.09
    r_pre = masked_nlml(Km, data.y, nv, data.mask, pre_masked=True)
    r_leg = masked_nlml(K, data.y, nv, data.mask)
    assert bool(r_pre.ok) and bool(r_leg.ok)
    np.testing.assert_allclose(
        float(r_pre.nlml), float(r_leg.nlml), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(Km), np.asarray(mask_gram(K, data.mask)),
        rtol=1e-4, atol=1e-5,
    )
