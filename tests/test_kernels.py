"""Golden tests for kernel math against independent numpy oracles.

The oracles are written directly from the closed-form math (SM base function,
B = A A^T + diag(kappa), K = sum_q B_q[m_i,m_j] k_q), mirroring the role the
reference's numpy `fastkernel` module plays as its own second implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec, SESpec, SMSpec, REF_PI
from medgp_tpu.ops.gram import (
    sm_base,
    squared_dist,
    gram_lmcsm,
    gram_se,
    gram_sm,
    cross_gram_lmcsm,
    diag_lmcsm,
)


def np_sm_base(rsq, mu, v):
    r = np.sqrt(rsq)
    return np.cos(2.0 * REF_PI * r * mu) * np.exp(-2.0 * (REF_PI * v) ** 2 * rsq)


def np_gram_lmcsm(Q, D, R, t, meta, A, mu, v, kappa):
    n = len(t)
    B = np.stack([A[q] @ A[q].T + np.diag(kappa[q]) for q in range(Q)])
    rsq = (t[:, None] - t[None, :]) ** 2
    K = np.zeros((n, n))
    for q in range(Q):
        K += B[q][np.ix_(meta, meta)] * np_sm_base(rsq, mu[q], v[q])
    return K


def random_lmcsm_params(rng, Q, D, R):
    A = rng.normal(size=(Q, D, R)) * 0.3
    mu = np.exp(rng.normal(size=Q) * 0.5 - 2.0)
    v = np.exp(rng.normal(size=Q) * 0.5 - 4.0)
    kappa = np.exp(rng.normal(size=(Q, D)) - 2.0)
    return A, mu, v, kappa


def test_sm_base_matches_oracle(rng):
    rsq = rng.uniform(0, 100, size=(7, 9))
    mu, v = 0.11, 0.003
    got = np.asarray(sm_base(jnp.asarray(rsq), mu, v))
    np.testing.assert_allclose(got, np_sm_base(rsq, mu, v), rtol=1e-4, atol=1e-5)


def test_sm_base_at_zero_is_one():
    assert float(sm_base(jnp.asarray(0.0), 0.5, 0.2)) == pytest.approx(1.0)


def test_squared_dist(rng):
    x = rng.normal(size=12)
    x2 = rng.normal(size=5)
    got = np.asarray(squared_dist(jnp.asarray(x), jnp.asarray(x2)))
    want = (x[:, None] - x2[None, :]) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_coregional_B_psd_and_match(rng):
    Q, D, R = 3, 5, 2
    spec = LMCSMSpec(Q, D, R)
    A, mu, v, kappa = random_lmcsm_params(rng, Q, D, R)
    B = np.asarray(spec.coregional_B(jnp.asarray(A), jnp.asarray(kappa)))
    for q in range(Q):
        want = A[q] @ A[q].T + np.diag(kappa[q])
        np.testing.assert_allclose(B[q], want, rtol=1e-5, atol=1e-7)
        evs = np.linalg.eigvalsh(B[q])
        assert evs.min() > 0  # PSD + positive diagonal jitter kappa


def test_gram_lmcsm_matches_oracle(rng):
    Q, D, R = 4, 3, 2
    spec = LMCSMSpec(Q, D, R)
    n = 30
    t = np.sort(rng.uniform(0, 72, size=n))
    meta = rng.integers(0, D, size=n)
    A, mu, v, kappa = random_lmcsm_params(rng, Q, D, R)
    got = np.asarray(
        gram_lmcsm(
            spec,
            jnp.asarray(t),
            jnp.asarray(meta),
            jnp.asarray(A),
            jnp.asarray(mu),
            jnp.asarray(v),
            jnp.asarray(kappa),
        )
    )
    want = np_gram_lmcsm(Q, D, R, t, meta, A, mu, v, kappa)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got, got.T, atol=1e-6)  # symmetry


def test_cross_gram_consistent_with_self(rng):
    Q, D, R = 2, 3, 2
    spec = LMCSMSpec(Q, D, R)
    n = 14
    t = np.sort(rng.uniform(0, 24, size=n))
    meta = rng.integers(0, D, size=n)
    A, mu, v, kappa = random_lmcsm_params(rng, Q, D, R)
    args = tuple(map(jnp.asarray, (A, mu, v, kappa)))
    Kself = gram_lmcsm(spec, jnp.asarray(t), jnp.asarray(meta), *args)
    Kcross = cross_gram_lmcsm(
        spec, jnp.asarray(t), jnp.asarray(meta), jnp.asarray(t),
        jnp.asarray(meta), *args
    )
    np.testing.assert_allclose(np.asarray(Kself), np.asarray(Kcross), atol=1e-6)


def test_diag_lmcsm(rng):
    Q, D, R = 3, 4, 2
    spec = LMCSMSpec(Q, D, R)
    meta = rng.integers(0, D, size=9)
    A, mu, v, kappa = random_lmcsm_params(rng, Q, D, R)
    got = np.asarray(
        diag_lmcsm(spec, jnp.asarray(meta), jnp.asarray(A), jnp.asarray(kappa))
    )
    B = np.stack([A[q] @ A[q].T + np.diag(kappa[q]) for q in range(Q)])
    want = B.sum(0)[meta, meta]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gram_se(rng):
    t = np.sort(rng.uniform(0, 48, size=16))
    ell, sf = 7.0, 1.3
    got = np.asarray(gram_se(jnp.asarray(t), ell, sf))
    want = sf**2 * np.exp(-0.5 * ((t[:, None] - t[None, :]) / ell) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gram_sm(rng):
    Q = 3
    t = np.sort(rng.uniform(0, 48, size=16))
    w = np.exp(rng.normal(size=Q))
    mu = np.exp(rng.normal(size=Q) - 2)
    v = np.exp(rng.normal(size=Q) - 4)
    got = np.asarray(
        gram_sm(jnp.asarray(t), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(v))
    )
    rsq = (t[:, None] - t[None, :]) ** 2
    want = sum(w[q] * np_sm_base(rsq, mu[q], v[q]) for q in range(Q))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_unpack_roundtrip(rng):
    """Flat theta layout: [lik(D) | A(QDR) | log mu(Q) | log v(Q) | log kappa(QD)]."""
    Q, D, R = 2, 3, 2
    spec = LMCSMSpec(Q, D, R)
    assert spec.n_hyp == D + Q * (D * R + 2 + D)
    theta = rng.normal(size=spec.n_hyp)
    p = spec.unpack(jnp.asarray(theta))
    np.testing.assert_allclose(
        np.asarray(p["noise_std"]), np.exp(theta[:D]), rtol=1e-6
    )
    a_flat = theta[D : D + Q * D * R]
    np.testing.assert_allclose(
        np.asarray(p["A"]).reshape(-1), a_flat, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p["mu"]),
        np.exp(theta[D + Q * D * R : D + Q * D * R + Q]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(p["kappa"]).reshape(-1),
        np.exp(theta[D + Q * (D * R + 2) :]),
        rtol=1e-6,
    )


def test_gram_vmaps(rng):
    """The builders batch over restarts via vmap (replaces the reference's
    serial 1000-restart loop, main_one_train.cpp:228-253)."""
    Q, D, R = 2, 3, 2
    spec = LMCSMSpec(Q, D, R)
    n, B = 10, 4
    t = jnp.asarray(np.sort(rng.uniform(0, 24, size=n)))
    meta = jnp.asarray(rng.integers(0, D, size=n))
    thetas = jnp.asarray(rng.normal(size=(B, spec.n_hyp)) * 0.3)

    def one(theta):
        p = spec.unpack(theta)
        return gram_lmcsm(spec, t, meta, p["A"], p["mu"], p["v"], p["kappa"])

    Ks = jax.vmap(one)(thetas)
    assert Ks.shape == (B, n, n)
    K0 = one(thetas[0])
    np.testing.assert_allclose(np.asarray(Ks[0]), np.asarray(K0), atol=1e-6)
