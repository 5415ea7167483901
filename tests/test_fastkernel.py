"""The numpy fastkernel oracle vs the XLA and Pallas gram builders.

Mirrors the role of the reference's medgpc/visualization/fastkernel.py — the
one place its kernel math is independently double-implemented — as a
cross-check for every gram path in this framework.
"""

import numpy as np
import jax.numpy as jnp

from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.ops.gram import gram_lmcsm, gram_se, gram_sm
from medgp_tpu.ops.pallas_gram import gram_lmcsm_fused
from medgp_tpu.visualization import fastkernel as fk


def _random_theta(rng, spec):
    theta = rng.normal(size=spec.n_hyp) * 0.3
    theta[: spec.D] = np.log(0.3)
    return theta


def test_fastkernel_lmcsm_matches_xla(rng):
    Q, D, R = 3, 4, 2
    spec = LMCSMSpec(Q, D, R)
    n = 24
    t = np.sort(rng.uniform(0, 72, size=n))
    meta = rng.integers(0, D, size=n)
    theta = _random_theta(rng, spec)

    want = fk.gram_lmcsm(theta, t, meta, Q, D, R)
    p = spec.unpack(jnp.asarray(theta))
    got = np.asarray(
        gram_lmcsm(
            spec, jnp.asarray(t), jnp.asarray(meta),
            p["A"], p["mu"], p["v"], p["kappa"],
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fastkernel_lmcsm_matches_pallas(rng):
    Q, D, R = 2, 3, 2
    spec = LMCSMSpec(Q, D, R)
    n = 128  # pallas-supported shape (multiple of 128)
    t = np.sort(rng.uniform(0, 72, size=n))
    meta = rng.integers(0, D, size=n)
    theta = _random_theta(rng, spec)

    want = fk.gram_lmcsm(theta, t, meta, Q, D, R)
    p = spec.unpack(jnp.asarray(theta))
    got = np.asarray(
        gram_lmcsm_fused(
            spec, jnp.asarray(t), jnp.asarray(meta),
            p["A"], p["mu"], p["v"], p["kappa"],
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fastkernel_unpack_coregional(rng):
    Q, D, R = 2, 5, 3
    spec = LMCSMSpec(Q, D, R)
    theta = _random_theta(rng, spec)
    noise_var, A, mu, v, kappa = fk.lmcsm_unpack(theta, Q, D, R)
    np.testing.assert_allclose(noise_var, np.exp(2.0 * theta[:D]), rtol=1e-12)
    B = fk.coregional_B(A, kappa)
    assert B.shape == (Q, D, D)
    for q in range(Q):
        np.testing.assert_allclose(
            B[q], A[q] @ A[q].T + np.diag(kappa[q]), rtol=1e-12
        )
        assert np.linalg.eigvalsh(B[q]).min() > 0


def test_fastkernel_sm_se_match(rng):
    Q = 3
    t = np.sort(rng.uniform(0, 48, size=16))
    theta_sm = np.concatenate(
        [[np.log(0.3)], rng.normal(size=3 * Q) * 0.4]
    )
    w = np.exp(theta_sm[1 : 1 + Q])
    mu = np.exp(theta_sm[1 + Q : 1 + 2 * Q])
    v = np.exp(theta_sm[1 + 2 * Q : 1 + 3 * Q])
    got = np.asarray(
        gram_sm(jnp.asarray(t), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(v))
    )
    np.testing.assert_allclose(
        got, fk.gram_sm(theta_sm, t, Q), rtol=1e-4, atol=1e-5
    )

    theta_se = np.array([np.log(0.3), np.log(7.0), np.log(1.3)])
    got_se = np.asarray(gram_se(jnp.asarray(t), 7.0, 1.3))
    np.testing.assert_allclose(
        got_se, fk.gram_se(theta_se, t), rtol=1e-4, atol=1e-5
    )
