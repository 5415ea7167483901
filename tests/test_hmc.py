"""HMC: correctness on a known Gaussian target, GP posterior sanity, clamp
handling, multi-chain vmap, posterior-predictive quality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.infer.hmc import (
    hmc_sample,
    hmc_patient,
    make_potential,
    posterior_predict,
)
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.priors import clamp_a_elements, empty_prior
from tests.test_nlml import random_theta
from tests.test_varem import synth_lmcsm_patient


def test_gaussian_target_moments():
    """Sampling N(mu, diag(sigma^2)) must recover mean and variance."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])

    def pg(x):
        u = jnp.sum(0.5 * ((x - mu) / sigma) ** 2)
        return u, (x - mu) / sigma**2

    res = hmc_sample(
        pg, jnp.zeros(3), jax.random.key(0),
        num_warmup=500, num_samples=2000, num_leapfrog=16,
        init_step_size=0.1,
    )
    s = np.asarray(res.samples)
    assert float(res.accept_rate) > 0.6
    assert int(res.divergences) == 0
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(s.std(0), np.asarray(sigma), rtol=0.35)


def test_step_size_adapts_toward_target():
    def pg(x):
        return 0.5 * jnp.sum(x**2), x

    res = hmc_sample(
        pg, jnp.zeros(5), jax.random.key(1),
        num_warmup=400, num_samples=400, num_leapfrog=8,
        init_step_size=1e-4, target_accept=0.8,
    )
    # dual averaging must grow the tiny initial step size by orders of
    # magnitude and land near the target accept rate
    assert float(res.step_size) > 1e-2
    assert 0.55 < float(res.accept_rate) <= 1.0


def test_hmc_gp_posterior_concentrates_near_map(rng):
    """On a well-identified patient, posterior potential should reach values
    comparable to the MAP loss, and chains must mix (finite, moving)."""
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=40)
    theta0 = jnp.asarray(random_theta(rng, spec), jnp.float32)

    from medgp_tpu.infer.scg import scg_minimize
    from medgp_tpu.models.gp import objective_and_grad

    map_res = scg_minimize(
        objective_and_grad(spec, data), theta0, max_evals=150
    )
    res = hmc_patient(
        spec, data, map_res.x, jax.random.key(2),
        num_chains=2, num_warmup=150, num_samples=150,
        num_leapfrog=8, init_step_size=0.005,
    )
    assert res.samples.shape == (2, 150, spec.n_hyp)
    assert bool(jnp.all(jnp.isfinite(res.samples)))
    assert float(jnp.min(res.accept_rate)) > 0.3
    # posterior mass lives near the MAP: best sampled U within a few nats of
    # the MAP objective (it cannot be far below it)
    best_u = float(jnp.min(res.potential))
    assert best_u < float(map_res.fx) + 20.0
    # chains actually move
    assert float(jnp.std(res.samples[:, :, 0])) > 1e-4


def test_clamped_hypers_stay_fixed(rng):
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=25)
    theta0_np = random_theta(rng, spec)
    theta0_np[spec.n_lik] = 0.0
    prior = clamp_a_elements(
        empty_prior(spec.n_hyp), spec,
        jnp.asarray([True] + [False] * (spec.Q * spec.D * spec.R - 1)),
    )
    res = hmc_patient(
        spec, data, jnp.asarray(theta0_np, jnp.float32), jax.random.key(3),
        prior=prior, num_chains=2, num_warmup=50, num_samples=50,
        num_leapfrog=6, init_step_size=0.005,
    )
    np.testing.assert_array_equal(
        np.asarray(res.samples[:, :, spec.n_lik]), 0.0
    )
    # other coordinates move
    assert float(jnp.std(res.samples[:, :, 0])) > 0


def test_posterior_predictive_beats_prior_guess(rng):
    """Posterior-predictive NLL at held-out points must beat a naive N(0,1)
    guess on GP-generated data."""
    spec = LMCSMSpec(1, 2, 1)
    full = synth_lmcsm_patient(rng, spec, n=50)
    # hold out the last 10 observations (by index)
    tr_mask = np.ones(50, np.float32)
    tr_mask[40:] = 0.0
    train = full._replace(mask=jnp.asarray(tr_mask))
    t2 = full.t[40:]
    meta2 = full.meta[40:]
    y2 = full.y[40:]

    from medgp_tpu.infer.scg import scg_minimize
    from medgp_tpu.models.gp import objective_and_grad

    map_res = scg_minimize(
        objective_and_grad(spec, train),
        jnp.asarray(random_theta(rng, spec), jnp.float32), max_evals=120
    )
    res = hmc_patient(
        spec, train, map_res.x, jax.random.key(4),
        num_chains=1, num_warmup=100, num_samples=100,
        num_leapfrog=8, init_step_size=0.005,
    )
    samples = res.samples[0]
    mean, var, nll_fn = posterior_predict(spec, samples, train, t2, meta2)
    assert bool(jnp.all(var > 0))
    nll = float(nll_fn(y2))
    naive = float(
        jnp.sum(0.5 * y2**2 + 0.5 * jnp.log(2 * jnp.pi))
    )
    assert nll < naive


def test_invariant_posterior_mean_defeats_symmetry(rng):
    """Round-5: the posterior mean must be computed on the kernel's
    invariants. Draws that differ only by A-column sign flips and a
    cross-chain component permutation must average back to the true B /
    mu / v — where the naive coordinate mean collapses A toward zero."""
    import numpy as np

    from medgp_tpu.infer.diagnostics import invariant_posterior_mean
    from medgp_tpu.models.params import LMCSMSpec

    spec = LMCSMSpec(3, 4, 2)
    Q, D, R = spec.Q, spec.D, spec.R
    nl = spec.n_lik
    th = rng.normal(size=spec.n_hyp) * 0.5
    th[:nl] = np.log(0.3)

    def blocks(t):
        A = t[nl : nl + Q * D * R].reshape(Q, D, R)
        mu = t[nl + Q * D * R : nl + Q * D * R + Q]
        v = t[nl + Q * D * R + Q : nl + Q * D * R + 2 * Q]
        k = t[nl + Q * (D * R + 2) :].reshape(Q, D)
        return A, mu, v, k

    A0, mu0, v0, k0 = blocks(th)
    B0 = np.einsum("qdr,qer->qde", A0, A0) + np.stack(
        [np.diag(np.exp(k0[q])) for q in range(Q)]
    )

    S = 8
    perm = np.array([2, 0, 1])  # chain-1 label switch
    chains = np.zeros((2, S, spec.n_hyp))
    for s in range(S):
        signs = rng.choice([-1.0, 1.0], size=(Q, 1, R))
        t = th.copy()
        t[nl : nl + Q * D * R] = (A0 * signs).reshape(-1)
        chains[0, s] = t
        t2 = th.copy()
        t2[nl : nl + Q * D * R] = (A0[perm] * signs[perm]).reshape(-1)
        t2[nl + Q * D * R : nl + Q * D * R + Q] = mu0[perm]
        t2[nl + Q * D * R + Q : nl + Q * D * R + 2 * Q] = v0[perm]
        t2[nl + Q * (D * R + 2) :] = k0[perm].reshape(-1)
        chains[1, s] = t2

    mean = invariant_posterior_mean(spec, chains)
    Am, mum, vm, km = blocks(mean)
    Bm = np.einsum("qdr,qer->qde", Am, Am) + np.stack(
        [np.diag(np.exp(km[q])) for q in range(Q)]
    )
    np.testing.assert_allclose(Bm, B0, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(mum, mu0, atol=1e-10)
    np.testing.assert_allclose(vm, v0, atol=1e-10)
    np.testing.assert_allclose(mean[:nl], th[:nl], atol=1e-12)

    # the naive mean is visibly degenerate on the same draws
    naive = chains.reshape(-1, spec.n_hyp).mean(0)
    An, _, _, kn = blocks(naive)
    Bn = np.einsum("qdr,qer->qde", An, An) + np.stack(
        [np.diag(np.exp(kn[q])) for q in range(Q)]
    )
    assert np.abs(Bn - B0).max() > 0.05
