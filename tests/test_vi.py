"""ADVI: exactness on a diagonal Gaussian target, moment agreement with HMC
on a GP posterior, clamp handling, and the vmapped cohort path."""

import numpy as np
import jax
import jax.numpy as jnp

from medgp_tpu.infer.vi import advi_fit, vi_patient
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.priors import clamp_a_elements, empty_prior
from tests.test_nlml import random_theta
from tests.test_varem import synth_lmcsm_patient


def test_gaussian_target_exact():
    """Mean-field ADVI on a diagonal Gaussian is exact: it must recover mu
    and sigma to optimizer precision."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])

    def pg(x):
        return jnp.sum(0.5 * ((x - mu) / sigma) ** 2), (x - mu) / sigma**2

    res = advi_fit(
        pg, jnp.zeros(3), jax.random.key(0),
        num_steps=1500, num_mc=8, learning_rate=0.05,
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.mean), np.asarray(mu),
                               atol=0.1)
    np.testing.assert_allclose(
        np.exp(np.asarray(res.log_std)), np.asarray(sigma), rtol=0.2
    )
    # the converged ELBO of an exact fit equals the entropy gap:
    # ELBO* = -KL(q||p) + log Z ... here p is unnormalized with
    # log Z = sum(log sigma) + (3/2) log 2pi, and KL -> 0
    want = float(jnp.sum(jnp.log(sigma)) + 1.5 * jnp.log(2 * jnp.pi))
    assert abs(float(res.elbo) - want) < 0.25


def test_vi_moments_match_hmc_on_gp(rng):
    """VI posterior moments within tolerance of HMC on a small LMC-SM
    patient (the BASELINE.json VI requirement).

    A N(0,1) prior on every unconstrained hyper identifies the posterior
    (the raw GP likelihood has flat directions along which MCMC drifts for
    nats), and both methods start from a properly screened+optimized MAP so
    they describe the same dominant mode."""
    from medgp_tpu.data.inits import default_bounds, random_inits
    from medgp_tpu.infer.hmc import hmc_patient
    from medgp_tpu.infer.map_train import screen_inits
    from medgp_tpu.infer.scg import scg_minimize
    from medgp_tpu.models.gp import objective_and_grad
    from medgp_tpu.models.priors import PRIOR_NORMAL

    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=40)
    H = spec.n_hyp
    prior = empty_prior(H)._replace(
        active=jnp.ones(H, bool),
        ptype=jnp.full(H, PRIOR_NORMAL, jnp.int32),
        loc=jnp.zeros(H, jnp.float32),
        scale=jnp.ones(H, jnp.float32),
    )
    inits = random_inits(jax.random.key(7), spec, default_bounds(spec), 64)
    sc = screen_inits(spec, data, inits)
    map_res = scg_minimize(
        objective_and_grad(spec, data, prior=prior),
        sc.best_theta, max_evals=500,
    )

    hmc = hmc_patient(
        spec, data, map_res.x, jax.random.key(2), prior=prior,
        num_chains=2, num_warmup=300, num_samples=500,
        num_leapfrog=8, init_step_size=0.005,
    )
    hs = np.asarray(hmc.samples).reshape(-1, spec.n_hyp)
    assert float(jnp.min(hmc.accept_rate)) > 0.5

    vi = vi_patient(
        spec, data, map_res.x, jax.random.key(3), prior=prior,
        num_steps=800, num_mc=4, learning_rate=0.02,
    )
    assert bool(vi.converged)
    vm = np.asarray(vi.mean)
    hm = hs.mean(0)
    hsd = hs.std(0)
    # per-coordinate posterior means agree well within one HMC posterior sd
    # (measured z-scores ~0.1; 0.5 allows seed-to-seed drift)
    z = np.abs(vm - hm) / np.maximum(hsd, 1e-3)
    assert np.all(z < 0.5), z
    # posterior stds match within 2x on every coordinate (mean-field VI is
    # biased narrow; measured ratios 0.7-1.0)
    vs = np.exp(np.asarray(vi.log_std))
    ratio = vs / np.maximum(hsd, 1e-4)
    assert np.all(ratio < 2.0) and np.all(ratio > 0.4), ratio


def test_clamped_hypers_stay_fixed(rng):
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=25)
    theta0_np = random_theta(rng, spec)
    theta0_np[spec.n_lik] = 0.0
    prior = clamp_a_elements(
        empty_prior(spec.n_hyp), spec,
        jnp.asarray([True] + [False] * (spec.Q * spec.D * spec.R - 1)),
    )
    res = vi_patient(
        spec, data, jnp.asarray(theta0_np, jnp.float32), jax.random.key(4),
        prior=prior, num_steps=100, num_mc=2,
    )
    i = spec.n_lik
    assert float(res.mean[i]) == 0.0
    np.testing.assert_array_equal(np.asarray(res.samples[:, i]), 0.0)
    # free coordinates moved
    assert float(jnp.std(res.samples[:, 0])) > 0


def test_vi_vmaps_over_patients(rng):
    spec = LMCSMSpec(1, 2, 1)
    ds = [synth_lmcsm_patient(rng, spec, n=20) for _ in range(3)]
    t = jnp.stack([d.t for d in ds]); y = jnp.stack([d.y for d in ds])
    meta = jnp.stack([d.meta for d in ds])
    mask = jnp.stack([d.mask for d in ds])
    thetas = jnp.stack([
        jnp.asarray(random_theta(rng, spec), jnp.float32) for _ in ds
    ])
    keys = jax.random.split(jax.random.key(5), 3)

    from medgp_tpu.models.gp import PatientData

    def one(th, t1, y1, m1, k1, kk):
        return vi_patient(
            spec, PatientData(t1, y1, m1, k1), th, kk,
            num_steps=60, num_mc=2, num_samples=16,
        )

    res = jax.jit(jax.vmap(one))(thetas, t, y, meta, mask, keys)
    assert res.samples.shape == (3, 16, spec.n_hyp)
    assert bool(jnp.all(jnp.isfinite(res.mean)))
