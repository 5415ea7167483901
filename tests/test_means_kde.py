"""Mean functions (const / const_mo) and the KDE prior (type 3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec, REF_PI
from medgp_tpu.models.gp import PatientData, nlml_fn, posterior_at
from medgp_tpu.models.priors import empty_prior, log_prior, set_kde_prior
from medgp_tpu.cluster.kde import kde_log_density_and_grad
from tests.test_nlml import make_patient, random_theta


def test_const_mo_mean_shifts_nlml(rng):
    """Adding a per-output constant mean equal to the per-output sample mean
    must not hurt the NLML vs the zero mean on mean-shifted data."""
    spec0 = LMCSMSpec(1, 2, 1)
    spec_m = LMCSMSpec(1, 2, 1, mean_kind="const_mo")
    assert spec_m.n_hyp == spec0.n_hyp + 2

    data = make_patient(rng, spec0, n=30)
    shift = np.asarray([3.0, -2.0], np.float32)
    y_shifted = np.asarray(data.y) + shift[np.asarray(data.meta)]
    data_s = data._replace(y=jnp.asarray(y_shifted * np.asarray(data.mask)))

    theta0 = random_theta(rng, spec0)
    v_zero, r0 = nlml_fn(spec0, data_s)(jnp.asarray(theta0, jnp.float32))

    theta_m = np.concatenate([theta0, shift])
    v_mean, r1 = nlml_fn(spec_m, data_s)(jnp.asarray(theta_m, jnp.float32))
    assert bool(r0.ok) and bool(r1.ok)
    assert float(v_mean) < float(v_zero)

    # and with zero mean hypers it reduces exactly to the zero-mean model
    theta_m0 = np.concatenate([theta0, np.zeros(2)])
    v_eq, _ = nlml_fn(spec_m, data_s)(jnp.asarray(theta_m0, jnp.float32))
    assert float(v_eq) == pytest.approx(float(v_zero), rel=1e-6)


def test_const_mean_prediction_offsets(rng):
    spec = LMCSMSpec(1, 2, 1, mean_kind="const")
    data = make_patient(rng, LMCSMSpec(1, 2, 1), n=20)
    theta = np.concatenate([random_theta(rng, LMCSMSpec(1, 2, 1)), [5.0]])
    # far-future point: posterior reverts to the constant mean
    post = posterior_at(
        spec, jnp.asarray(theta, jnp.float32), data,
        jnp.asarray([1e6], jnp.float32), jnp.asarray([0], jnp.int32),
    )
    assert float(post.mean[0]) == pytest.approx(5.0, abs=1e-2)


def test_mean_grad_flows(rng):
    spec = LMCSMSpec(1, 2, 1, mean_kind="const_mo")
    base = make_patient(rng, LMCSMSpec(1, 2, 1), n=16)
    theta = jnp.asarray(
        np.concatenate([random_theta(rng, LMCSMSpec(1, 2, 1)), [0.5, -0.5]]),
        jnp.float32,
    )
    g = jax.grad(lambda th: nlml_fn(spec, base)(th)[0])(theta)
    assert float(jnp.abs(g[-2:]).sum()) > 0


def test_kde_prior_matches_reference_formula(rng):
    spec = LMCSMSpec(1, 2, 1)
    H = spec.n_hyp
    samples = rng.normal(size=7)
    bw = 0.4
    prior = set_kde_prior(empty_prior(H), 3, jnp.asarray(samples), bw)
    theta = np.asarray(random_theta(rng, spec), np.float64)
    got = float(log_prior(prior, jnp.asarray(theta, jnp.float32)))

    # reference formula (c_prior.cpp:165-194) with REF_PI
    x = theta[3]
    ds = np.exp(-0.5 * ((x - samples) / bw) ** 2) / np.sqrt(2 * REF_PI)
    want = np.log(ds.sum() / (len(samples) * bw))
    assert got == pytest.approx(want, rel=1e-4)


def test_kde_prior_gradient_matches_analytic(rng):
    spec = LMCSMSpec(1, 2, 1)
    samples = rng.normal(size=9)
    bw = 0.3
    prior = set_kde_prior(empty_prior(spec.n_hyp), 2, jnp.asarray(samples), bw)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    g = jax.grad(lambda th: log_prior(prior, th))(theta)
    _, dlp = kde_log_density_and_grad(float(theta[2]), bw, samples)
    # cluster.kde uses np.pi; REF_PI differs in the 8th digit -> loose rtol
    assert float(g[2]) == pytest.approx(dlp, rel=1e-3)
    assert float(jnp.abs(g).sum()) == pytest.approx(abs(float(g[2])), rel=1e-5)
