"""Online imputation: the one-Cholesky-per-timestamp LOO fast path must equal
explicit per-observation retraining (the reference algorithm), plus fallback
and online-update behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.gp import PatientData, posterior_at
from medgp_tpu.models.priors import hier_gamma_prior, empty_prior, clamp_a_elements
from medgp_tpu.infer.online import online_impute, unique_times
from tests.test_nlml import random_theta
from tests.test_varem import synth_lmcsm_patient


def reference_online_oracle(spec, theta, data, update_window=None):
    """Explicit transcription of the reference jj-loop: for each obs, retrain
    on past+other-current and predict (main_one_test.cpp:352-443)."""
    t = np.asarray(data.t)
    y = np.asarray(data.y)
    meta = np.asarray(data.meta)
    mask = np.asarray(data.mask) > 0
    n = len(t)
    preds = np.zeros(n)
    vars_ = np.zeros(n)
    fallback = np.zeros(n, bool)
    for i in range(n):
        if not mask[i]:
            continue
        ti = t[i]
        train_sel = mask & (
            ((t < ti) if update_window is None
             else ((t < ti) & (ti - t <= update_window)))
            | ((t == ti) & (np.arange(n) != i))
        )
        if train_sel.sum() == 0:
            fallback[i] = True
            continue
        sub = np.where(train_sel)[0]
        td = PatientData(
            t=jnp.asarray(t[sub], jnp.float32),
            y=jnp.asarray(y[sub], jnp.float32),
            meta=jnp.asarray(meta[sub], jnp.int32),
            mask=jnp.ones(len(sub), jnp.float32),
        )
        post = posterior_at(
            spec, jnp.asarray(theta, jnp.float32), td,
            jnp.asarray([ti], jnp.float32), jnp.asarray([meta[i]], jnp.int32),
        )
        preds[i] = float(post.mean[0])
        vars_[i] = float(post.var[0])
    return preds, vars_, fallback


def test_loo_matches_explicit_retraining(rng):
    spec = LMCSMSpec(2, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=20, n_pad=4)
    # duplicate a timestamp across outputs to exercise within-timestamp LOO
    t = np.asarray(data.t).copy()
    t[5] = t[4]
    data = data._replace(t=jnp.asarray(t))
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)

    u_t, u_ok = unique_times(data.t, data.mask, pad_to=24)
    res = online_impute(
        spec, theta, data, jnp.asarray(u_t), jnp.asarray(u_ok), update=False
    )

    preds, vars_, fb = reference_online_oracle(spec, theta, data)
    mask = np.asarray(data.mask) > 0
    got_pred = np.asarray(res.pred)
    got_ci = np.asarray(res.ci)
    y = np.asarray(data.y)

    got_var = np.asarray(res.var)
    for i in np.where(mask)[0]:
        assert bool(res.valid[i])
        if fb[i]:
            continue  # fallback checked separately
        assert got_pred[i] == pytest.approx(preds[i], rel=2e-2, abs=2e-3), i
        # predictive variance (the NLL input) matches explicit retraining
        assert got_var[i] == pytest.approx(vars_[i], rel=5e-2, abs=1e-4), i
        want_ci = int(abs(preds[i] - y[i]) <= 1.96 * np.sqrt(vars_[i]))
        # CI flags may flip at the boundary under fp reordering; compare
        # against a recomputed flag with the oracle numbers
        assert got_ci[i] == want_ci or abs(
            abs(preds[i] - y[i]) - 1.96 * np.sqrt(vars_[i])
        ) < 1e-3, i


def test_first_timestamp_fallback(rng):
    """The earliest observation has no history: pred 0, CI gated by the mode
    noise std (main_one_test.cpp:426-439)."""
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=10)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    # make the earliest timestamp hold exactly one observation
    t = np.asarray(data.t)
    i0 = int(np.argmin(t))
    assert (t == t[i0]).sum() == 1
    u_t, u_ok = unique_times(data.t, data.mask)
    res = online_impute(
        spec, theta, data, jnp.asarray(u_t), jnp.asarray(u_ok), update=False
    )
    assert float(res.pred[i0]) == 0.0
    sigma = float(np.exp(np.asarray(theta)[np.asarray(data.meta)[i0]]))
    want_ci = int(abs(float(data.y[i0])) <= 1.96 * sigma)
    assert int(res.ci[i0]) == want_ci


def test_padding_is_neutral(rng):
    spec = LMCSMSpec(2, 2, 1)
    rng2 = np.random.default_rng(5)
    d1 = synth_lmcsm_patient(rng2, spec, n=15, n_pad=0)
    rng2 = np.random.default_rng(5)
    d2 = synth_lmcsm_patient(rng2, spec, n=15, n_pad=9)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    u1, v1 = unique_times(d1.t, d1.mask)
    u2, v2 = unique_times(d2.t, d2.mask, pad_to=20)
    r1 = online_impute(spec, theta, d1, jnp.asarray(u1), jnp.asarray(v1), update=False)
    r2 = online_impute(spec, theta, d2, jnp.asarray(u2), jnp.asarray(v2), update=False)
    np.testing.assert_allclose(
        np.asarray(r1.pred), np.asarray(r2.pred)[:15], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(r2.valid)[15:], False)


def test_online_update_runs_and_moves_theta(rng):
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=30)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    u_t, u_ok = unique_times(data.t, data.mask)
    prior = empty_prior(spec.n_hyp)
    res = online_impute(
        spec, theta, data, jnp.asarray(u_t), jnp.asarray(u_ok),
        update=True, prior=prior, learn_rate=1e-3, momentum=0.9,
    )
    assert bool(jnp.all(jnp.isfinite(res.pred)))
    # with a healthy patient and lr>0, at least one update must have fired
    assert float(jnp.max(jnp.abs(res.theta_final - theta))) > 0


def test_online_update_respects_clamps(rng):
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=25)
    theta_np = random_theta(rng, spec)
    theta_np[spec.n_lik] = 0.0  # A element that the mode kernel zeroed
    theta = jnp.asarray(theta_np, jnp.float32)
    prior = clamp_a_elements(
        empty_prior(spec.n_hyp), spec,
        jnp.asarray([True] + [False] * (spec.Q * spec.D * spec.R - 1)),
    )
    u_t, u_ok = unique_times(data.t, data.mask)
    res = online_impute(
        spec, theta, data, jnp.asarray(u_t), jnp.asarray(u_ok),
        update=True, prior=prior, learn_rate=1e-3, momentum=0.9,
    )
    assert float(res.theta_final[spec.n_lik]) == 0.0


def test_loo_pallas_path_matches_xla(rng, monkeypatch):
    """Round-5: the online LOO fast path routes through the fused Pallas
    factorization chain (chol_solve + tri_inv) when enabled. Forced on in
    interpret mode here (n=128, the smallest supported shape), it must
    produce the same predictions as the XLA branch."""
    spec = LMCSMSpec(2, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=96, n_pad=32)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    u_t, u_ok = unique_times(data.t, data.mask, pad_to=128)

    monkeypatch.setenv("MEDGP_PALLAS_CHOL", "0")
    res_xla = online_impute(
        spec, theta, data, jnp.asarray(u_t), jnp.asarray(u_ok), update=False
    )
    monkeypatch.setenv("MEDGP_PALLAS_CHOL", "1")
    res_pal = online_impute(
        spec, theta, data, jnp.asarray(u_t), jnp.asarray(u_ok), update=False
    )
    np.testing.assert_allclose(
        np.asarray(res_pal.pred), np.asarray(res_xla.pred),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_pal.var), np.asarray(res_xla.var),
        rtol=2e-3, atol=2e-4,
    )
    assert np.array_equal(np.asarray(res_pal.valid), np.asarray(res_xla.valid))
