"""varEM: E-step closed forms vs the reference formulas, sparsification
clamping, early stop, end-to-end MAP training on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec, cov_slices
from medgp_tpu.models.gp import PatientData
from medgp_tpu.infer.varem import VarEMState, e_step, varem_train
from medgp_tpu.infer.map_train import (
    train_one_patient,
    screen_inits,
    data_quality_ok,
)
from medgp_tpu.data.inits import default_bounds, random_inits
from tests.test_nlml import make_patient, random_theta


def np_e_step(Q, D, R, psi, delta, phi, tau, a, alpha, beta, gamma, d, eta):
    """Element-wise transcription of c_optimizer_varEM.cpp:105-206."""
    tau_n = np.zeros_like(tau)
    for q in range(Q):
        for r in range(R):
            tau_n[q, r] = (gamma + d) / (phi[q, r] + eta)
    phi_n = np.zeros_like(phi)
    for q in range(Q):
        for r in range(R):
            ds = delta[q, :, r].sum()
            phi_n[q, r] = (D * beta + gamma - 1.0) / (ds + tau_n[q, r])
    delta_n = np.zeros_like(delta)
    for q in range(Q):
        for dd in range(D):
            for r in range(R):
                delta_n[q, dd, r] = (alpha + beta) / (psi[q, dd, r] + phi_n[q, r])
    s = 2 * alpha - 3
    psi_n = (s + np.sqrt(s * s + 8 * delta_n * a * a)) / (4 * delta_n)
    return psi_n, delta_n, phi_n, tau_n


def test_e_step_matches_reference_formulas(rng):
    Q, D, R = 3, 4, 2
    spec = LMCSMSpec(Q, D, R)
    psi = rng.uniform(0.5, 2, (Q, D, R))
    delta = rng.uniform(0.5, 2, (Q, D, R))
    phi = rng.uniform(0.5, 2, (Q, R))
    tau = rng.uniform(0.5, 2, (Q, R))
    a = rng.normal(size=(Q, D, R))
    st = VarEMState(*map(lambda x: jnp.asarray(x, jnp.float64), (psi, delta, phi, tau)))
    fixed = jnp.asarray([0.5, 0.5, 0.5, 0.5, 0.01])
    new, clamp = e_step(spec, st, jnp.asarray(a), fixed, 0.0)

    psi_w, delta_w, phi_w, tau_w = np_e_step(
        Q, D, R, psi, delta, phi, tau, a, 0.5, 0.5, 0.5, 0.5, 0.01
    )
    np.testing.assert_allclose(np.asarray(new.tau), tau_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.phi), phi_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.delta), delta_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new.psi), psi_w, rtol=1e-4)
    assert not bool(jnp.any(clamp))  # no zeros here


def test_e_step_clamps_exact_zero_a():
    """a == 0 gives psi == 0 exactly (s=-2, sqrt(4)=2), triggering the clamp
    (c_optimizer_varEM.cpp:151-155 via update_psi:196-206)."""
    spec = LMCSMSpec(1, 2, 1)
    st = VarEMState.initial(spec, jnp.float32)
    a = jnp.zeros((1, 2, 1))
    fixed = jnp.asarray([0.5, 0.5, 0.5, 0.5, 0.01])
    new, clamp = e_step(spec, st, a, fixed, 0.0)
    assert bool(jnp.all(clamp))
    assert np.asarray(new.psi).max() == 0.0


def test_varem_flat_layout_roundtrip(rng):
    spec = LMCSMSpec(2, 3, 2)
    flat = jnp.asarray(rng.uniform(0.1, 2.0, 2 * spec.Q * (spec.D * spec.R + spec.R)))
    st = VarEMState.unflatten(spec, flat)
    np.testing.assert_allclose(np.asarray(st.flatten()), np.asarray(flat))


def test_random_inits_distributions(rng):
    """Init transforms follow the reference distribution map
    (c_experiment.cpp:532-564): A in +-0.9/sqrt(QR)*[lb,ub], mu=log(1/period),
    v=log(1/(2 pi l)), kappa=log(0.1/Q * lam)."""
    spec = LMCSMSpec(2, 3, 2)
    bounds = default_bounds(spec)
    thetas = np.asarray(
        random_inits(jax.random.key(0), spec, bounds, 4000)
    )
    sl = cov_slices(spec)
    D, Q, R = spec.D, spec.Q, spec.R

    noise = np.exp(thetas[:, sl["lik"]])
    assert noise.min() >= 0.15 - 1e-5 and noise.max() <= 0.4 + 1e-5

    a = thetas[:, sl["a"]]
    amax = 0.9 / np.sqrt(Q * R) * 1.5
    assert np.abs(a).max() <= amax + 1e-5
    assert a.min() < -amax * 0.9  # symmetric support reached

    period = 1.0 / np.exp(thetas[:, sl["mu"]])
    assert period.min() >= 12 - 1e-3 and period.max() <= 72 + 1e-3

    lscale = 1.0 / (2 * np.pi * np.exp(thetas[:, sl["v"]]))
    assert lscale.min() >= 5.9 and lscale.max() <= 72.5

    lam = np.exp(thetas[:, sl["kappa"]]) * Q / 0.1
    assert lam.min() >= 0.1 - 1e-4 and lam.max() <= 0.5 + 1e-4


def test_data_quality_gate(rng):
    spec = LMCSMSpec(1, 3, 1)
    d = make_patient(rng, spec, n=12)
    assert bool(data_quality_ok(d, 3))
    # drop all observations of output 2
    mask = np.asarray(d.mask).copy()
    mask[np.asarray(d.meta) == 2] = 0.0
    d2 = d._replace(mask=jnp.asarray(mask))
    assert not bool(data_quality_ok(d2, 3))


def test_screen_picks_argmin(rng):
    spec = LMCSMSpec(2, 2, 1)
    data = make_patient(rng, spec, n=16)
    thetas = jnp.asarray(
        np.stack([random_theta(rng, spec) for _ in range(8)]), jnp.float32
    )
    sc = screen_inits(spec, data, thetas)
    from medgp_tpu.models.gp import nlml_fn
    loss = nlml_fn(spec, data)
    vals = np.array([float(loss(t)[0]) for t in thetas])
    assert float(sc.best_loss) == pytest.approx(vals.min(), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(sc.best_theta), np.asarray(thetas[np.argmin(vals)])
    )


def synth_lmcsm_patient(rng, spec, n, n_pad=0, noise=0.1):
    """Sample y from a ground-truth LMC-SM GP so training has signal."""
    from tests.test_kernels import np_gram_lmcsm, random_lmcsm_params
    t = np.sort(rng.uniform(0, 72, size=n))
    meta = rng.integers(0, spec.D, size=n)
    meta[: 2 * spec.D] = np.tile(np.arange(spec.D), 2)
    A, mu, v, kappa = random_lmcsm_params(rng, spec.Q, spec.D, spec.R)
    K = np_gram_lmcsm(spec.Q, spec.D, spec.R, t, meta, A, mu, v, kappa)
    y = np.linalg.cholesky(K + 1e-8 * np.eye(n)) @ rng.normal(size=n)
    y = y + noise * rng.normal(size=n)
    t = np.concatenate([t, np.zeros(n_pad)])
    y = np.concatenate([y, np.zeros(n_pad)])
    meta = np.concatenate([meta, np.zeros(n_pad, int)])
    mask = np.concatenate([np.ones(n), np.zeros(n_pad)])
    return PatientData(
        t=jnp.asarray(t, jnp.float32),
        y=jnp.asarray(y, jnp.float32),
        meta=jnp.asarray(meta, jnp.int32),
        mask=jnp.asarray(mask, jnp.float32),
    )


def test_varem_end_to_end_sparsifies_and_improves(rng):
    spec = LMCSMSpec(2, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=30)
    bounds = default_bounds(spec)
    thetas = random_inits(jax.random.key(1), spec, bounds, 16)
    sc = screen_inits(spec, data, thetas)
    res = varem_train(
        spec, data, sc.best_theta, eta=0.01, beta_lam=0.01,
        outer_iters=8, sub_opt_iter=20,
    )
    assert bool(res.ok)
    assert float(res.loss) < float(sc.best_loss)
    assert int(res.n_outer) >= 1
    # psi must have been updated away from the all-ones init
    assert float(jnp.std(res.state.psi)) > 0


def test_train_one_patient_full_path(rng):
    spec = LMCSMSpec(2, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=24, n_pad=8)
    bounds = default_bounds(spec)
    thetas = random_inits(jax.random.key(2), spec, bounds, 8)
    res = train_one_patient(
        spec, data, thetas, prior_mode=2, eta=0.01, beta_lam=0.01,
        top_iters=6, sub_opt_iter=15,
    )
    assert bool(res.flag)
    assert np.isfinite(float(res.loss))
    assert int(res.n_obs) == 24

    # prior_mode 0: plain SCG path
    res0 = train_one_patient(
        spec, data, thetas, prior_mode=0, top_iters=40,
    )
    assert bool(res0.flag)
    assert float(res0.loss) < float(
        screen_inits(spec, data, thetas).best_loss
    )


def test_adaptive_screen_chunk_bounds():
    """Screen chunk shrinks as batch x n^2 grows so batch*chunk*n^2 fp32
    grams stay inside the HBM budget (the fixed chunk=32 OOMed a 16 GB
    chip at B=128, n=512 — observed on hardware, round 4)."""
    from medgp_tpu.infer.map_train import adaptive_screen_chunk

    assert adaptive_screen_chunk(1, 128) == 32      # small: full chunk
    assert adaptive_screen_chunk(128, 256) == 32
    c = adaptive_screen_chunk(128, 512)
    assert 1 <= c <= 16                             # shrunk
    assert 128 * c * 512 * 512 * 4 * 3 <= (4 << 30)
    assert adaptive_screen_chunk(1, 16384) == 1     # single large patient
