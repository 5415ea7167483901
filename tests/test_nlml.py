"""NLML: value vs numpy oracle, masking neutrality, jitter retry, autodiff
gradients vs finite differences, prediction correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec, REF_PI
from medgp_tpu.models.priors import (
    empty_prior,
    hier_gamma_prior,
    log_prior,
    clamp_a_elements,
    set_a_variance,
)
from medgp_tpu.models.gp import (
    PatientData,
    nlml_fn,
    noiseless_gram,
    objective_and_grad,
    posterior_at,
)
from medgp_tpu.ops.nlml import masked_nlml, jittered_cholesky, mask_gram

from tests.test_kernels import np_gram_lmcsm, random_lmcsm_params


def make_patient(rng, spec, n, n_pad=0):
    t = np.sort(rng.uniform(0, 72, size=n))
    meta = rng.integers(0, spec.D, size=n)
    # guarantee >= 2 obs per output (reference data-quality gate)
    meta[: spec.D] = np.arange(spec.D)
    meta[spec.D : 2 * spec.D] = np.arange(spec.D)
    y = rng.normal(size=n)
    if n_pad:
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


def np_nlml(K, y, noise, jitter_mult=1):
    Kn = K + np.diag(noise) * jitter_mult
    L = np.linalg.cholesky(Kn)
    alpha = np.linalg.solve(Kn, y)
    return (
        0.5 * y @ alpha
        + np.sum(np.log(np.diag(L)))
        + 0.5 * len(y) * np.log(2 * REF_PI)
    )


def random_theta(rng, spec, scale=0.3):
    theta = rng.normal(size=spec.n_hyp) * scale
    theta[: spec.n_lik] = np.log(rng.uniform(0.2, 0.4, size=spec.n_lik))
    return theta


def test_nlml_matches_numpy_oracle(rng):
    spec = LMCSMSpec(2, 3, 2)
    data = make_patient(rng, spec, n=25)
    theta = random_theta(rng, spec)
    loss = nlml_fn(spec, data)
    value, res = loss(jnp.asarray(theta, jnp.float32))

    p = {k: np.asarray(v) for k, v in spec.unpack(jnp.asarray(theta)).items()}
    K = np_gram_lmcsm(
        spec.Q, spec.D, spec.R,
        np.asarray(data.t), np.asarray(data.meta),
        p["A"], p["mu"], p["v"], p["kappa"],
    )
    noise = (p["noise_std"] ** 2)[np.asarray(data.meta)]
    want = np_nlml(K, np.asarray(data.y), noise)
    assert bool(res.ok)
    assert float(value) == pytest.approx(want, rel=2e-4)


def test_masking_is_exactly_neutral(rng):
    """Padding a patient must not change NLML, up to fp reordering."""
    spec = LMCSMSpec(2, 3, 2)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    rng2 = np.random.default_rng(1)
    d_nopad = make_patient(rng2, spec, n=20, n_pad=0)
    rng2 = np.random.default_rng(1)
    d_pad = make_patient(rng2, spec, n=20, n_pad=13)
    v1, r1 = nlml_fn(spec, d_nopad)(theta)
    v2, r2 = nlml_fn(spec, d_pad)(theta)
    assert bool(r1.ok) and bool(r2.ok)
    assert float(v1) == pytest.approx(float(v2), rel=1e-5)


def test_jitter_retry_escalates(rng):
    """A gram made indefinite triggers multiplier escalation, and the result
    matches a direct factorization with the escalated diagonal."""
    n = 10
    base = rng.normal(size=(n, n))
    K = base @ base.T
    # subtract enough diagonal to make K + 1*noise indefinite but K + k*noise PD
    noise = np.full(n, 1.0)
    K = K - np.diag(np.full(n, 2.5))
    w = np.linalg.eigvalsh(K + np.diag(noise))
    if w.min() > 0:  # ensure the first attempt fails
        K = K - np.diag(np.full(n, w.min() + 0.5))
    mask = np.ones(n)
    Km = jnp.asarray(K + np.outer(0 * mask, mask), jnp.float64)
    res = jittered_cholesky(jnp.asarray(K, jnp.float64), jnp.asarray(noise))
    assert int(res.mult) > 1
    if bool(res.ok):
        want = np.linalg.cholesky(K + int(res.mult) * np.diag(noise))
        np.testing.assert_allclose(np.asarray(res.L), want, rtol=1e-5, atol=1e-6)


def test_jitter_failure_flag():
    """A hopeless matrix reports ok=False with a finite factor."""
    n = 6
    K = -np.eye(n) * 100.0
    res = jittered_cholesky(jnp.asarray(K, jnp.float32), jnp.zeros(n, jnp.float32))
    assert not bool(res.ok)
    assert np.all(np.isfinite(np.asarray(res.L)))


def test_grad_matches_finite_differences(rng):
    spec = LMCSMSpec(2, 2, 1)
    data = make_patient(rng, spec, n=18, n_pad=4)
    theta = random_theta(rng, spec)
    loss = nlml_fn(spec, data)

    f = lambda th: float(loss(jnp.asarray(th, jnp.float32))[0])
    g = np.asarray(
        jax.grad(lambda th: loss(th)[0])(jnp.asarray(theta, jnp.float32))
    )
    eps = 1e-3
    for i in range(spec.n_hyp):
        e = np.zeros_like(theta)
        e[i] = eps
        fd = (f(theta + e) - f(theta - e)) / (2 * eps)
        assert g[i] == pytest.approx(fd, rel=5e-2, abs=2e-2), f"hyper {i}"


def test_map_objective_with_prior_and_clamping(rng):
    spec = LMCSMSpec(2, 2, 2)
    data = make_patient(rng, spec, n=16)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)

    prior = hier_gamma_prior(spec, beta_lam=0.01)
    loss_map = nlml_fn(spec, data, prior=prior)
    loss_ml = nlml_fn(spec, data)
    v_map, _ = loss_map(theta)
    v_ml, _ = loss_ml(theta)
    lp = log_prior(prior, theta)
    assert float(v_map) == pytest.approx(float(v_ml) - float(lp), rel=1e-5)

    # clamp one A element: its gradient must be exactly zero
    a_clamp = np.zeros(spec.Q * spec.D * spec.R, bool)
    a_clamp[3] = True
    prior_c = clamp_a_elements(prior, spec, jnp.asarray(a_clamp))
    f = objective_and_grad(spec, data, prior=prior_c)
    _, g, ok = f(theta)
    assert bool(ok)
    assert float(g[spec.n_lik + 3]) == 0.0
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_log_prior_formulas(rng):
    """Normal(loc, VARIANCE) and Laplace(loc, b) match the reference formulas
    (c_prior.cpp:383-421), including the exp-transform evaluation point."""
    spec = LMCSMSpec(1, 2, 1)
    prior = hier_gamma_prior(spec, beta_lam=0.25)
    prior = set_a_variance(
        prior, spec, jnp.full(spec.Q * spec.D * spec.R, 2.0)
    )
    theta = np.asarray(random_theta(rng, spec))
    got = float(log_prior(prior, jnp.asarray(theta, jnp.float64)))

    D, Q, R = spec.D, spec.Q, spec.R
    a = theta[D : D + Q * D * R]
    kappa = np.exp(theta[D + Q * (D * R + 2) :])
    lp_a = np.sum(-(a**2) / (2 * 2.0) - 0.5 * np.log(2 * REF_PI * 2.0))
    lp_k = np.sum(-np.abs(kappa) / 0.25 - np.log(2 * 0.25))
    assert got == pytest.approx(lp_a + lp_k, rel=1e-6)


def test_posterior_prediction_against_oracle(rng):
    spec = LMCSMSpec(2, 2, 1)
    data = make_patient(rng, spec, n=20, n_pad=5)
    theta = random_theta(rng, spec)
    t2 = np.array([10.0, 33.3])
    meta2 = np.array([0, 1])
    post = posterior_at(
        spec,
        jnp.asarray(theta, jnp.float32),
        data,
        jnp.asarray(t2, jnp.float32),
        jnp.asarray(meta2, jnp.int32),
    )

    p = {k: np.asarray(v) for k, v in spec.unpack(jnp.asarray(theta)).items()}
    m = np.asarray(data.mask).astype(bool)
    t, meta, y = np.asarray(data.t)[m], np.asarray(data.meta)[m], np.asarray(data.y)[m]
    K = np_gram_lmcsm(spec.Q, spec.D, spec.R, t, meta, p["A"], p["mu"], p["v"], p["kappa"])
    noise = (p["noise_std"] ** 2)[meta]
    Kn = K + np.diag(noise)
    B = np.stack(
        [p["A"][q] @ p["A"][q].T + np.diag(p["kappa"][q]) for q in range(spec.Q)]
    )
    rsq = (t[:, None] - t2[None, :]) ** 2

    def np_sm(rsq, mu, v):
        return np.cos(2 * REF_PI * np.sqrt(rsq) * mu) * np.exp(
            -2 * (REF_PI * v) ** 2 * rsq
        )

    Ks = sum(
        B[q][np.ix_(meta, meta2)] * np_sm(rsq, p["mu"][q], p["v"][q])
        for q in range(spec.Q)
    )
    kss = B.sum(0)[meta2, meta2]
    alpha = np.linalg.solve(Kn, y)
    mean_want = Ks.T @ alpha
    var_want = (
        kss
        - np.diag(Ks.T @ np.linalg.solve(Kn, Ks))
        + (p["noise_std"] ** 2)[meta2]
    )
    np.testing.assert_allclose(np.asarray(post.mean), mean_want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(post.var), var_want, rtol=1e-3, atol=1e-4)


def test_vmap_over_restarts_and_patients(rng):
    """One fused call evaluates (patients x restarts) objectives — the TPU
    replacement for both the restart loop and the Slurm fan-out."""
    spec = LMCSMSpec(2, 2, 1)
    P, S = 3, 5
    datas = [make_patient(rng, spec, n=12, n_pad=6) for _ in range(P)]
    batch = PatientData(
        t=jnp.stack([d.t for d in datas]),
        y=jnp.stack([d.y for d in datas]),
        meta=jnp.stack([d.meta for d in datas]),
        mask=jnp.stack([d.mask for d in datas]),
    )
    thetas = jnp.asarray(
        np.stack(
            [[random_theta(rng, spec) for _ in range(S)] for _ in range(P)]
        ),
        jnp.float32,
    )

    def one(data, theta):
        return nlml_fn(spec, data)(theta)[0]

    values = jax.vmap(
        lambda d_t, d_y, d_m, d_k, th: jax.vmap(
            lambda x: one(PatientData(d_t, d_y, d_m, d_k), x)
        )(th)
    )(batch.t, batch.y, batch.meta, batch.mask, thetas)
    assert values.shape == (P, S)
    v00 = one(datas[0], thetas[0, 0])
    assert float(values[0, 0]) == pytest.approx(float(v00), rel=1e-5)


def test_qmatrix_vjp_matches_plain_autodiff(rng):
    """The custom Q-matrix backward of masked_nlml must equal plain autodiff
    through an undecorated cholesky NLML — for the nlml, alpha, and L
    cotangent paths separately."""
    from jax.scipy.linalg import cho_solve, solve_triangular

    from medgp_tpu.ops.nlml import mask_gram, masked_nlml

    spec = LMCSMSpec(2, 3, 2)
    data = make_patient(rng, spec, n=20, n_pad=4)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    n = data.t.shape[0]
    K = np.asarray(
        noiseless_gram(spec, theta, data), np.float64
    )
    K = jnp.asarray(K + K.T + 0.5 * np.eye(n), jnp.float32)  # generic sym PD-ish
    nv = jnp.asarray(rng.uniform(0.1, 0.3, size=n), jnp.float32)

    def plain(K, nv):
        m = data.mask
        y_eff = data.y * m
        Km = mask_gram(K, m) + jnp.diag(nv * m)
        L = jnp.linalg.cholesky(Km)
        alpha = cho_solve((L, True), y_eff)
        nlml = 0.5 * jnp.dot(y_eff, alpha) + jnp.sum(jnp.log(jnp.diagonal(L)))
        return nlml, L, alpha

    def ours(K, nv):
        res = masked_nlml(K, data.y, nv, data.mask)
        nlml = res.nlml - 0.5 * jnp.sum(data.mask) * jnp.log(2.0 * REF_PI)
        return nlml, res.L, res.alpha

    # deterministic probe vectors for the alpha/L cotangent paths
    probe_a = jnp.asarray(rng.normal(size=n), jnp.float32)
    probe_L = jnp.asarray(np.tril(rng.normal(size=(n, n))), jnp.float32)

    outs = {
        "nlml": lambda f: lambda K, nv: f(K, nv)[0],
        "L": lambda f: lambda K, nv: jnp.sum(f(K, nv)[1] * probe_L),
        "alpha": lambda f: lambda K, nv: jnp.dot(f(K, nv)[2], probe_a),
        "mixed": lambda f: lambda K, nv: (
            f(K, nv)[0] + jnp.dot(f(K, nv)[2], probe_a)
        ),
    }
    for name, pick in outs.items():
        gK_ref, gn_ref = jax.grad(pick(plain), argnums=(0, 1))(K, nv)
        gK, gn = jax.grad(pick(ours), argnums=(0, 1))(K, nv)
        # compare only unmasked entries (the plain path differs on padding),
        # and symmetrized (K is symmetric upstream, so only dK + dK^T is
        # identified; JAX's cholesky-VJP and the Q-matrix rule distribute the
        # off-diagonal mass differently)
        m = np.asarray(data.mask) > 0
        sel = np.ix_(m, m)
        sym = lambda G: (np.asarray(G) + np.asarray(G).T) / 2
        np.testing.assert_allclose(
            sym(gK)[sel], sym(gK_ref)[sel],
            rtol=2e-3, atol=2e-4, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(gn)[m], np.asarray(gn_ref)[m],
            rtol=2e-3, atol=2e-4, err_msg=name,
        )


def test_f64_accumulation_regime_at_n4096(rng):
    """The precision regime pinned against an f64 oracle at scale.

    The reference factorizes in fp32 but ACCUMULATES logdet and the y^T alpha
    quadratic form in double (c_inference_exact.cpp:118-152, cblas_dsdot at
    c_kernel_LMC_SM.cpp:322). `_nlml_core` mirrors that when x64 is enabled:
    all O(n^2)+ work stays fp32, the two scalar reductions accumulate in f64.
    This pins the mixed regime against (a) a numpy mirror of exactly that
    regime (tight) and (b) a full-f64 oracle (factorization-limited tol).
    """
    spec = LMCSMSpec(2, 4, 2)
    n = 4096
    data = make_patient(rng, spec, n=n)
    theta = random_theta(rng, spec)

    p = {k: np.asarray(v) for k, v in spec.unpack(jnp.asarray(theta)).items()}
    t_np, meta_np, y_np = (
        np.asarray(data.t), np.asarray(data.meta), np.asarray(data.y)
    )
    K32 = np_gram_lmcsm(
        spec.Q, spec.D, spec.R, t_np, meta_np,
        p["A"], p["mu"], p["v"], p["kappa"],
    ).astype(np.float32)
    noise = ((p["noise_std"] ** 2)[meta_np]).astype(np.float32)

    # (a) numpy mirror of the mixed regime: fp32 potrf/solve, f64 reductions
    Kn32 = (K32 + np.diag(noise)).astype(np.float32)
    L32 = np.linalg.cholesky(Kn32)
    alpha32 = np.linalg.solve(Kn32, y_np.astype(np.float32))
    mixed = (
        0.5 * np.dot(y_np.astype(np.float64), alpha32.astype(np.float64))
        + np.sum(np.log(np.diag(L32)).astype(np.float64))
        + 0.5 * n * np.log(2 * REF_PI)
    )
    # (b) full-f64 oracle
    oracle64 = np_nlml(
        K32.astype(np.float64), y_np.astype(np.float64),
        noise.astype(np.float64),
    )

    with jax.enable_x64():
        res = masked_nlml(
            jnp.asarray(K32, jnp.float32), jnp.asarray(y_np, jnp.float32),
            jnp.asarray(noise, jnp.float32), jnp.asarray(data.mask),
        )
        assert bool(res.ok)
        got = float(res.nlml)

    assert got == pytest.approx(mixed, rel=3e-5)
    assert got == pytest.approx(oracle64, rel=2e-4)
