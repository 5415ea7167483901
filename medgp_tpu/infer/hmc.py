"""Hamiltonian Monte Carlo over GP hyperparameters.

The capability the reference lacks: instead of a single MAP point per patient
(varEM + SCG), sample the posterior p(theta | y) with the same
hierarchical-gamma-style priors, giving calibrated uncertainty over kernel
hyperparameters and posterior-predictive distributions.

TPU-first design choices:
  * fixed-shape leapfrog integration (`lax.scan` over a static step count)
    with uniformly jittered trajectory lengths — the ChEES-era alternative to
    recursive NUTS tree building, which maps poorly onto XLA's static-shape
    compilation model;
  * dual-averaging step-size adaptation (Nesterov/Hoffman-Gelman) targeting
    a configurable accept statistic, and diagonal mass-matrix estimation from
    the second half of warmup;
  * everything vmaps: chains x patients run as one batched program, the
    sampler analog of the restart screen;
  * divergences (energy error > threshold) are rejected and counted, never
    crash the batch;
  * clamped hypers (prior type 0) get zero momentum and zero gradient, so
    sparsity-clamped A-elements stay exactly fixed during sampling.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from medgp_tpu.models.gp import PatientData, nlml_fn
from medgp_tpu.models.params import KernelSpec
from medgp_tpu.models.priors import PriorSpec


class HMCResult(NamedTuple):
    samples: jnp.ndarray       # (S, H) posterior draws
    potential: jnp.ndarray     # (S,) U(theta) at each draw
    accept_prob: jnp.ndarray   # (S,) per-draw acceptance statistic
    accept_rate: jnp.ndarray   # () mean acceptance over sampling phase
    step_size: jnp.ndarray     # () adapted step size
    inv_mass: jnp.ndarray      # (H,) adapted diagonal inverse mass
    divergences: jnp.ndarray   # () int32 count during sampling


def _leapfrog(
    potential_grad, theta, p, eps, inv_mass, n_steps, max_steps, grad_mask
):
    """Velocity-Verlet with a static step budget: always runs `max_steps`
    kick-drift-kick iterations, freezing after `n_steps` (which may be a
    traced value — the jittered-trajectory trick that keeps shapes static
    under XLA). Returns (theta', p', U')."""

    def step(carry, i):
        th, mom, g = carry
        active = i < n_steps
        mom1 = mom - 0.5 * eps * g
        th1 = th + eps * inv_mass * mom1 * grad_mask
        _, g2 = potential_grad(th1)
        g2 = g2 * grad_mask
        mom2 = mom1 - 0.5 * eps * g2
        return (
            jnp.where(active, th1, th),
            jnp.where(active, mom2, mom),
            jnp.where(active, g2, g),
        ), None

    _, g0 = potential_grad(theta)
    (th, mom, g), _ = lax.scan(
        step, (theta, p, g0 * grad_mask), jnp.arange(max_steps)
    )
    u, _ = potential_grad(th)
    return th, mom, u


class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray


def _da_update(st: _DAState, accept_prob, i, target, mu,
               gamma=0.05, t0=10.0, kappa=0.75):
    """Dual averaging (Hoffman & Gelman 2014, Algorithm 5)."""
    it = i.astype(jnp.float32) + 1.0
    h_bar = (1.0 - 1.0 / (it + t0)) * st.h_bar + (
        (target - accept_prob) / (it + t0)
    )
    log_eps = mu - jnp.sqrt(it) / gamma * h_bar
    w = it ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * st.log_eps_bar
    return _DAState(log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar)


def two_phase_warmup(
    kernel: Callable,
    state0,
    theta_of: Callable,
    key: jax.Array,
    num_warmup: int,
    init_step_size: float,
    target_accept: float,
    gmask: jnp.ndarray,
    dtype,
):
    """Shared sampler warmup: phase 1 adapts the step size by dual averaging
    under identity mass while estimating the diagonal mass matrix from its
    second half (Welford); phase 2 re-adapts the step size under the new
    mass. Adapting eps only once and *then* switching the mass would leave a
    step size calibrated for the wrong metric (off by sqrt(mass) per
    coordinate) — on wide targets that froze the chain entirely.

    `kernel(state, key, eps, inv_mass) -> (state, accept_prob)`;
    `theta_of(state)` extracts the position. Returns (state, eps, inv_mass).
    """
    H = gmask.shape[-1]
    n1 = max((num_warmup * 3) // 5, 1)
    n2 = max(num_warmup - n1, 0)
    k1, k2 = jax.random.split(key)

    def phase(state, keys, inv_mass, eps_init, collect_from, n_steps):
        da0 = _DAState(
            log_eps=jnp.log(eps_init.astype(dtype)),
            log_eps_bar=jnp.asarray(0.0, dtype),
            h_bar=jnp.asarray(0.0, dtype),
        )
        mu = jnp.log(10.0 * eps_init)
        carry0 = dict(
            state=state, da=da0,
            mean=jnp.zeros(H, dtype), m2=jnp.zeros(H, dtype),
            count=jnp.asarray(0.0, dtype),
        )

        def step(carry, xs):
            i, kk = xs
            eps = jnp.exp(carry["da"].log_eps)
            state, accept_prob = kernel(carry["state"], kk, eps, inv_mass)
            da = _da_update(carry["da"], accept_prob, i, target_accept, mu)
            in_window = i >= collect_from
            cnt = carry["count"] + in_window.astype(dtype)
            th = theta_of(state)
            delta = th - carry["mean"]
            mean = carry["mean"] + jnp.where(
                in_window, delta / jnp.maximum(cnt, 1.0), 0.0
            )
            m2 = carry["m2"] + jnp.where(in_window, delta * (th - mean), 0.0)
            return dict(state=state, da=da, mean=mean, m2=m2, count=cnt), None

        carry, _ = lax.scan(step, carry0, (jnp.arange(n_steps), keys))
        eps = jnp.exp(carry["da"].log_eps_bar)
        eps = jnp.where(jnp.isfinite(eps) & (eps > 0), eps, eps_init)
        var = carry["m2"] / jnp.maximum(carry["count"] - 1.0, 1.0)
        n_w = jnp.maximum(carry["count"], 1.0)
        inv_new = (n_w / (n_w + 5.0)) * var + (5.0 / (n_w + 5.0)) * 1e-3
        inv_new = jnp.where(gmask > 0, jnp.maximum(inv_new, 1e-6), 1e-6)
        return carry["state"], eps, inv_new

    state, eps1, inv_mass = phase(
        state0, jax.random.split(k1, n1), jnp.ones(H, dtype),
        jnp.asarray(init_step_size, dtype), n1 // 2, n1,
    )
    if n2 == 0:
        return state, eps1, inv_mass
    # re-adapt eps under the estimated mass; a mass change of factor m
    # rescales the stable step by ~1/sqrt(median m)
    eps2_init = eps1 / jnp.sqrt(
        jnp.maximum(jnp.median(jnp.where(gmask > 0, inv_mass, 1.0)), 1e-6)
    )
    state, eps2, _ = phase(
        state, jax.random.split(k2, n2), inv_mass, eps2_init, n2, n2
    )
    return state, eps2, inv_mass


def hmc_sample(
    potential_grad: Callable,
    theta0: jnp.ndarray,
    key: jax.Array,
    num_warmup: int = 200,
    num_samples: int = 200,
    num_leapfrog: int = 16,
    init_step_size: float = 0.01,
    target_accept: float = 0.8,
    jitter_steps: bool = True,
    divergence_threshold: float = 1000.0,
    grad_mask: Optional[jnp.ndarray] = None,
) -> HMCResult:
    """Sample from exp(-U) given `potential_grad(theta) -> (U, dU)`.

    All sizes are static; the function vmaps over chains/patients.
    """
    dtype = theta0.dtype
    H = theta0.shape[-1]
    gmask = (
        jnp.ones(H, dtype) if grad_mask is None else grad_mask.astype(dtype)
    )

    def kernel(state, key, eps, inv_mass, n_steps):
        theta, u = state
        k1, k2, k3 = jax.random.split(key, 3)
        p = jax.random.normal(k1, (H,), dtype) / jnp.sqrt(inv_mass)
        p = p * gmask  # clamped hypers carry no momentum
        ke0 = 0.5 * jnp.sum(inv_mass * p * p)

        th2, p2, u2 = _leapfrog(
            potential_grad, theta, p, eps, inv_mass, n_steps,
            num_leapfrog, gmask,
        )
        ke2 = 0.5 * jnp.sum(inv_mass * p2 * p2)
        dH = (u2 + ke2) - (u + ke0)
        dH = jnp.where(jnp.isfinite(dH), dH, jnp.inf)
        divergent = dH > divergence_threshold
        accept_prob = jnp.where(
            jnp.isfinite(dH), jnp.minimum(1.0, jnp.exp(-dH)), 0.0
        )
        take = (jax.random.uniform(k2, (), dtype) < accept_prob) & ~divergent
        theta_new = jnp.where(take, th2, theta)
        u_new = jnp.where(take, u2, u)
        return (theta_new, u_new), accept_prob, divergent

    def steps_for(key):
        if not jitter_steps:
            return num_leapfrog
        return jax.random.randint(key, (), 1, num_leapfrog + 1)

    u0, _ = potential_grad(theta0)

    def warm_kernel(state, key, eps, inv_mass):
        k1, k2 = jax.random.split(key)
        state, accept_prob, _ = kernel(state, k1, eps, inv_mass, steps_for(k2))
        return state, accept_prob

    keys = jax.random.split(key, num_samples + 1)
    warm_state, eps, inv_mass = two_phase_warmup(
        warm_kernel, (theta0, u0), lambda s: s[0], keys[-1],
        num_warmup, init_step_size, target_accept, gmask, dtype,
    )

    # ---- sampling ----
    def sample_step(carry, xs):
        key = xs
        k1, k2 = jax.random.split(key)
        state, accept_prob, divergent = kernel(
            carry, k1, eps, inv_mass, steps_for(k2)
        )
        return state, (state[0], state[1], accept_prob, divergent)

    final, (samples, pots, aps, divs) = lax.scan(
        sample_step, warm_state, keys[:num_samples]
    )
    return HMCResult(
        samples=samples,
        potential=pots,
        accept_prob=aps,
        accept_rate=jnp.mean(aps),
        step_size=eps,
        inv_mass=inv_mass,
        divergences=jnp.sum(divs.astype(jnp.int32)),
    )


def make_potential(
    spec: KernelSpec,
    data: PatientData,
    prior: Optional[PriorSpec] = None,
    max_retries: int = 10,
):
    """U(theta) = NLML - log prior; failed factorizations return U=+inf with
    zero gradient so the proposal is rejected rather than crashing."""
    loss = nlml_fn(spec, data, prior=prior, max_retries=max_retries)

    def u(theta):
        v, _ = loss(theta)
        return v

    vg = jax.value_and_grad(u)

    def potential_grad(theta):
        v, g = vg(theta)
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return v, g

    return potential_grad


def hmc_patient(
    spec: KernelSpec,
    data: PatientData,
    theta0: jnp.ndarray,
    key: jax.Array,
    prior: Optional[PriorSpec] = None,
    num_chains: int = 4,
    **hmc_kwargs,
) -> HMCResult:
    """Multi-chain HMC for one patient (chains vmapped); theta0 may be (H,)
    (replicated with jittered starts) or (num_chains, H)."""
    pg = make_potential(spec, data, prior)
    gmask = None if prior is None else prior.grad_mask()
    if theta0.ndim == 1:
        k0, key = jax.random.split(key)
        jitter = 0.01 * jax.random.normal(
            k0, (num_chains, theta0.shape[-1]), theta0.dtype
        )
        if gmask is not None:
            jitter = jitter * gmask
        theta0 = theta0[None, :] + jitter
    keys = jax.random.split(key, theta0.shape[0])
    return jax.vmap(
        lambda th, kk: hmc_sample(pg, th, kk, grad_mask=gmask, **hmc_kwargs)
    )(theta0, keys)


def posterior_predict(
    spec: KernelSpec,
    samples: jnp.ndarray,
    train: PatientData,
    t2: jnp.ndarray,
    meta2: jnp.ndarray,
    thin: int = 1,
):
    """Posterior-predictive mixture at test points.

    Returns (mean (m,), var (m,), nll_fn) where mean/var are the moments of
    the equally-weighted Gaussian mixture over posterior draws, and
    `nll_fn(y2)` evaluates the predictive negative log-likelihood
    log-mean-exp over draws — the acceptance metric of BASELINE.json.
    """
    from medgp_tpu.models.gp import posterior_at

    sub = samples[::thin]

    def one(theta):
        post = posterior_at(spec, theta, train, t2, meta2)
        return post.mean, post.var

    means, variances = jax.vmap(one)(sub)  # (S, m)
    mix_mean = jnp.mean(means, axis=0)
    mix_var = (
        jnp.mean(variances + means**2, axis=0) - mix_mean**2
    )

    def nll_fn(y2):
        lp = (
            -0.5 * (y2[None, :] - means) ** 2 / variances
            - 0.5 * jnp.log(2 * jnp.pi * variances)
        )
        lme = jax.scipy.special.logsumexp(lp, axis=0) - jnp.log(
            jnp.asarray(float(sub.shape[0]))
        )
        return -jnp.sum(lme)

    return mix_mean, mix_var, nll_fn
