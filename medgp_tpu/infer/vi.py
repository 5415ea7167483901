"""Mean-field variational inference (ADVI) over GP hyperparameters.

The third posterior-inference mode next to HMC/NUTS (the capability triad the
rebuild adds over the reference's MAP-only pipeline — the varEM MAP path it
subsumes is /root/reference/medgpc/src/util/c_optimizer_varEM.cpp:26-163).
ADVI fits q(theta) = N(m, diag(s^2)) to exp(-U(theta)) over the SAME
unconstrained hyper vector the MAP/HMC paths use (lik ‖ cov ‖ mean with
cov = [A raw ‖ log mu ‖ log v ‖ log kappa], c_hyperparam.cpp:99-122), so the
sparsity-inducing hierarchical-gamma prior, clamping, and every downstream
consumer (posterior_predict, mode clustering of posterior means) are shared.

TPU-first design:
  * the ELBO gradient is the reparameterization estimator — theta = m + s*eps
    — averaged over a static number of MC draws per step (vmapped, so each
    ADVI step is ONE batched NLML+grad evaluation: the same fused
    gram+Cholesky program the optimizers and samplers run);
  * the optimization loop is a `lax.scan` of Adam steps (static step count),
    so whole cohorts vmap patient x (nothing is data-dependent);
  * clamped hypers (prior type 0, e.g. varEM-sparsified A elements) keep
    q degenerate at theta0: zero gradient through the mask, log_s pinned at
    LOG_S_CLAMP — exactly the sampler's zero-momentum treatment;
  * non-finite MC objectives (a failed factorization at an extreme draw) are
    masked out of the step average instead of poisoning the fit, mirroring
    the SCG line-search NaN rejection (c_optimizer_scg.cpp:125-128).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from medgp_tpu.infer.hmc import make_potential
from medgp_tpu.models.gp import PatientData
from medgp_tpu.models.params import KernelSpec
from medgp_tpu.models.priors import PriorSpec

# q's log-std for clamped coordinates: effectively a point mass, but large
# enough that exp(2x) stays a normal fp32 number inside the entropy term.
LOG_S_CLAMP = -20.0


class VIResult(NamedTuple):
    mean: jnp.ndarray        # (H,) variational posterior mean
    log_std: jnp.ndarray     # (H,) variational posterior log-std
    samples: jnp.ndarray     # (S, H) draws from the fitted q
    elbo: jnp.ndarray        # () final smoothed ELBO estimate
    elbo_trace: jnp.ndarray  # (num_steps,) per-step MC ELBO estimates
    converged: jnp.ndarray   # () bool: trace finite over the final quarter


def elbo_and_grad(
    potential_grad: Callable,
    m: jnp.ndarray,
    log_s: jnp.ndarray,
    eps: jnp.ndarray,
    gmask: jnp.ndarray,
):
    """MC ELBO and its reparameterization gradient from draws `eps` (K, H).

    ELBO(m, s) = -E_q[U] + sum(log s) + H/2 (1 + log 2pi); the entropy's
    gradient is exact (1/s), only the energy term is estimated. Returns
    (elbo, dm, dlog_s) with non-finite draws masked out of the average.
    """
    s = jnp.exp(log_s)

    def one(e):
        theta = m + s * e * gmask
        u, g = potential_grad(theta)
        ok = jnp.isfinite(u)
        u = jnp.where(ok, u, 0.0)
        g = jnp.where(ok, g, 0.0)
        # d(-U)/dm = -g ; d(-U)/dlog_s = -g * s * e  (chain rule through
        # theta = m + exp(log_s) * e)
        return u, -g, -g * s * e, ok.astype(m.dtype)

    us, dms, dss, oks = jax.vmap(one)(eps)
    n_ok = jnp.maximum(jnp.sum(oks), 1.0)
    energy = -jnp.sum(us) / n_ok
    dm = jnp.sum(dms, 0) / n_ok
    dlog_s = jnp.sum(dss, 0) / n_ok

    n_free = jnp.sum(gmask)
    entropy = jnp.sum(log_s * gmask) + 0.5 * n_free * (
        1.0 + jnp.log(2.0 * jnp.asarray(jnp.pi, m.dtype))
    )
    elbo = energy + entropy
    dm = dm * gmask
    dlog_s = (dlog_s + 1.0) * gmask  # +1 = exact entropy gradient wrt log_s
    # declare the step failed if every draw failed
    elbo = jnp.where(jnp.sum(oks) > 0, elbo, -jnp.inf)
    return elbo, dm, dlog_s


def advi_fit(
    potential_grad: Callable,
    theta0: jnp.ndarray,
    key: jax.Array,
    num_steps: int = 400,
    num_mc: int = 4,
    num_samples: int = 200,
    learning_rate: float = 0.02,
    init_log_std: float = -3.0,
    grad_mask: Optional[jnp.ndarray] = None,
) -> VIResult:
    """Fit N(m, diag(s^2)) to exp(-U) by maximizing the MC ELBO with Adam.

    All sizes static; vmaps over patients. `theta0` initializes m (use the
    MAP point — the runner does, like the samplers).
    """
    dtype = theta0.dtype
    H = theta0.shape[-1]
    gmask = (
        jnp.ones(H, dtype) if grad_mask is None else grad_mask.astype(dtype)
    )
    log_s0 = jnp.where(gmask > 0, jnp.asarray(init_log_std, dtype),
                       jnp.asarray(LOG_S_CLAMP, dtype))

    b1, b2, adam_eps = 0.9, 0.999, 1e-8

    def step(carry, xs):
        i, kk = xs
        m, log_s, mom, vel = carry
        eps = jax.random.normal(kk, (num_mc, H), dtype)
        elbo, dm, dls = elbo_and_grad(potential_grad, m, log_s, eps, gmask)
        g = jnp.concatenate([dm, dls])  # ascend: Adam on -ELBO's gradient
        ok = jnp.isfinite(elbo)
        g = jnp.where(ok, -g, 0.0)
        mom = b1 * mom + (1 - b1) * g
        vel = b2 * vel + (1 - b2) * g * g
        it = i.astype(dtype) + 1.0
        mhat = mom / (1 - b1**it)
        vhat = vel / (1 - b2**it)
        upd = learning_rate * mhat / (jnp.sqrt(vhat) + adam_eps)
        m = m - upd[:H] * gmask
        log_s = log_s - upd[H:] * gmask
        log_s = jnp.clip(log_s, LOG_S_CLAMP, 5.0)
        return (m, log_s, mom, vel), elbo

    k_fit, k_draw = jax.random.split(key)
    keys = jax.random.split(k_fit, num_steps)
    zeros2 = jnp.zeros(2 * H, dtype)
    (m, log_s, _, _), trace = lax.scan(
        step, (theta0, log_s0, zeros2, zeros2),
        (jnp.arange(num_steps), keys),
    )

    tail = trace[-max(num_steps // 4, 1):]
    elbo = jnp.mean(jnp.where(jnp.isfinite(tail), tail, 0.0))
    converged = jnp.all(jnp.isfinite(tail))

    draws = jax.random.normal(k_draw, (num_samples, H), dtype)
    samples = m[None, :] + jnp.exp(log_s)[None, :] * draws * gmask[None, :]
    return VIResult(
        mean=m, log_std=log_s, samples=samples,
        elbo=elbo, elbo_trace=trace, converged=converged,
    )


def vi_patient(
    spec: KernelSpec,
    data: PatientData,
    theta0: jnp.ndarray,
    key: jax.Array,
    prior: Optional[PriorSpec] = None,
    **vi_kwargs,
) -> VIResult:
    """ADVI posterior for one patient over the MAP/HMC potential. The result
    pytree vmaps across patients (the runner buckets + shards it exactly like
    the samplers)."""
    pg = make_potential(spec, data, prior)
    gmask = None if prior is None else prior.grad_mask()
    return advi_fit(pg, theta0, key, grad_mask=gmask, **vi_kwargs)
