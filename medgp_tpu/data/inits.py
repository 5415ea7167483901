"""Random hyperparameter initializations, matching the reference's
distributions (not its rand() draws).

The reference draws each hyper from a 4096-level quantized uniform over
[lb, ub] and then applies a kernel-specific scale / inverse / log transform
(medgpc/src/dataio/c_experiment.cpp:493-588). We reproduce the exact
distributions — including the 12-bit quantization, which concentrates draws
on a lattice — with JAX PRNG, so restart screens match the reference in
distribution while remaining splittable/vectorizable.

LMC-SM transform map (c_experiment.cpp:532-564):
    lik    (D):     log(u),              u ~ Uq[lb_n, ub_n]
    A      (QDR):   0.9/sqrt(Q*R) * u,   u ~ Uq[lb_a, ub_a]
    mu     (Q):     log(1/u),            u ~ Uq[lb_period, ub_period]
    v      (Q):     log(1/(2*pi*u)),     u ~ Uq[lb_lengthscale, ub_lengthscale]
    kappa  (QD):    log(0.1/Q * u),      u ~ Uq[lb_lambda, ub_lambda]

Bound files list (lb, ub) pairs in exactly the flat-theta order
(medgpc/util/config.py:38-105 `write_medgpc_bound`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from medgp_tpu.models.params import (
    REF_PI,
    KernelSpec,
    LMCSMSpec,
    SESpec,
    SMSpec,
)

_LEVELS = 4096  # rand() quantized to 2^12 levels (c_experiment.cpp:500-506)


class HypBounds(NamedTuple):
    lb: jnp.ndarray  # (H,)
    ub: jnp.ndarray  # (H,)


def default_bounds(spec: KernelSpec, opt_config: dict | None = None) -> HypBounds:
    """Bounds in flat-theta order from an opt-config dict (keys as in
    scripts/opt_prior*.json: lower/upper_bound_{noise,a,period,lengthscale,
    lambda,scale})."""
    c = dict(
        lower_bound_noise=0.15, upper_bound_noise=0.4,
        lower_bound_a=-1.5, upper_bound_a=1.5,
        lower_bound_period=12.0, upper_bound_period=72.0,
        lower_bound_lengthscale=6.0, upper_bound_lengthscale=72.0,
        lower_bound_lambda=0.1, upper_bound_lambda=0.5,
        lower_bound_scale=0.1, upper_bound_scale=1.5,
    )
    if opt_config:
        c.update({k: v for k, v in opt_config.items() if k in c})

    def rep(lo, hi, n):
        return [c[lo]] * n, [c[hi]] * n

    lbs, ubs = [], []
    if isinstance(spec, LMCSMSpec):
        Q, D, R = spec.Q, spec.D, spec.R
        for lo, hi, n in [
            ("lower_bound_noise", "upper_bound_noise", D),
            ("lower_bound_a", "upper_bound_a", Q * D * R),
            ("lower_bound_period", "upper_bound_period", Q),
            ("lower_bound_lengthscale", "upper_bound_lengthscale", Q),
            ("lower_bound_lambda", "upper_bound_lambda", Q * D),
        ]:
            a, b = rep(lo, hi, n)
            lbs += a; ubs += b
    elif isinstance(spec, SESpec):
        for lo, hi, n in [
            ("lower_bound_noise", "upper_bound_noise", 1),
            ("lower_bound_lengthscale", "upper_bound_lengthscale", 1),
            ("lower_bound_scale", "upper_bound_scale", 1),
        ]:
            a, b = rep(lo, hi, n)
            lbs += a; ubs += b
    elif isinstance(spec, SMSpec):
        Q = spec.Q
        for lo, hi, n in [
            ("lower_bound_noise", "upper_bound_noise", 1),
            ("lower_bound_scale", "upper_bound_scale", Q),
            ("lower_bound_period", "upper_bound_period", Q),
            ("lower_bound_lengthscale", "upper_bound_lengthscale", Q),
        ]:
            a, b = rep(lo, hi, n)
            lbs += a; ubs += b
    else:
        raise TypeError(f"unsupported spec {spec!r}")
    return HypBounds(
        lb=jnp.asarray(np.array(lbs), jnp.float32),
        ub=jnp.asarray(np.array(ubs), jnp.float32),
    )


def _quantized_uniform(key, lb, ub, shape):
    """scale-free base draw: lb + (k+1)*(ub-lb)/4096, k ~ U{0..4095}."""
    k = jax.random.randint(key, shape, 0, _LEVELS)
    return lb + (k + 1).astype(jnp.float32) * (ub - lb) / _LEVELS


def random_inits(
    key: jax.Array,
    spec: KernelSpec,
    bounds: HypBounds,
    n_inits: int,
) -> jnp.ndarray:
    """(n_inits, H) initial flat theta vectors."""
    H = spec.n_hyp
    u = _quantized_uniform(
        key, bounds.lb[None, :], bounds.ub[None, :], (n_inits, H)
    )
    idx = jnp.arange(H)

    if isinstance(spec, LMCSMSpec):
        Q, D, R = spec.Q, spec.D, spec.R
        nl = spec.n_lik
        a_hi = nl + Q * D * R
        mu_hi = a_hi + Q
        v_hi = mu_hi + Q
        theta = jnp.where(idx < nl, jnp.log(u), 0.0)
        theta = jnp.where(
            (idx >= nl) & (idx < a_hi), 0.9 / jnp.sqrt(float(Q * R)) * u, theta
        )
        theta = jnp.where(
            (idx >= a_hi) & (idx < mu_hi), jnp.log(1.0 / u), theta
        )
        theta = jnp.where(
            (idx >= mu_hi) & (idx < v_hi),
            jnp.log(1.0 / (2.0 * REF_PI * u)),
            theta,
        )
        theta = jnp.where(idx >= v_hi, jnp.log(0.1 / Q * u), theta)
        return theta
    if isinstance(spec, SESpec):
        return jnp.log(u)  # all three hypers are log(draw)
    if isinstance(spec, SMSpec):
        Q = spec.Q
        nl = 1
        theta = jnp.where(idx < nl, jnp.log(u), 0.0)
        theta = jnp.where(
            (idx >= nl) & (idx < nl + Q), jnp.log(u / Q), theta
        )
        theta = jnp.where(
            (idx >= nl + Q) & (idx < nl + 2 * Q), jnp.log(1.0 / u), theta
        )
        theta = jnp.where(
            idx >= nl + 2 * Q, jnp.log(1.0 / (2.0 * REF_PI * u)), theta
        )
        return theta
    raise TypeError(f"unsupported spec {spec!r}")
