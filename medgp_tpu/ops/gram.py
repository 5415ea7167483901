"""Gram-matrix construction for the SE / SM / LMC-SM kernel families.

All builders are pure functions of natural parameters (already
exp-transformed; see :mod:`medgp_tpu.models.params`) and static-shape inputs,
so they batch with `vmap` and differentiate with `jax.grad`. The LMC-SM
builder accumulates over the Q mixture components with `lax.fori_loop` to keep
peak memory at O(n^2) instead of O(Q n^2); XLA fuses the per-component
elementwise work.

Math parity notes (vs the CUDA-free C++/MKL reference):
  * SM base function k(r^2; mu, v) = cos(2*pi*sqrt(r^2)*mu) *
    exp(-2*(pi*v)^2 * r^2) with the reference's low-precision PI
    (reference: medgpc/src/kernel/c_kernel_LMC_SM.cpp:374-378,
    medgpc/src/util/global_settings.h:6).
  * LMC-SM: K_ij = sum_q B_q[meta_i, meta_j] * k_q(r^2_ij) with
    B_q = A_q A_q^T + diag(kappa_q)
    (reference: c_kernel_LMC_SM.cpp:152-196, 72-115).
  * SE: K_ij = s^2 * exp(-0.5 * ((t_i-t_j)/l)^2)
    (reference: c_kernel_SE.cpp:72-89).
  * SM: K_ij = sum_q w_q * k_q(r^2_ij) (reference: c_kernel_SM.cpp:75-110).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from medgp_tpu.models.params import REF_PI, LMCSMSpec


def squared_dist(x: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distance |x_i - x2_j|^2, shape (n, m).

    (reference: medgpc/src/kernel/c_kernel.cpp:40-63 `compute_squared_dist`)
    """
    d = x[..., :, None] - x2[..., None, :]
    return d * d


def sm_base(rsq: jnp.ndarray, mu: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Spectral-mixture base correlation cos(2*pi*r*mu) * exp(-2*(pi*v)^2*r^2).

    `rsq` is the squared distance; `mu`, `v` broadcast against it.
    (reference: c_kernel_LMC_SM.cpp:374-378 `compute_k`)
    """
    r = jnp.sqrt(rsq)
    return jnp.cos(2.0 * REF_PI * r * mu) * jnp.exp(
        -2.0 * (REF_PI * v) ** 2 * rsq
    )


def gram_se(t: jnp.ndarray, lengthscale, scale) -> jnp.ndarray:
    """SE self gram, shape (n, n)."""
    rsq = squared_dist(t / lengthscale, t / lengthscale)
    return scale**2 * jnp.exp(-0.5 * rsq)


def gram_sm(t: jnp.ndarray, w, mu, v) -> jnp.ndarray:
    """SM self gram: sum_q w_q * k_q. w, mu, v have shape (Q,)."""
    rsq = squared_dist(t, t)

    def body(q, acc):
        return acc + w[q] * sm_base(rsq, mu[q], v[q])

    init = jnp.zeros_like(rsq)
    return lax.fori_loop(0, w.shape[0], body, init)


def _lmcsm_accumulate(rsq, Bmm, mu, v):
    """sum_q Bmm[q] * k_q(rsq); Bmm is the meta-gathered (Q, n, m) stack."""

    def body(q, acc):
        return acc + Bmm[q] * sm_base(rsq, mu[q], v[q])

    return lax.fori_loop(0, mu.shape[0], body, jnp.zeros_like(rsq))


def gram_lmcsm(
    spec: LMCSMSpec,
    t: jnp.ndarray,
    meta: jnp.ndarray,
    A: jnp.ndarray,
    mu: jnp.ndarray,
    v: jnp.ndarray,
    kappa: jnp.ndarray,
) -> jnp.ndarray:
    """LMC-SM self gram, shape (n, n).

    t: (n,) timestamps; meta: (n,) int output indices in [0, D).
    A: (Q, D, R) raw; mu, v: (Q,); kappa: (Q, D) (positive).
    (reference: c_kernel_LMC_SM.cpp:152-196 `compute_self_gram_matrix`)
    """
    B = spec.coregional_B(A, kappa)  # (Q, D, D)
    rsq = squared_dist(t, t)
    # Gather coregional coefficients onto the observation grid: (Q, n, n).
    Bmm = B[:, meta][:, :, meta]
    return _lmcsm_accumulate(rsq, Bmm, mu, v)


def cross_gram_lmcsm(
    spec: LMCSMSpec,
    t: jnp.ndarray,
    meta: jnp.ndarray,
    t2: jnp.ndarray,
    meta2: jnp.ndarray,
    A: jnp.ndarray,
    mu: jnp.ndarray,
    v: jnp.ndarray,
    kappa: jnp.ndarray,
) -> jnp.ndarray:
    """LMC-SM cross gram K(X, X2), shape (n, m).

    (reference: c_kernel_LMC_SM.cpp:329-372 `compute_cross_gram_matrix`)
    """
    B = spec.coregional_B(A, kappa)
    rsq = squared_dist(t, t2)
    Bmm = B[:, meta][:, :, meta2]
    return _lmcsm_accumulate(rsq, Bmm, mu, v)


def diag_lmcsm(
    spec: LMCSMSpec,
    meta: jnp.ndarray,
    A: jnp.ndarray,
    kappa: jnp.ndarray,
) -> jnp.ndarray:
    """Prior variance diag K(x, x) = sum_q B_q[meta, meta], shape (n,).

    (reference: c_kernel_LMC_SM.cpp:122-150 `compute_self_diag_matrix`;
    note k_q(0) = 1 for every component.)
    """
    B = spec.coregional_B(A, kappa)  # (Q, D, D)
    diag_d = jnp.sum(jnp.diagonal(B, axis1=-2, axis2=-1), axis=0)  # (D,)
    return diag_d[meta]
