"""Masked negative log marginal likelihood and posterior prediction.

Ragged patients are padded to a fixed n_max and carried with a {0,1} mask.
Padded rows/columns of the gram matrix are replaced by identity so a single
batched Cholesky factorizes every patient in one fused XLA op:

    K_masked = (m m^T) * K + diag(1 - m) + diag(m * noise)

Padded entries then contribute log(1)=0 to the log-determinant and 0 to the
quadratic form (y is masked to 0), which makes the masking exactly neutral.

The Cholesky keeps the reference's jitter-escalation semantics: on failure the
noise diagonal is added again, up to `max_retries` more times (reference:
medgpc/src/inference/c_inference_exact.cpp:97-111). The retry loop's own
factorization is the result (one factorization in the common path) and a
custom VJP replays the factorization at the chosen multiplier for the
backward pass, so `jax.grad` of the NLML is exact for the factorization
actually used.

NLML = 1/2 y^T alpha + sum_i log L_ii + (sum m)/2 * log(2*pi)
(reference: c_inference_exact.cpp:118-152).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import cho_solve, solve_triangular

from medgp_tpu.models.params import REF_PI


class CholResult(NamedTuple):
    L: jnp.ndarray        # (n, n) lower Cholesky factor of the masked gram
    ok: jnp.ndarray       # () bool: factorization succeeded
    mult: jnp.ndarray     # () int32: noise-diagonal multiplier actually used


def _chol_ok(L: jnp.ndarray) -> jnp.ndarray:
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(d) & (d > 0.0), axis=-1)


def jittered_cholesky(
    K: jnp.ndarray,
    noise_diag: jnp.ndarray,
    max_retries: int = 10,
) -> CholResult:
    """Cholesky of K + mult*diag(noise_diag), escalating mult on failure.

    `K` must already contain the identity padding for masked-out rows;
    `noise_diag` must already be masked (0 on padded entries).
    Attempts mult = 1, 2, ..., 1 + max_retries; `ok` is False if all fail.
    """
    L, ok, mult = _jittered_chol_cv(K, noise_diag, max_retries)
    return CholResult(L=L, ok=ok, mult=mult)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _jittered_chol_cv(K, noise_diag, max_retries):
    """Jitter-search Cholesky with a custom VJP.

    The search loop's factorizations ARE the result (no duplicate
    differentiable re-factorization; reverse-mode through while_loop is
    unsupported, hence the custom rule). The backward pass replays one
    cholesky at the chosen multiplier through jax.vjp — so a full
    value-and-grad costs 2 factorizations instead of 3, and a value-only
    evaluation (restart screens, line-search probes) costs 1 instead of 2.
    """
    n = K.shape[-1]

    def attempt(mult):
        return jnp.linalg.cholesky(
            K + jnp.diag(mult.astype(K.dtype) * noise_diag)
        )

    def cond(state):
        mult, L, ok = state
        return jnp.logical_and(~ok, mult <= max_retries)

    def body(state):
        mult, _, _ = state
        mult = mult + 1
        L = attempt(mult)
        return mult, L, _chol_ok(L)

    mult0 = jnp.asarray(1, jnp.int32)
    L0 = attempt(mult0)
    mult, L, ok = lax.while_loop(cond, body, (mult0, L0, _chol_ok(L0)))
    L = jnp.where(ok, L, jnp.eye(n, dtype=K.dtype))
    return L, ok, mult


def _pallas_chol_enabled(n: int) -> bool:
    from medgp_tpu.ops.pallas_chol import (
        pallas_chol_supported,
        use_pallas_chol,
    )

    return use_pallas_chol() and pallas_chol_supported(n)


def _jittered_chol_solve(Km, y_eff, noise_eff, max_retries):
    """Pallas fast path for the forward factorization chain: one fused
    kernel produces (L, alpha, diag-block inverses) per jitter attempt —
    replacing XLA's cholesky + cho_solve expansions (~15 ms of the 22 ms
    canonical objective+grad batch on a v5e; tools/profile_hot.py).
    Semantics match _jittered_chol_cv + cho_solve exactly: per-patient
    escalation mult = 1..1+max_retries (c_inference_exact.cpp:97-111)."""
    from medgp_tpu.ops.pallas_chol import chol_solve

    n = Km.shape[-1]

    def attempt(mult):
        return chol_solve(Km, mult.astype(Km.dtype) * noise_eff, y_eff)

    def cond(state):
        mult, _, _, _, ok = state
        return jnp.logical_and(~ok, mult <= max_retries)

    def body(state):
        mult = state[0] + 1
        L, a, d = attempt(mult)
        return mult, L, a, d, _chol_ok(L)

    mult0 = jnp.asarray(1, jnp.int32)
    L0, a0, d0 = attempt(mult0)
    mult, L, alpha, linvd, ok = lax.while_loop(
        cond, body, (mult0, L0, a0, d0, _chol_ok(L0))
    )
    L = jnp.where(ok, L, jnp.eye(n, dtype=Km.dtype))
    alpha = jnp.where(ok, alpha, jnp.zeros_like(alpha))
    return L, alpha, linvd, ok, mult


def _jittered_chol_cv_fwd(K, noise_diag, max_retries):
    L, ok, mult = _jittered_chol_cv(K, noise_diag, max_retries)
    return (L, ok, mult), (K, noise_diag, ok, mult)


def _jittered_chol_cv_bwd(max_retries, res, cts):
    K, noise_diag, ok, mult = res
    dL, _, _ = cts
    n = K.shape[-1]

    def refact(K, noise_diag):
        Kj = K + jnp.diag(mult.astype(K.dtype) * noise_diag)
        Kj = jnp.where(ok, Kj, jnp.eye(n, dtype=K.dtype))
        return jnp.linalg.cholesky(Kj)

    _, vjp = jax.vjp(refact, K, noise_diag)
    dL = jnp.where(ok, dL, jnp.zeros_like(dL))
    dK, dnoise = vjp(dL)
    return dK, dnoise


_jittered_chol_cv.defvjp(_jittered_chol_cv_fwd, _jittered_chol_cv_bwd)


class NLMLResult(NamedTuple):
    nlml: jnp.ndarray     # () scalar negative log marginal likelihood
    ok: jnp.ndarray       # () bool success flag
    L: jnp.ndarray        # (n, n) Cholesky factor
    alpha: jnp.ndarray    # (n,) K^{-1} (y - mean)
    mult: jnp.ndarray     # () jitter multiplier used


def _nlml_core_impl(Km, y_eff, noise_eff, max_retries):
    """Shared forward computation. Returns ((nlml_raw, L, alpha, ok, mult),
    linvd) — linvd is the pallas kernel's diagonal-superblock-inverse
    residual (None on the XLA path)."""
    linvd = None
    if _pallas_chol_enabled(Km.shape[-1]):
        L, alpha, linvd, ok, mult = _jittered_chol_solve(
            Km, y_eff, noise_eff, max_retries
        )
    else:
        L, ok, mult = _jittered_chol_cv(Km, noise_eff, max_retries)
        alpha = cho_solve((L, True), y_eff)
    # Mixed-precision regime mirroring the reference: fp32 gram/Cholesky/
    # solves with the logdet and quadratic-form reductions ACCUMULATED in
    # double (c_inference_exact.cpp:118-152 accumulates log L_ii and y^T
    # alpha in `double`; cblas_dsdot at c_kernel_LMC_SM.cpp:322). Under
    # JAX's default x64-disabled config this is an exact no-op; enabling
    # x64 (the reference-parity regime) makes the accumulation genuinely
    # double while everything O(n^2)+ stays fp32 — a VPU-scalar cost only.
    acc = jnp.float64 if jax.config.jax_enable_x64 else Km.dtype
    logdet = jnp.sum(jnp.log(jnp.diagonal(L)).astype(acc))
    quad = jnp.dot(y_eff.astype(acc), alpha.astype(acc))
    out = ((0.5 * quad + logdet).astype(Km.dtype), L, alpha, ok, mult)
    return out, linvd


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _nlml_core(Km, y_eff, noise_eff, max_retries):
    """(raw NLML, L, alpha, ok, mult) of M = Km + mult*diag(noise_eff).

    Custom VJP: the NLML cotangent uses the reference's Q-matrix identity
    d NLML / dM = 1/2 (M^{-1} - alpha alpha^T)
    (c_inference_exact.cpp:168-172) — one triangular inverse + one syrk-shaped
    matmul, instead of autodiff's replayed factorization + Cholesky-VJP
    triangular solves (~2x cheaper backward; the Cholesky chain dominates the
    objective+gradient evaluation). alpha cotangents get the cheap exact rule;
    an L cotangent (rare: only when differentiating *through* the posterior)
    falls back to the exact replayed-Cholesky VJP. Symbolic-zero cotangents
    select the paths at trace time.
    """
    out, _ = _nlml_core_impl(Km, y_eff, noise_eff, max_retries)
    return out


def _nlml_core_fwd(Km, y_eff, noise_eff, max_retries):
    out, linvd = _nlml_core_impl(
        Km.value, y_eff.value, noise_eff.value, max_retries
    )
    _, L, alpha, ok, mult = out
    return out, (
        Km.value, y_eff.value, noise_eff.value, L, alpha, ok, mult, linvd
    )


def _is_symzero(x) -> bool:
    from jax.custom_derivatives import SymbolicZero

    return isinstance(x, SymbolicZero)


def _nlml_core_bwd(max_retries, res, cts):
    Km, y_eff, noise_eff, L, alpha, ok, mult, linvd = res
    d_nlml, d_L, d_alpha, _d_ok, _d_mult = cts
    dtype = L.dtype
    n = L.shape[-1]
    dKm = jnp.zeros_like(Km)
    dy = jnp.zeros_like(y_eff)

    hot = (
        linvd is not None
        and not _is_symzero(d_nlml)
        and _is_symzero(d_alpha)
    )
    if hot:
        # hot path (every objective+grad evaluation): ONE fused kernel
        # produces the full Q-matrix cotangent 1/2 dnlml (Kinv - aa^T) —
        # Linv never touches HBM, and the syrk runs as a single in-VMEM
        # 3-pass MXU contraction (the XLA einsum for it measured ~3 ms)
        from medgp_tpu.ops.pallas_chol import qmat

        dKm = dKm + qmat(
            L, linvd, alpha, (0.5 * d_nlml)[None].astype(dtype)
        )
        dy = dy + d_nlml * alpha
    else:
        if not (_is_symzero(d_nlml) and _is_symzero(d_alpha)):
            if linvd is not None:
                from medgp_tpu.ops.pallas_chol import tri_inv

                Linv = tri_inv(L, linvd)
            else:
                Linv = solve_triangular(
                    L, jnp.eye(n, dtype=dtype), lower=True
                )
            Kinv = Linv.T @ Linv
        if not _is_symzero(d_nlml):
            dKm = dKm + (0.5 * d_nlml) * (Kinv - jnp.outer(alpha, alpha))
            dy = dy + d_nlml * alpha
        if not _is_symzero(d_alpha):
            w = Kinv @ d_alpha
            dy = dy + w
            dKm = dKm - jnp.outer(w, alpha)

    # M = Km + mult*diag(noise): the noise cotangent is the diagonal of dM
    dnoise = mult.astype(dtype) * jnp.diagonal(dKm)

    if not _is_symzero(d_L):
        # exact Cholesky cotangent via a replayed factorization (cold path)
        def refact(Km_, noise_):
            Mj = Km_ + jnp.diag(mult.astype(dtype) * noise_)
            Mj = jnp.where(ok, Mj, jnp.eye(n, dtype=dtype))
            return jnp.linalg.cholesky(Mj)

        _, vjp = jax.vjp(refact, Km, noise_eff)
        dK2, dn2 = vjp(jnp.where(ok, d_L, jnp.zeros_like(d_L)))
        dKm = dKm + dK2
        dnoise = dnoise + dn2

    dKm = jnp.where(ok, dKm, jnp.zeros_like(dKm))
    dy = jnp.where(ok, dy, jnp.zeros_like(dy))
    dnoise = jnp.where(ok, dnoise, jnp.zeros_like(dnoise))
    return dKm, dy, dnoise


_nlml_core.defvjp(_nlml_core_fwd, _nlml_core_bwd, symbolic_zeros=True)


def mask_gram(K: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows/cols of K and put 1 on their diagonal."""
    m2 = mask[..., :, None] * mask[..., None, :]
    return K * m2 + jnp.diag(1.0 - mask)


def masked_nlml(
    K: jnp.ndarray,
    y: jnp.ndarray,
    noise_var: jnp.ndarray,
    mask: jnp.ndarray,
    mean: jnp.ndarray | None = None,
    max_retries: int = 10,
    pre_masked: bool = False,
) -> NLMLResult:
    """NLML of a padded patient.

    K: (n, n) noiseless gram (unmasked unless `pre_masked`); y: (n,)
    observations; noise_var: (n,) per-observation Gaussian noise variance
    sigma^2_{meta_i}; mask: (n,) in {0,1}; mean: optional (n,) prior mean
    (defaults to zero, like the reference's c_meanfunc_zero).
    `pre_masked=True` means K already carries mask_gram semantics (e.g.
    the Pallas gram kernel's fused epilogue) and skips the O(n^2) pass.
    """
    dtype = K.dtype
    mask = mask.astype(dtype)
    y_eff = (y if mean is None else y - mean) * mask
    noise_eff = noise_var * mask
    Km = K if pre_masked else mask_gram(K, mask)
    nlml_raw, L, alpha, ok, mult = _nlml_core(
        Km, y_eff, noise_eff, max_retries
    )
    n_eff = jnp.sum(mask)
    nlml = nlml_raw + 0.5 * n_eff * jnp.log(2.0 * REF_PI)
    # A failed factorization must not poison downstream reductions; report a
    # finite sentinel and ok=False (caller decides; reference returns
    # flag_success=false and skips, main_one_train.cpp:239-258).
    nlml = jnp.where(ok, nlml, jnp.asarray(jnp.inf, dtype))
    return NLMLResult(nlml=nlml, ok=ok, L=L, alpha=alpha, mult=mult)


class Posterior(NamedTuple):
    mean: jnp.ndarray     # (m,) predictive mean
    var: jnp.ndarray      # (m,) predictive variance (incl. observation noise)


def predict(
    L: jnp.ndarray,
    alpha: jnp.ndarray,
    Ks: jnp.ndarray,
    kss_diag: jnp.ndarray,
    noise_var_test: jnp.ndarray,
    train_mask: jnp.ndarray,
    mean_test: jnp.ndarray | None = None,
) -> Posterior:
    """GP posterior at test points from a trained (L, alpha).

    Ks: (n, m) train-test cross gram; kss_diag: (m,) prior variance at test
    points; noise_var_test: (m,) observation-noise variance at test points.

    mean = mean_test + Ks^T alpha;
    var  = kss - ||L^{-1} Ks||_col^2 + noise
    (reference: medgpc/src/core/gp_regression.cpp:128-213 `predict`).
    """
    dtype = L.dtype
    Ks = Ks * train_mask.astype(dtype)[..., :, None]
    mu = Ks.T @ alpha
    if mean_test is not None:
        mu = mu + mean_test
    V = solve_triangular(L, Ks, lower=True)
    var = kss_diag - jnp.sum(V * V, axis=0) + noise_var_test
    return Posterior(mean=mu, var=var)
