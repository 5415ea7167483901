"""Online one-step-ahead imputation testing.

Re-expression of the reference test driver's timestamp loop
(medgpc/src/main_one_test.cpp:269-444): at every unique timestamp, each
observation is predicted from all strictly-earlier observations plus the
*other* observations at the same timestamp (leave-one-out within the
timestamp); optionally, hyperparameters are updated online with momentum SGD
on a 72-hour sliding window.

TPU-first redesign: the reference re-factorizes an O(n^3) Cholesky per
*observation* (gp_regression.cpp:102-126 inside the jj-loop). Here each
unique timestamp factorizes the masked gram over S = past u current ONCE and
reads every leave-one-out prediction from the exact identities

    mean_j = y_j - [K_S^{-1} y]_j / [K_S^{-1}]_jj
    var_j  = 1 / [K_S^{-1}]_jj

which equal the reference's "retrain without j, then predict at j" values
(posterior predictive including observation noise) in exact arithmetic.
diag(K_S^{-1}) comes from the column sums of squares of L^{-1}.

Semantics preserved:
  * 72 h history window when updating (main_one_test.cpp:286-299);
  * update gate: timestamp index > 3 and >= 5 minutes since the last update
    (main_one_test.cpp:309);
  * momentum SGD: delta = m*delta + lr*grad; theta -= delta, skipping clamped
    hypers (main_one_test.cpp:328-338);
  * reset-to-mode (and zero momentum) when the update objective fails
    (main_one_test.cpp:340-347);
  * 95% CI flag |err| <= 1.96*sqrt(var) (main_one_test.cpp:404-409);
  * fallback when there is no training data or the factorization fails:
    predict 0 and gate the CI with 1.96 * exp(mode_theta[meta_j]) — the
    reference's "prior variance" (actually the mode noise *std*,
    main_one_test.cpp:411-439).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import cho_solve, solve_triangular

from medgp_tpu.models.gp import (
    PatientData,
    noise_variance,
    noiseless_gram,
    objective_and_grad,
)
from medgp_tpu.models.params import KernelSpec, LMCSMSpec
from medgp_tpu.models.priors import PriorSpec
from medgp_tpu.ops.nlml import (
    _jittered_chol_solve,
    _pallas_chol_enabled,
    jittered_cholesky,
    mask_gram,
)


class OnlineResult(NamedTuple):
    """Per-observation results aligned with the padded observation axis."""

    pred: jnp.ndarray      # (n,) predictive mean (0.0 fallback)
    error: jnp.ndarray     # (n,) pred - y
    ci: jnp.ndarray        # (n,) int32 {0,1} 95% CI coverage flag
    var: jnp.ndarray       # (n,) predictive variance (mode noise^2 fallback)
    valid: jnp.ndarray     # (n,) bool: this obs produced an output
    theta_final: jnp.ndarray  # (H,) hypers after the last online update


def unique_times(t: np.ndarray, mask: np.ndarray, pad_to: int | None = None):
    """Host-side: sorted unique timestamps of the valid observations, padded.

    Returns (u_times (T_pad,), u_valid (T_pad,)). Mirrors the sort+unique in
    main_one_test.cpp:226-230.
    """
    tv = np.asarray(t)[np.asarray(mask) > 0]
    u = np.unique(tv)
    T = len(u)
    pad_to = pad_to or T
    out = np.zeros(pad_to, np.float32)
    out[:T] = u
    valid = np.zeros(pad_to, bool)
    valid[:T] = True
    return out, valid


def _loo_at_timestamp(
    K: jnp.ndarray,
    noise_var: jnp.ndarray,
    y: jnp.ndarray,
    m_S: jnp.ndarray,
    max_retries: int,
):
    """LOO mean/var for every obs in S from one masked factorization.

    On TPU with supported shapes this runs the fused Pallas factorization
    chain (ops/pallas_chol.py): one kernel yields L, alpha AND the
    diagonal-superblock inverses, and `tri_inv` turns those into L^{-1}
    by pure MXU substitution — replacing the XLA cholesky + cho_solve +
    solve_triangular(L, I) expansions this path used through round 4
    (measured 5.7-5.8 ms per canonical batch each, SCALE.md §4b; the
    test stage was paying them per unique timestamp)."""
    n = K.shape[-1]
    dtype = K.dtype
    m_S = m_S.astype(dtype)
    Km = mask_gram(K, m_S)
    y_eff = y * m_S
    noise_eff = noise_var * m_S
    if _pallas_chol_enabled(n):
        from medgp_tpu.ops.pallas_chol import tri_inv

        L, alpha, linvd, ok, _mult = _jittered_chol_solve(
            Km, y_eff, noise_eff, max_retries
        )
        Linv = tri_inv(L, linvd)
    else:
        chol = jittered_cholesky(Km, noise_eff, max_retries=max_retries)
        L, ok = chol.L, chol.ok
        alpha = cho_solve((L, True), y_eff)
        Linv = solve_triangular(L, jnp.eye(n, dtype=dtype), lower=True)
    diag_inv = jnp.sum(Linv * Linv, axis=0)  # diag(K_S^{-1})
    mean = y - alpha / diag_inv
    var = 1.0 / diag_inv
    return mean, var, ok


def _predict_timestamp(
    spec: KernelSpec,
    K: jnp.ndarray,
    theta: jnp.ndarray,
    data: PatientData,
    mode_noise_std: jnp.ndarray,
    u_t: jnp.ndarray,
    update: bool,
    window: float,
    max_retries: int,
):
    """Predictions for all observations at timestamp u_t; (pred, err, ci,
    var, m_curr) each (n,)."""
    dtype = K.dtype
    is_past = data.mask * (data.t < u_t).astype(dtype)
    if update:
        is_past = is_past * ((u_t - data.t) <= window).astype(dtype)
    m_curr = data.mask * (data.t == u_t).astype(dtype)
    m_S = jnp.maximum(is_past, m_curr)

    nv = noise_variance(spec, theta, data.meta)
    mean, var, ok = _loo_at_timestamp(K, nv, data.y, m_S, max_retries)

    # fallback: factorization failed, or S \ {j} is empty for this obs
    # (single current obs with no usable history)
    use_fallback = (~ok) | ((jnp.sum(m_S) <= 1.0) & (m_curr > 0))

    pred = jnp.where(use_fallback, 0.0, mean)
    err = pred - data.y
    sigma_mode = mode_noise_std[data.meta]
    var_out = jnp.where(
        use_fallback, sigma_mode**2, jnp.maximum(var, 0.0)
    )
    ci_normal = (
        jnp.abs(err) <= 1.96 * jnp.sqrt(jnp.maximum(var, 0.0))
    ).astype(jnp.int32)
    ci_fallback = (jnp.abs(err) <= 1.96 * sigma_mode).astype(jnp.int32)
    ci = jnp.where(use_fallback, ci_fallback, ci_normal)
    return pred, err, ci, var_out, m_curr


def online_impute(
    spec: KernelSpec,
    mode_theta: jnp.ndarray,
    data: PatientData,
    u_times: jnp.ndarray,
    u_valid: jnp.ndarray,
    update: bool = False,
    prior: PriorSpec | None = None,
    learn_rate: float = 1e-5,
    momentum: float = 0.9,
    window: float = 72.0,
    update_min_gap: float = 5.0 / 60.0,
    update_min_index: int = 3,
    max_retries: int = 10,
    map_batch_size: int | None = 8,
) -> OnlineResult:
    """Run the full online-imputation pass for one padded patient.

    `u_times`/`u_valid` from :func:`unique_times`. With `update=False` all
    timestamps are independent and evaluated with a batched `lax.map`; with
    `update=True` a `lax.scan` carries (theta, momentum buffer,
    last_update_time) across timestamps.
    """
    dtype = mode_theta.dtype
    p = spec.unpack(mode_theta)
    mode_noise_std = p["noise_std"]  # exp(mode_theta[lik]) per output

    if not update:
        K = noiseless_gram(spec, mode_theta, data)

        def one(xs):
            u_t, u_ok = xs
            pred, err, ci, var, m_curr = _predict_timestamp(
                spec, K, mode_theta, data, mode_noise_std, u_t,
                update=False, window=window, max_retries=max_retries,
            )
            return pred, err, ci, var, m_curr * u_ok.astype(dtype)

        pred_t, err_t, ci_t, var_t, mcur_t = lax.map(
            one, (u_times, u_valid), batch_size=map_batch_size
        )
        theta_final = mode_theta
    else:
        grad_fn_builder = lambda m_past: objective_and_grad(
            spec,
            PatientData(t=data.t, y=data.y, meta=data.meta, mask=m_past),
            prior=prior,
            max_retries=max_retries,
        )

        def step(carry, xs):
            theta, delta, last_t = carry
            u_t, u_ok, idx = xs

            m_past = data.mask * (data.t < u_t).astype(dtype)
            m_past = m_past * ((u_t - data.t) <= window).astype(dtype)

            do_update = (
                u_ok
                & (idx > update_min_index)
                & ((u_t - last_t) > update_min_gap)
            )

            value, grad, ok = grad_fn_builder(m_past)(theta)
            delta_new = momentum * delta + learn_rate * grad
            theta_upd = theta - delta_new
            # failed objective: reset to mode, zero momentum
            theta_upd = jnp.where(ok, theta_upd, mode_theta)
            delta_new = jnp.where(ok, delta_new, jnp.zeros_like(delta_new))

            theta = jnp.where(do_update, theta_upd, theta)
            delta = jnp.where(do_update, delta_new, delta)
            last_t = jnp.where(do_update, u_t, last_t)

            K = noiseless_gram(spec, theta, data)
            pred, err, ci, var, m_curr = _predict_timestamp(
                spec, K, theta, data, mode_noise_std, u_t,
                update=True, window=window, max_retries=max_retries,
            )
            m_curr = m_curr * u_ok.astype(dtype)
            return (theta, delta, last_t), (pred, err, ci, var, m_curr)

        T = u_times.shape[0]
        init = (
            mode_theta,
            jnp.zeros_like(mode_theta),
            u_times[0],  # last_update_time starts at the first timestamp
        )
        (theta_final, _, _), (pred_t, err_t, ci_t, var_t, mcur_t) = lax.scan(
            step,
            init,
            (u_times, u_valid, jnp.arange(T)),
        )

    # scatter timestamp-grouped outputs back onto the observation axis
    # (each valid obs belongs to exactly one unique timestamp)
    w = mcur_t  # (T, n)
    pred = jnp.sum(pred_t * w, axis=0)
    err = jnp.sum(err_t * w, axis=0)
    ci = jnp.sum(ci_t * w.astype(jnp.int32), axis=0)
    var = jnp.sum(var_t * w, axis=0)
    valid = jnp.sum(w, axis=0) > 0
    return OnlineResult(
        pred=pred, error=err, ci=ci, var=var, valid=valid,
        theta_final=theta_final,
    )
