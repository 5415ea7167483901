"""Model assembly: flat theta -> (MAP) objective, posterior prediction.

This replaces the reference's pointer-wired `GP_Regression` +
`c_objective_one` machinery (medgpc/src/util/c_objective_one.cpp:40-82,
medgpc/src/core/gp_regression.cpp:102-126): an objective here is a pure
function of the flat hyper vector, closed over static-shape (padded) patient
data, differentiable with `jax.grad` and batchable with `vmap` over restarts,
patients and chains.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from medgp_tpu.models.params import KernelSpec, LMCSMSpec, SESpec, SMSpec
from medgp_tpu.models.priors import PriorSpec, log_prior
from medgp_tpu.ops.gram import (
    cross_gram_lmcsm,
    diag_lmcsm,
    gram_lmcsm,
    gram_se,
    gram_sm,
    squared_dist,
    sm_base,
)
from medgp_tpu.ops.nlml import Posterior, masked_nlml, predict


class PatientData(NamedTuple):
    """One padded patient. All arrays have static length n_max."""

    t: jnp.ndarray     # (n,) float timestamps (hours since admission)
    y: jnp.ndarray     # (n,) float z-normalized observations
    meta: jnp.ndarray  # (n,) int32 output index in [0, D); 0 on padding
    mask: jnp.ndarray  # (n,) {0,1} validity

    @property
    def n_obs(self):
        return jnp.sum(self.mask)


def use_pallas_gram() -> bool:
    """Fused Pallas gram on TPU (1.6x the XLA builder at n=1024); override
    with MEDGP_PALLAS_GRAM=0/1."""
    import os

    env = os.environ.get("MEDGP_PALLAS_GRAM")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def noiseless_gram(
    spec: KernelSpec,
    theta: jnp.ndarray,
    data: PatientData,
    masked: bool = False,
):
    """Noiseless gram; with `masked=True` the result is the MASKED gram
    (mask_gram semantics: zero padded rows/cols, unit diagonal there) —
    fused into the Pallas gram kernel's epilogue on the fast path so the
    objective never runs a separate O(n^2) masking pass."""
    if masked and not isinstance(spec, LMCSMSpec):
        from medgp_tpu.ops.nlml import mask_gram

        K = noiseless_gram(spec, theta, data)
        return mask_gram(K, data.mask.astype(K.dtype))
    p = spec.unpack(theta)
    if isinstance(spec, LMCSMSpec):
        if use_pallas_gram():
            from medgp_tpu.ops.pallas_gram import gram_lmcsm_fused

            return gram_lmcsm_fused(
                spec, data.t, data.meta, p["A"], p["mu"], p["v"],
                p["kappa"], mask=data.mask if masked else None,
            )
        K = gram_lmcsm(
            spec, data.t, data.meta, p["A"], p["mu"], p["v"], p["kappa"]
        )
        if masked:
            from medgp_tpu.ops.nlml import mask_gram

            K = mask_gram(K, data.mask.astype(K.dtype))
        return K
    if isinstance(spec, SESpec):
        return gram_se(data.t, p["lengthscale"], p["scale"])
    if isinstance(spec, SMSpec):
        return gram_sm(data.t, p["w"], p["mu"], p["v"])
    raise TypeError(f"unsupported spec {spec!r}")


def noise_variance(spec: KernelSpec, theta: jnp.ndarray, meta: jnp.ndarray):
    """Per-observation Gaussian noise variance sigma^2.

    LMC-SM uses a heteroscedastic per-output noise sigma_{meta_i}^2
    (reference: medgpc/src/likelihoods/c_likelihood_gaussianMO.cpp:43-65);
    SE/SM use a single sigma^2 (c_likelihood_gaussian.cpp).
    """
    p = spec.unpack(theta)
    s = p["noise_std"]
    if isinstance(spec, LMCSMSpec):
        return (s**2)[meta]
    return jnp.broadcast_to(s[0] ** 2, meta.shape)


def nlml_fn(
    spec: KernelSpec,
    data: PatientData,
    prior: Optional[PriorSpec] = None,
    max_retries: int = 10,
):
    """Build `loss(theta) -> (nlml_map, ok)` for one padded patient.

    Follows the reference composition: exact-inference NLML
    (c_inference_exact.cpp:29-152) minus the log-prior of active hypers
    (c_inference_prior.cpp:59-151). Patients with <= 2 observations are
    rejected (c_objective_one.cpp:51).
    """

    def loss(theta):
        K = noiseless_gram(spec, theta, data, masked=True)
        nv = noise_variance(spec, theta, data.meta)
        mean = spec.mean_vector(theta, data.meta)
        res = masked_nlml(
            K, data.y, nv, data.mask, mean=mean, max_retries=max_retries,
            pre_masked=True,
        )
        value = res.nlml
        if prior is not None:
            value = value - log_prior(prior, theta)
        ok = res.ok & (data.n_obs > 2)
        value = jnp.where(ok, value, jnp.asarray(jnp.inf, value.dtype))
        return value, res

    return loss


def objective_and_grad(
    spec: KernelSpec,
    data: PatientData,
    prior: Optional[PriorSpec] = None,
    max_retries: int = 10,
):
    """`f(theta) -> (value, grad, ok)` with clamped hypers' grads zeroed."""
    loss = nlml_fn(spec, data, prior, max_retries)
    grad_mask = None if prior is None else prior.grad_mask()

    def f(theta):
        (value, res), g = jax.value_and_grad(loss, has_aux=True)(theta)
        if grad_mask is not None:
            g = g * grad_mask.astype(g.dtype)
        ok = res.ok & (data.n_obs > 2)
        # A non-finite gradient is a failed evaluation even if the value is
        # finite (the SCG line search treats it as such and halves the step).
        ok = ok & jnp.all(jnp.isfinite(g))
        g = jnp.where(ok, g, jnp.zeros_like(g))
        return value, g, ok

    return f


def posterior_at(
    spec: KernelSpec,
    theta: jnp.ndarray,
    train: PatientData,
    t2: jnp.ndarray,
    meta2: jnp.ndarray,
    max_retries: int = 10,
) -> Posterior:
    """Train on `train` and predict at (t2, meta2); one-shot convenience
    mirroring GP_Regression.train + .predict (gp_regression.cpp:102-213)."""
    p = spec.unpack(theta)
    K = noiseless_gram(spec, theta, train)
    nv = noise_variance(spec, theta, train.meta)
    mean = spec.mean_vector(theta, train.meta)
    res = masked_nlml(
        K, train.y, nv, train.mask, mean=mean, max_retries=max_retries
    )
    if isinstance(spec, LMCSMSpec):
        Ks = cross_gram_lmcsm(
            spec, train.t, train.meta, t2, meta2,
            p["A"], p["mu"], p["v"], p["kappa"],
        )
        kss = diag_lmcsm(spec, meta2, p["A"], p["kappa"])
    elif isinstance(spec, SESpec):
        rsq = squared_dist(train.t / p["lengthscale"], t2 / p["lengthscale"])
        Ks = p["scale"] ** 2 * jnp.exp(-0.5 * rsq)
        kss = jnp.broadcast_to(p["scale"] ** 2, t2.shape)
    elif isinstance(spec, SMSpec):
        rsq = squared_dist(train.t, t2)
        Ks = jnp.zeros_like(rsq)
        for q in range(spec.Q):
            Ks = Ks + p["w"][q] * sm_base(rsq, p["mu"][q], p["v"][q])
        kss = jnp.broadcast_to(jnp.sum(p["w"]), t2.shape)
    else:
        raise TypeError(f"unsupported spec {spec!r}")
    nv2 = noise_variance(spec, theta, meta2)
    mean2 = spec.mean_vector(theta, meta2)
    return predict(
        res.L, res.alpha, Ks, kss, nv2, train.mask, mean_test=mean2
    )


def parsed_posterior_at(
    spec: KernelSpec,
    theta: jnp.ndarray,
    train: PatientData,
    t2: jnp.ndarray,
    meta2: jnp.ndarray,
    max_retries: int = 10,
):
    """Posterior plus the per-source-covariate decomposition of the
    predictive mean: contribution_d[j] = sum_{k: meta_k = d} Ks[k, j] alpha_k.

    The coregionalization debugging view of the reference's
    `GP_Regression::parsed_predict` (gp_regression.cpp:216-320): the total
    predictive mean is the sum over source outputs of their contributions
    (plus the prior mean), exposing which covariates drive each imputation.

    Returns (Posterior, contributions (D, m)).
    """
    if not isinstance(spec, LMCSMSpec):
        raise TypeError("parsed prediction is defined for the LMC-SM kernel")
    p = spec.unpack(theta)
    K = noiseless_gram(spec, theta, train)
    nv = noise_variance(spec, theta, train.meta)
    mean = spec.mean_vector(theta, train.meta)
    res = masked_nlml(
        K, train.y, nv, train.mask, mean=mean, max_retries=max_retries
    )
    Ks = cross_gram_lmcsm(
        spec, train.t, train.meta, t2, meta2,
        p["A"], p["mu"], p["v"], p["kappa"],
    )
    kss = diag_lmcsm(spec, meta2, p["A"], p["kappa"])
    nv2 = noise_variance(spec, theta, meta2)
    mean2 = spec.mean_vector(theta, meta2)
    post = predict(
        res.L, res.alpha, Ks, kss, nv2, train.mask, mean_test=mean2
    )
    onehot = jax.nn.one_hot(train.meta, spec.D, dtype=Ks.dtype)  # (n, D)
    weighted = Ks * (res.alpha * train.mask.astype(Ks.dtype))[:, None]
    contributions = jnp.einsum("nd,nm->dm", onehot, weighted)
    return post, contributions
