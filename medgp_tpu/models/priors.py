"""Per-hyperparameter prior registry and the hierarchical-gamma setup.

A `PriorSpec` is a struct-of-arrays over the flat hyper vector (length H):
every hyper has an active flag, an exp-transform flag, a type code and two
parameters. Type codes follow the reference
(medgpc/src/prior/c_prior.h:50-53):

    -1 = none, 0 = clamped, 1 = normal(loc, VARIANCE), 2 = laplace(loc, b)

Log-densities (reference: c_prior.cpp:383-421):
    normal : lp = -(x-m)^2 / (2*var) - log(2*pi*var)/2
    laplace: lp = -|x-m|/b - log(2*b)

The MAP objective subtracts sum(lp) of active, non-clamped hypers evaluated at
the *transformed* value (exp(theta) when the exp flag is set); with autodiff
the chain-rule factor `* h` that the reference applies by hand
(c_inference_prior.cpp:59-151) falls out automatically.

The hierarchical-gamma sparsity prior for the LMC-SM kernel
(c_prior.cpp:222-279 `setup_hier_gamma_prior`):
  * A-elements: active, raw, Normal(0, psi_qdr) with psi re-linked by varEM;
  * mu, v: unregularized (exp-transformed);
  * kappa: active, exp-transformed, Laplace(0, beta_lam);
  * likelihood noise: unregularized.

Clamping (type 0) zeroes the gradient of that hyper; the varEM E-step sets
`a := 0` and clamps it permanently when psi underflows to 0
(c_optimizer_varEM.cpp:151-155).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from medgp_tpu.models.params import REF_PI, LMCSMSpec, cov_slices

PRIOR_NONE = -1
PRIOR_CLAMP = 0
PRIOR_NORMAL = 1
PRIOR_LAPLACE = 2
PRIOR_KDE = 3


class PriorSpec(NamedTuple):
    active: jnp.ndarray      # (H,) bool
    exp_tf: jnp.ndarray      # (H,) bool: hyper is exp-transformed
    ptype: jnp.ndarray       # (H,) int32 type code
    loc: jnp.ndarray         # (H,) float
    scale: jnp.ndarray       # (H,) float: variance (normal), b (laplace),
    #                             or bandwidth (KDE)
    kde_samples: jnp.ndarray | None = None  # (H, S) padded KDE samples
    kde_mask: jnp.ndarray | None = None     # (H, S) sample validity

    @property
    def n_hyp(self) -> int:
        return self.active.shape[-1]

    def grad_mask(self) -> jnp.ndarray:
        """1.0 where the hyper may move, 0.0 where clamped.

        (reference: c_inference_prior.cpp:75-77,101-104 force dnlml := 0)
        """
        clamped = self.active & (self.ptype == PRIOR_CLAMP)
        return 1.0 - clamped.astype(jnp.float32)


def empty_prior(n_hyp: int, dtype=jnp.float32) -> PriorSpec:
    """All hypers unregularized (prior mode 0)."""
    return PriorSpec(
        active=jnp.zeros((n_hyp,), bool),
        exp_tf=jnp.zeros((n_hyp,), bool),
        ptype=jnp.full((n_hyp,), PRIOR_NONE, jnp.int32),
        loc=jnp.zeros((n_hyp,), dtype),
        scale=jnp.ones((n_hyp,), dtype),
    )


def hier_gamma_prior(
    spec: LMCSMSpec, beta_lam: float = 0.5, dtype=jnp.float32
) -> PriorSpec:
    """Initial prior state for the hierarchical-gamma sparse LMC-SM setup.

    `beta_lam` is the Laplace scale on kappa (prior_hyp[1], default 0.5 as in
    c_prior.cpp:264-272). The Normal variance on A starts at psi=1.0
    (init_cov_varEM(_, 1.0), c_prior.cpp:234).
    """
    H = spec.n_hyp
    sl = cov_slices(spec)
    active = np.zeros(H, bool)
    exp_tf = np.zeros(H, bool)
    ptype = np.full(H, PRIOR_NONE, np.int32)
    loc = np.zeros(H)
    scale = np.ones(H)

    active[sl["a"]] = True
    ptype[sl["a"]] = PRIOR_NORMAL
    scale[sl["a"]] = 1.0  # psi, re-linked by varEM

    exp_tf[sl["mu"]] = True
    exp_tf[sl["v"]] = True

    active[sl["kappa"]] = True
    exp_tf[sl["kappa"]] = True
    ptype[sl["kappa"]] = PRIOR_LAPLACE
    scale[sl["kappa"]] = beta_lam

    return PriorSpec(
        active=jnp.asarray(active),
        exp_tf=jnp.asarray(exp_tf),
        ptype=jnp.asarray(ptype),
        loc=jnp.asarray(loc, dtype),
        scale=jnp.asarray(scale, dtype),
    )


def log_prior(prior: PriorSpec, theta: jnp.ndarray) -> jnp.ndarray:
    """Sum of log prior densities over active, non-clamped hypers.

    Evaluated at the transformed hyper value; NaN-safe for inactive entries
    (the unselected `where` branches are computed with sanitized parameters so
    reverse-mode autodiff never sees a division by zero).
    """
    h = jnp.where(prior.exp_tf, jnp.exp(theta), theta)
    use_normal = prior.ptype == PRIOR_NORMAL
    use_laplace = prior.ptype == PRIOR_LAPLACE

    var_safe = jnp.where(use_normal, jnp.maximum(prior.scale, 1e-300), 1.0)
    b_safe = jnp.where(use_laplace, jnp.maximum(prior.scale, 1e-300), 1.0)
    diff = h - prior.loc

    lp_normal = -(diff * diff) / (2.0 * var_safe) - 0.5 * jnp.log(
        2.0 * REF_PI * var_safe
    )
    lp_laplace = -jnp.abs(diff) / b_safe - jnp.log(2.0 * b_safe)

    lp = jnp.where(use_normal, lp_normal, 0.0) + jnp.where(
        use_laplace, lp_laplace, 0.0
    )

    if prior.kde_samples is not None:
        # Gaussian KDE log density (c_prior.cpp:165-194 `prior_lik_kde`):
        # p(x) = sum_s N((x - x_s)/bw) / (n * bw)
        use_kde = prior.ptype == PRIOR_KDE
        bw = jnp.where(use_kde, jnp.maximum(prior.scale, 1e-30), 1.0)
        z = (h[..., None] - prior.kde_samples) / bw[..., None]
        m = prior.kde_mask.astype(z.dtype)
        dens = jnp.sum(
            jnp.exp(-0.5 * z * z) / jnp.sqrt(2.0 * REF_PI) * m, axis=-1
        )
        n_s = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        # sanitize the unselected branch BEFORE the log: non-KDE rows have
        # dens == 0 and log(0) = -inf would poison the `where` gradient
        # (0 * inf = NaN); the clamp must also survive float32.
        dens = jnp.where(use_kde, jnp.maximum(dens, 1e-30), 1.0)
        lp_kde = jnp.log(dens / (n_s * bw))
        lp = lp + jnp.where(use_kde, lp_kde, 0.0)

    sel = prior.active & (prior.ptype > PRIOR_CLAMP)
    return jnp.sum(jnp.where(sel, lp, 0.0))


def set_kde_prior(
    prior: PriorSpec,
    index: int,
    samples: jnp.ndarray,
    bandwidth: float,
    max_samples: int | None = None,
) -> PriorSpec:
    """Attach a KDE prior (type 3) to one hyper; samples are padded into the
    (H, S) buffer shared by all KDE-prior hypers."""
    samples = jnp.asarray(samples, prior.loc.dtype).reshape(-1)
    S = max_samples or samples.shape[0]
    H = prior.n_hyp
    if prior.kde_samples is None or prior.kde_samples.shape[-1] < S:
        old_s = 0 if prior.kde_samples is None else prior.kde_samples.shape[-1]
        new_samples = jnp.zeros((H, S), prior.loc.dtype)
        new_mask = jnp.zeros((H, S), bool)
        if old_s:
            new_samples = new_samples.at[:, :old_s].set(prior.kde_samples)
            new_mask = new_mask.at[:, :old_s].set(prior.kde_mask)
        prior = prior._replace(kde_samples=new_samples, kde_mask=new_mask)
    k = samples.shape[0]
    return prior._replace(
        active=prior.active.at[index].set(True),
        ptype=prior.ptype.at[index].set(PRIOR_KDE),
        scale=prior.scale.at[index].set(bandwidth),
        kde_samples=prior.kde_samples.at[index, :k].set(samples),
        kde_mask=prior.kde_mask.at[index, :k].set(True),
    )


def clamp_a_elements(
    prior: PriorSpec, spec: LMCSMSpec, a_clamp_flat: jnp.ndarray
) -> PriorSpec:
    """Clamp the A-elements indicated by `a_clamp_flat` (Q*D*R bool).

    Used by varEM when psi -> 0 (c_optimizer_varEM.cpp:151-155) and by the
    test path to freeze A-elements that are exactly 0 in the population mode
    kernel (c_prior.cpp:118-140 `init_test_prior`).
    """
    sl = cov_slices(spec)
    idx = jnp.arange(prior.n_hyp)
    in_a = (idx >= sl["a"].start) & (idx < sl["a"].stop)
    pad = jnp.zeros(prior.n_hyp, bool)
    clamp_full = pad.at[sl["a"].start : sl["a"].stop].set(a_clamp_flat)
    new_type = jnp.where(clamp_full & in_a, PRIOR_CLAMP, prior.ptype)
    new_active = prior.active | clamp_full
    return prior._replace(active=new_active, ptype=new_type)


def set_a_variance(
    prior: PriorSpec, spec: LMCSMSpec, psi_flat: jnp.ndarray
) -> PriorSpec:
    """Re-link the Normal variance on A-elements to the varEM psi
    (c_optimizer_varEM.cpp:157-158)."""
    sl = cov_slices(spec)
    new_scale = prior.scale.at[sl["a"].start : sl["a"].stop].set(
        psi_flat.astype(prior.scale.dtype)
    )
    new_loc = prior.loc.at[sl["a"].start : sl["a"].stop].set(0.0)
    return prior._replace(scale=new_scale, loc=new_loc)
