"""Hyperparameter layout: flat optimizer vector <-> natural parameters.

The flat parameter vector follows the reference packing order
``[lik | cov | mean]`` (reference: medgpc/src/core/c_hyperparam.cpp,
``get_hyp_all``/``set_hyp_all``), with the LMC-SM covariance block laid out as

    cov = [ A (Q*D*R, raw)      # index q*D*R + d*R + r
          | log mu (Q)          # spectral frequencies
          | log v  (Q)          # spectral bandwidths (v, not v^2)
          | log kappa (Q*D) ]   # coregional diagonal, index q*D + d

(reference: medgpc/src/kernel/c_kernel_LMC_SM.cpp:51-70 applies exp() to every
covariance hyper *except* the first Q*D*R A-elements; c_experiment.cpp:311-393
defines the counts: lik = D per-output log-noise for LMC-SM, cov =
Q*(D*R + 2 + D), mean = 0 for the zero mean function).

Everything here is a pure function of a flat `theta` vector so it can be
transparently `vmap`-ed over restarts / patients / chains and differentiated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

# The reference's low-precision PI is load-bearing for numerical parity
# (reference: medgpc/src/util/global_settings.h:6).
REF_PI = 3.14159265


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Base class for kernel specifications (static, hashable, jit-friendly).

    `mean_kind` selects the prior mean function: "zero" (the only one the
    reference mains instantiate), "const" (one shared constant,
    medgpc/src/mean/c_meanfunc_const.cpp) or "const_mo" (one constant per
    output, c_meanfunc_constMO.cpp). Mean hypers sit at the tail of the flat
    theta ([lik | cov | mean], c_hyperparam.cpp) and are NOT exp-transformed
    (c_meanfunc.cpp `set_meanfunc_hyp` is the identity).
    """

    @property
    def n_lik(self) -> int:
        raise NotImplementedError

    @property
    def n_cov(self) -> int:
        raise NotImplementedError

    @property
    def n_outputs(self) -> int:
        return 1

    @property
    def n_mean(self) -> int:
        kind = getattr(self, "mean_kind", "zero")
        if kind == "zero":
            return 0
        if kind == "const":
            return 1
        if kind == "const_mo":
            return self.n_outputs
        raise ValueError(f"unknown mean_kind {kind!r}")

    def mean_vector(self, theta: jnp.ndarray, meta: jnp.ndarray):
        """Prior mean at each observation, or None for the zero mean."""
        kind = getattr(self, "mean_kind", "zero")
        if kind == "zero":
            return None
        _, _, mean = self.split(theta)
        if kind == "const":
            return jnp.broadcast_to(mean[..., 0], meta.shape)
        return jnp.take(mean, meta, axis=-1)

    @property
    def n_hyp(self) -> int:
        return self.n_lik + self.n_cov + self.n_mean

    def split(self, theta: jnp.ndarray):
        """Split flat theta into (lik, cov, mean) raw blocks."""
        lik = theta[..., : self.n_lik]
        cov = theta[..., self.n_lik : self.n_lik + self.n_cov]
        mean = theta[..., self.n_lik + self.n_cov :]
        return lik, cov, mean

    def unpack(self, theta: jnp.ndarray) -> Dict[str, Any]:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class LMCSMSpec(KernelSpec):
    """Spectral-mixture linear-model-of-coregionalization kernel (flagship).

    Q: number of mixture components, D: number of outputs (features),
    R: rank of each coregional factor A_q (D x R).
    """

    Q: int
    D: int
    R: int
    mean_kind: str = "zero"

    @property
    def n_outputs(self) -> int:
        return self.D

    @property
    def n_lik(self) -> int:
        return self.D

    @property
    def n_cov(self) -> int:
        return self.Q * (self.D * self.R + 2 + self.D)

    def unpack(self, theta: jnp.ndarray) -> Dict[str, Any]:
        """Flat theta -> natural parameters (exp-transformed where the
        reference exp-transforms on `set_kernel_hyp` / `set_likfunc_hyp`)."""
        Q, D, R = self.Q, self.D, self.R
        lik, cov, _ = self.split(theta)
        a = cov[..., : Q * D * R].reshape(*cov.shape[:-1], Q, D, R)
        mu = jnp.exp(cov[..., Q * D * R : Q * D * R + Q])
        v = jnp.exp(cov[..., Q * D * R + Q : Q * D * R + 2 * Q])
        kappa = jnp.exp(
            cov[..., Q * (D * R + 2) : Q * (D * R + 2 + D)]
        ).reshape(*cov.shape[:-1], Q, D)
        noise_std = jnp.exp(lik)  # per-output sigma_d
        return dict(A=a, mu=mu, v=v, kappa=kappa, noise_std=noise_std)

    def coregional_B(self, A: jnp.ndarray, kappa: jnp.ndarray) -> jnp.ndarray:
        """B_q = A_q A_q^T + diag(kappa_q), shape (..., Q, D, D).

        (reference: c_kernel_LMC_SM.cpp:72-115 `compute_coregional_matrix`)
        """
        B = jnp.einsum("...qdr,...qer->...qde", A, A)
        return B + kappa[..., :, :, None] * jnp.eye(self.D, dtype=A.dtype)


@dataclasses.dataclass(frozen=True)
class SESpec(KernelSpec):
    """1-D squared exponential: hyp = [log noise | log lengthscale, log scale]."""

    mean_kind: str = "zero"

    @property
    def n_lik(self) -> int:
        return 1

    @property
    def n_cov(self) -> int:
        return 2

    def unpack(self, theta: jnp.ndarray) -> Dict[str, Any]:
        lik, cov, _ = self.split(theta)
        return dict(
            noise_std=jnp.exp(lik),
            lengthscale=jnp.exp(cov[..., 0]),
            scale=jnp.exp(cov[..., 1]),
        )


@dataclasses.dataclass(frozen=True)
class SMSpec(KernelSpec):
    """1-D spectral mixture: cov = [log w (Q) | log mu (Q) | log v (Q)]."""

    Q: int
    mean_kind: str = "zero"

    @property
    def n_lik(self) -> int:
        return 1

    @property
    def n_cov(self) -> int:
        return 3 * self.Q

    def unpack(self, theta: jnp.ndarray) -> Dict[str, Any]:
        Q = self.Q
        lik, cov, _ = self.split(theta)
        return dict(
            noise_std=jnp.exp(lik),
            w=jnp.exp(cov[..., :Q]),
            mu=jnp.exp(cov[..., Q : 2 * Q]),
            v=jnp.exp(cov[..., 2 * Q : 3 * Q]),
        )


def cov_slices(spec: LMCSMSpec):
    """Index helpers for the LMC-SM covariance block inside the flat vector.

    Returns a dict of `slice` objects addressing the *flat theta* (including
    the lik offset), useful for prior masks and varEM clamping.
    """
    Q, D, R = spec.Q, spec.D, spec.R
    off = spec.n_lik
    return dict(
        lik=slice(0, off),
        a=slice(off, off + Q * D * R),
        mu=slice(off + Q * D * R, off + Q * D * R + Q),
        v=slice(off + Q * D * R + Q, off + Q * (D * R + 2)),
        kappa=slice(off + Q * (D * R + 2), off + Q * (D * R + 2 + D)),
    )
