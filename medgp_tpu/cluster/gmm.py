"""Full-covariance Gaussian mixture EM with BIC model selection, in JAX.

TPU-native replacement for the reference's sklearn GaussianMixture usage
(medgpc/clustering/cluster.py:23-46 `run_sklearn_gmm`): BIC-scored model
selection over 1..max_cluster_num components, full covariances, multiple
random initializations (the reference uses n_init=10 via the caller default,
cluster.py:5,16), max_iter=2000, and hard assignment by posterior argmax.

Implementation notes:
  * kmeans++ seeding + Lloyd iterations per init, then EM; all inits run as
    one vmapped batch per component count.
  * EM convergence follows sklearn: stop when the change in mean
    log-likelihood per sample < tol (1e-3); reg_covar=1e-6 on covariance
    diagonals.
  * BIC = -2 * total_loglik + n_params * log(n), with
    n_params = k*d + k*d*(d+1)/2 + (k-1)  (sklearn's `_n_parameters`).
  * `algorithm="sklearn"` delegates to sklearn for bit-level parity runs.

The population-clustering stage is the reference's only cross-patient
aggregation point; in the sharded pipeline its inputs (per-patient hyper
vectors) arrive via an all_gather instead of the filesystem.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GMMParams(NamedTuple):
    weights: jnp.ndarray  # (k,)
    means: jnp.ndarray    # (k, d)
    covs: jnp.ndarray     # (k, d, d)


def _log_gaussian(X, means, covs, reg=1e-6):
    """(n, k) log N(x | mu_k, Sigma_k) via Cholesky."""
    k, d = means.shape
    covs = covs + reg * jnp.eye(d)
    L = jnp.linalg.cholesky(covs)  # (k, d, d)
    diff = X[:, None, :] - means[None, :, :]  # (n, k, d)
    diff_k = jnp.moveaxis(diff, 1, 0).swapaxes(-1, -2)  # (k, d, n)
    sol = jax.vmap(
        lambda Lk, dk: jax.scipy.linalg.solve_triangular(Lk, dk, lower=True)
    )(L, diff_k)  # (k, d, n)
    maha = jnp.einsum("kdn,kdn->nk", sol, sol)
    logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return -0.5 * (d * jnp.log(2 * jnp.pi) + maha) - logdet[None, :]


def _e_step(X, w, p: GMMParams, reg):
    """Weighted E-step: padded rows (w=0) contribute nothing to the
    responsibilities or the (weighted-mean) log-likelihood."""
    logp = _log_gaussian(X, p.means, p.covs, reg) + jnp.log(p.weights)[None, :]
    lognorm = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
    resp = jnp.exp(logp - lognorm) * w[:, None]
    mean_ll = jnp.sum(lognorm[:, 0] * w) / jnp.sum(w)
    return resp, mean_ll


def _m_step(X, w, resp, reg):
    """resp is already row-weighted (see _e_step)."""
    nk = resp.sum(axis=0) + 1e-10  # (k,)
    weights = nk / jnp.sum(w)
    means = (resp.T @ X) / nk[:, None]
    diff = X[:, None, :] - means[None, :, :]
    covs = jnp.einsum("nk,nkd,nke->kde", resp, diff, diff) / nk[:, None, None]
    d = X.shape[1]
    covs = covs + reg * jnp.eye(d)
    return GMMParams(weights=weights, means=means, covs=covs)


def _kmeans_pp_init(key, X, w, k):
    n = X.shape[0]
    k1, k2 = jax.random.split(key)
    pw = w / jnp.sum(w)
    first = jax.random.choice(k1, n, p=pw)
    centers0 = jnp.tile(X[first], (k, 1))

    def add_center(carry, i):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, -1), axis=1
        )
        d2 = d2 * w  # padded rows never become centers
        key, sub = jax.random.split(key)
        probs = d2 / (d2.sum() + 1e-30)
        idx = jax.random.choice(sub, n, p=probs)
        centers = centers.at[i].set(X[idx])
        return (centers, key), None

    (centers, _), _ = jax.lax.scan(
        add_center, (centers0, k2), jnp.arange(1, k)
    )

    def lloyd(centers, _):
        d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, -1)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k) * w[:, None]
        nk = onehot.sum(0) + 1e-10
        centers = (onehot.T @ X) / nk[:, None]
        return centers, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=10)
    return centers


def _fit_single(key, X, w, k, max_iter, tol, reg):
    n, d = X.shape
    centers = _kmeans_pp_init(key, X, w, k)
    d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, -1)
    resp0 = jax.nn.one_hot(jnp.argmin(d2, axis=1), k) * w[:, None]
    p0 = _m_step(X, w, resp0, reg)

    def cond(st):
        p, ll, prev_ll, it = st
        return (it < max_iter) & (jnp.abs(ll - prev_ll) > tol)

    def body(st):
        p, ll, prev_ll, it = st
        resp, new_ll = _e_step(X, w, p, reg)
        p = _m_step(X, w, resp, reg)
        return (p, new_ll, ll, it + 1)

    init = (p0, jnp.asarray(jnp.inf, X.dtype), jnp.asarray(-jnp.inf, X.dtype),
            jnp.asarray(0, jnp.int32))
    # masked while: under vmap over n_init a converged member must freeze,
    # not keep running EM until the whole batch converges (same hazard the
    # SCG line search documents in infer/scg.py:_masked_while)
    from medgp_tpu.infer.scg import _masked_while

    p, ll, _, n_it = _masked_while(cond, body, init)
    _, final_ll = _e_step(X, w, p, reg)
    return p, final_ll


def fit_gmm(
    key,
    X: jnp.ndarray,
    k: int,
    n_init: int = 10,
    max_iter: int = 2000,
    tol: float = 1e-3,
    reg: float = 1e-6,
    w: jnp.ndarray | None = None,
):
    """Best-of-n_init EM fit for a fixed component count k.

    `w` (n,) are 0/1 sample weights: rows with w=0 are PADDING, invisible
    to seeding, EM, and the likelihood. Padding every fold's sample count
    to a power of two keeps ONE compiled program per k across the 11
    per-fold refits (the round-4 kernclust stage spent most of its 576 s
    recompiling this function for 11 distinct row counts)."""
    if w is None:
        w = jnp.ones(X.shape[0], X.dtype)
    keys = jax.random.split(key, n_init)
    params, lls = jax.vmap(
        lambda kk: _fit_single(kk, X, w, k, max_iter, tol, reg)
    )(keys)
    best = jnp.argmax(lls)
    p = jax.tree.map(lambda a: a[best], params)
    return p, lls[best]


def bic(X, p: GMMParams, mean_ll, n_eff=None) -> jnp.ndarray:
    n = float(X.shape[0]) if n_eff is None else n_eff
    d = X.shape[1]
    k = p.weights.shape[0]
    n_params = k * d + k * d * (d + 1) // 2 + (k - 1)
    return -2.0 * mean_ll * n + n_params * jnp.log(jnp.asarray(float(n)))


def predict(X, p: GMMParams, reg=1e-6):
    w = jnp.ones(X.shape[0], X.dtype)
    resp, _ = _e_step(X, w, p, reg)
    return jnp.argmax(resp, axis=1)


def run_gmm_bic(
    feature: np.ndarray,
    max_cluster_num: int,
    init_num: int = 10,
    max_iter_num: int = 2000,
    seed: int = 0,
    algorithm: str = "gmm",
):
    """BIC model selection over 1..max_cluster_num.

    Returns (best_k, assignments (n,) int). `algorithm="sklearn"` uses
    sklearn.mixture.GaussianMixture for exact reference parity;
    `algorithm="gmm"` (default) is the JAX implementation.
    """
    X = np.asarray(feature, np.float64)
    if X.ndim == 1:
        X = X[:, None]
    if algorithm == "sklearn":
        from sklearn import mixture

        lowest, best_k, best_assign = np.inf, None, None
        for k in range(1, max_cluster_num + 1):
            g = mixture.GaussianMixture(
                n_components=k, covariance_type="full",
                max_iter=max_iter_num, n_init=init_num,
            )
            g.fit(X)
            b = g.bic(X)
            if b < lowest:
                lowest, best_k, best_assign = b, k, g.predict(X)
        return best_k, np.asarray(best_assign)

    n = X.shape[0]
    # pad the sample count to a power of two: one compiled EM program per
    # k serves every fold's slightly-different cohort size
    n_pad = 1
    while n_pad < n:
        n_pad *= 2
    Xp = np.zeros((n_pad, X.shape[1]), np.float32)
    Xp[:n] = X
    wp = np.zeros(n_pad, np.float32)
    wp[:n] = 1.0
    Xj = jnp.asarray(Xp)
    wj = jnp.asarray(wp)
    key = jax.random.key(seed)
    lowest, best_k, best_assign = np.inf, None, None
    for k in range(1, max_cluster_num + 1):
        key, sub = jax.random.split(key)
        # cap EM iterations: full-cov EM on small n converges quickly; 2000
        # sklearn-style iterations are a safety net, not a requirement
        p, mean_ll = _fit_gmm_jit(
            sub, Xj, wj, k, init_num, max_iter_num
        )
        b = float(bic(Xj, p, mean_ll, n_eff=float(n)))
        if b < lowest:
            lowest, best_k = b, k
            best_assign = np.asarray(predict(Xj, p))[:n]
    return best_k, best_assign


@partial(jax.jit, static_argnums=(3, 4, 5))
def _fit_gmm_jit(key, X, w, k, n_init, max_iter):
    return fit_gmm(key, X, k, n_init=n_init, max_iter=max_iter, tol=1e-3, w=w)


def run_clustering_top(algorithm, feature, max_cluster_num=None, init_num=10,
                       max_iter_num=2000, seed=0):
    """Dispatch mirroring the reference (cluster.py:5-20): algorithm None
    means a single cluster containing every component."""
    if max_cluster_num is None:
        max_cluster_num = 5
    algorithm = str(algorithm)
    feature = np.asarray(feature)
    if algorithm == "None":
        return 1, np.zeros(feature.shape[0], int)
    if algorithm in ("gmm", "sklearn"):
        return run_gmm_bic(
            feature, max_cluster_num, init_num, max_iter_num, seed,
            algorithm=algorithm,
        )
    raise NotImplementedError(f"unsupported clustering algorithm {algorithm}")
