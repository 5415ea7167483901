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


def _e_step(X, p: GMMParams, reg):
    logp = _log_gaussian(X, p.means, p.covs, reg) + jnp.log(p.weights)[None, :]
    lognorm = jax.scipy.special.logsumexp(logp, axis=1, keepdims=True)
    resp = jnp.exp(logp - lognorm)
    return resp, jnp.mean(lognorm)


def _m_step(X, resp, reg):
    nk = resp.sum(axis=0) + 1e-10  # (k,)
    weights = nk / X.shape[0]
    means = (resp.T @ X) / nk[:, None]
    diff = X[:, None, :] - means[None, :, :]
    covs = jnp.einsum("nk,nkd,nke->kde", resp, diff, diff) / nk[:, None, None]
    d = X.shape[1]
    covs = covs + reg * jnp.eye(d)
    return GMMParams(weights=weights, means=means, covs=covs)


def _kmeans_pp_init(key, X, k):
    n = X.shape[0]
    k1, k2 = jax.random.split(key)
    first = jax.random.randint(k1, (), 0, n)
    centers0 = jnp.tile(X[first], (k, 1))

    def add_center(carry, i):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, -1), axis=1
        )
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
        onehot = jax.nn.one_hot(assign, k)
        nk = onehot.sum(0) + 1e-10
        centers = (onehot.T @ X) / nk[:, None]
        return centers, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=10)
    return centers


def _fit_single(key, X, k, max_iter, tol, reg):
    n, d = X.shape
    centers = _kmeans_pp_init(key, X, k)
    d2 = jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, -1)
    resp0 = jax.nn.one_hot(jnp.argmin(d2, axis=1), k)
    p0 = _m_step(X, resp0, reg)

    def cond(st):
        p, ll, prev_ll, it = st
        return (it < max_iter) & (jnp.abs(ll - prev_ll) > tol)

    def body(st):
        p, ll, prev_ll, it = st
        resp, new_ll = _e_step(X, p, reg)
        p = _m_step(X, resp, reg)
        return (p, new_ll, ll, it + 1)

    init = (p0, jnp.asarray(jnp.inf, X.dtype), jnp.asarray(-jnp.inf, X.dtype),
            jnp.asarray(0, jnp.int32))
    # masked while: under vmap over n_init a converged member must freeze,
    # not keep running EM until the whole batch converges (same hazard the
    # SCG line search documents in infer/scg.py:_masked_while)
    from medgp_tpu.infer.scg import _masked_while

    p, ll, _, n_it = _masked_while(cond, body, init)
    _, final_ll = _e_step(X, p, reg)
    return p, final_ll


def fit_gmm(
    key,
    X: jnp.ndarray,
    k: int,
    n_init: int = 10,
    max_iter: int = 2000,
    tol: float = 1e-3,
    reg: float = 1e-6,
):
    """Best-of-n_init EM fit for a fixed component count k."""
    keys = jax.random.split(key, n_init)
    params, lls = jax.vmap(
        lambda kk: _fit_single(kk, X, k, max_iter, tol, reg)
    )(keys)
    best = jnp.argmax(lls)
    p = jax.tree.map(lambda a: a[best], params)
    return p, lls[best]


def bic(X, p: GMMParams, mean_ll) -> jnp.ndarray:
    n, d = X.shape
    k = p.weights.shape[0]
    n_params = k * d + k * d * (d + 1) // 2 + (k - 1)
    return -2.0 * mean_ll * n + n_params * jnp.log(jnp.asarray(float(n)))


def predict(X, p: GMMParams, reg=1e-6):
    resp, _ = _e_step(X, p, reg)
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

    Xj = jnp.asarray(X, jnp.float32)
    key = jax.random.key(seed)
    lowest, best_k, best_assign = np.inf, None, None
    for k in range(1, max_cluster_num + 1):
        key, sub = jax.random.split(key)
        # cap EM iterations: full-cov EM on small n converges quickly; 2000
        # sklearn-style iterations are a safety net, not a requirement
        p, mean_ll = fit_gmm(
            sub, Xj, k, n_init=init_num, max_iter=max_iter_num, tol=1e-3
        )
        b = float(bic(Xj, p, mean_ll))
        if b < lowest:
            lowest, best_k = b, k
            best_assign = np.asarray(predict(Xj, p))
    return best_k, best_assign


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
