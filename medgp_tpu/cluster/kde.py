"""Gaussian kernel density estimation with Silverman bandwidth + mode rules.

Replaces the reference's statsmodels KDEUnivariate usage
(medgpc/clustering/mode_estimate.py:438-450):

    kde.fit(kernel="gau", bw="silverman"); dens = kde.evaluate(x)

Silverman bandwidth (statsmodels `bw_silverman`):
    sigma = min(std(x, ddof=1), IQR/1.349) with the IQR term dropped when 0
    bw    = 0.9 * sigma * n^(-1/5)

Two mode definitions, used per kernel family (mode_estimate.py:446-450):
    weighted   : density-weighted mean  sum(x * d) / sum(d)   (LMC-SM)
    unweighted : argmax of the density on the evaluation grid (SE / SM)

Implemented as vectorizable numpy/JAX-compatible functions; clustering runs
host-side on tiny arrays (one scalar per trained patient/component), so numpy
is the right tool — the heavy stages stay on device.
"""

from __future__ import annotations

import numpy as np


def silverman_bandwidth(x: np.ndarray) -> float:
    x = np.asarray(x, np.float64).ravel()
    n = len(x)
    if n < 2:
        return 1.0
    std = np.std(x, ddof=1)
    q75, q25 = np.percentile(x, [75, 25])
    iqr = (q75 - q25) / 1.349
    sigma = min(std, iqr) if iqr > 0 else std
    if sigma <= 0:
        sigma = max(abs(x[0]), 1.0) * 1e-6  # degenerate sample guard
    return 0.9 * sigma * n ** (-0.2)


def gaussian_kde(x: np.ndarray, eval_points: np.ndarray) -> np.ndarray:
    """Density of the Silverman-bandwidth Gaussian KDE at `eval_points`."""
    x = np.asarray(x, np.float64).ravel()
    pts = np.asarray(eval_points, np.float64).ravel()
    bw = silverman_bandwidth(x)
    z = (pts[:, None] - x[None, :]) / bw
    dens = np.exp(-0.5 * z * z).sum(axis=1) / (len(x) * bw * np.sqrt(2 * np.pi))
    return dens


def kde_mode(x: np.ndarray, weighted: bool, eval_points=None) -> float:
    """Mode of the KDE fitted to x, evaluated at `eval_points` (defaults to
    the sample itself, like the reference's `compute_kde(data, data)`)."""
    x = np.asarray(x, np.float64).ravel()
    if len(x) == 1:
        return float(x[0])
    pts = x if eval_points is None else np.asarray(eval_points, np.float64)
    dens = gaussian_kde(x, pts)
    if weighted:
        s = np.nansum(dens)
        if s <= 0:
            return float(np.mean(pts))
        return float(np.nansum(pts * dens) / s)
    return float(pts[int(np.argmax(dens))])


def kde_log_density_and_grad(x: float, bw: float, samples: np.ndarray):
    """log p(x) and d log p / dx of a Gaussian KDE — the reference's type-3
    prior density (c_prior.cpp:165-194 `prior_lik_kde`)."""
    samples = np.asarray(samples, np.float64).ravel()
    n = len(samples)
    z = (x - samples) / bw
    ds = np.exp(-0.5 * z * z) / np.sqrt(2 * np.pi)
    lp = ds.sum() / (n * bw)
    dlp = -((x - samples) * ds).sum() / (n * bw**3) / lp
    return float(np.log(lp)), float(dlp)
