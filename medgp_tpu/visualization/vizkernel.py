"""Kernel / clustering visualization (matplotlib, optional).

The plotting counterpart of the reference's vizkernel module
(medgpc/visualization/vizkernel.py:21-365): KDE-vs-histogram panels, cluster
scatter in (period, lengthscale) space, per-component SM responses, and B /
A / lambda heatmaps. All entry points are no-ops returning None when
matplotlib is unavailable so the compute pipeline never depends on plotting.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAS_MPL = True
except ImportError:  # pragma: no cover
    _HAS_MPL = False

from medgp_tpu.cluster.features import sm_response_curve
from medgp_tpu.cluster.kde import gaussian_kde
from medgp_tpu.models.params import LMCSMSpec


def _save(fig, out_dir: str, name: str, fig_format: str = "pdf"):
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.{fig_format}")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_kde_hist(
    data: np.ndarray, out_dir: str, name: str, title: str = "",
    bins: int = 40, fig_format: str = "pdf",
) -> Optional[str]:
    """Histogram + fitted KDE density (vizkernel.py:21-62)."""
    if not _HAS_MPL:
        return None
    data = np.asarray(data, float).ravel()
    grid = np.linspace(data.min(), data.max() + 1e-9, 512)
    dens = gaussian_kde(data, grid)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.hist(data, bins=bins, density=True, alpha=0.4)
    ax.plot(grid, dens, lw=2)
    ax.set_title(title or name)
    return _save(fig, out_dir, name, fig_format)


def plot_cluster_scatter(
    period: np.ndarray, lengthscale: np.ndarray, cluster: np.ndarray,
    out_dir: str, name: str = "all_cluster_feature", title: str = "",
    fig_format: str = "pdf",
) -> Optional[str]:
    """(period, lengthscale) scatter colored by cluster (vizkernel.py:65-116)."""
    if not _HAS_MPL:
        return None
    fig, ax = plt.subplots(figsize=(6, 5))
    for c in np.unique(cluster):
        sel = cluster == c
        ax.scatter(period[sel], lengthscale[sel], s=12, label=f"cluster {c}")
    ax.set_xlabel("period (hours)")
    ax.set_ylabel("lengthscale (hours)")
    ax.set_xlim(0, 200)
    ax.set_ylim(0, 500)
    ax.legend()
    ax.set_title(title or name)
    return _save(fig, out_dir, name, fig_format)


def plot_lmcsm_kernel(
    spec: LMCSMSpec, theta: np.ndarray, out_dir: str,
    prefix: str = "mode_", fig_format: str = "pdf",
) -> Optional[list]:
    """Per-component panels: B heatmap + SM response (vizkernel.py:217-365)."""
    if not _HAS_MPL:
        return None
    theta = np.asarray(theta, float)
    Q, D, R = spec.Q, spec.D, spec.R
    A = theta[D : D + Q * D * R].reshape(Q, D, R)
    mu = np.exp(theta[D + Q * D * R : D + Q * D * R + Q])
    v2 = np.exp(2 * theta[D + Q * (D * R + 1) : D + Q * (D * R + 2)])
    kap = np.exp(theta[D + Q * (D * R + 2) :]).reshape(Q, D)
    paths = []
    for q in range(Q):
        B = A[q] @ A[q].T + np.diag(kap[q])
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        im = axes[0].imshow(B, cmap="RdBu_r", vmin=-np.abs(B).max(),
                            vmax=np.abs(B).max())
        fig.colorbar(im, ax=axes[0], shrink=0.8)
        axes[0].set_title(f"B_{q}")
        resp = sm_response_curve(mu[q], v2[q])
        axes[1].plot(np.arange(len(resp)), resp)
        axes[1].set_xlabel("lag (hours)")
        axes[1].set_title(
            f"SM response q={q} (period {1/mu[q]:.1f} h)"
        )
        paths.append(_save(fig, out_dir, f"{prefix}kernel{q}", fig_format))
    return paths
