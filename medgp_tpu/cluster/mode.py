"""Population mode-kernel estimation from clustered per-patient kernels.

Re-implements the reference's KDE mode pipeline
(medgpc/clustering/mode_estimate.py:242-435 `output_mode_LMC_SM`):

  per output d:     mode of KDE over exp(theta_noise_d), weighted
  per cluster q:    modes of KDE over mu and sqrt-v samples, weighted
  per cluster q:    sum same-patient component B matrices, element-wise
                    weighted KDE mode over patients -> mode B (symmetric)
  SVD split:        mode-B = U S V^T; A = (U*sqrt(S))[:, :R];
                    lambda = diag(B - A A^T) clamped to >= 1e-15
  output:           flat mode theta with Q := number of clusters

and the simpler SE / SM variants (mode_estimate.py:30-239), including their
*unweighted* (argmax) mode rule and fixed evaluation grids.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from medgp_tpu.cluster.kde import kde_mode, kde_mode_batch
from medgp_tpu.models.params import LMCSMSpec, SESpec, SMSpec


def mode_kernel_lmcsm(
    spec: LMCSMSpec,
    pans: np.ndarray,
    hyps: np.ndarray,
    comp_pan: np.ndarray,
    comp_qidx: np.ndarray,
    cluster_num: int,
    cluster_assign: np.ndarray,
    noise_mode: np.ndarray | None = None,
) -> np.ndarray:
    """Returns the flat mode theta for an LMCSMSpec(newQ, D, R) kernel.

    `noise_mode` optionally supplies the (D,) log noise-mode block computed
    in-program over the device mesh (parallel/mesh.py:population_noise_mode,
    an all_gather + KDE over ICI) — the fused pipeline's replacement for
    re-deriving it host-side from gathered hypers; the two are proven equal
    in tests/test_mesh.py.
    """
    Q, D, R = spec.Q, spec.D, spec.R
    P = hyps.shape[0]
    newQ = int(cluster_num)
    out = np.zeros(D + newQ * (D * R + 2 + D))

    # noise modes (weighted; mode_estimate.py:267-279)
    if noise_mode is not None:
        out[:D] = np.asarray(noise_mode, np.float64)
    else:
        out[:D] = np.log(
            kde_mode_batch(np.exp(hyps[:, :D]).T, weighted=True)
        )

    pan_index = {p: i for i, p in enumerate(pans)}
    A_all = hyps[:, D : D + Q * D * R].reshape(P, Q, D, R)
    mu_all = np.exp(hyps[:, D + Q * D * R : D + Q * D * R + Q])
    vsr_all = np.exp(hyps[:, D + Q * (D * R + 1) : D + Q * (D * R + 2)])
    kap_all = np.exp(hyps[:, D + Q * (D * R + 2) :]).reshape(P, Q, D)

    cluster_ids = np.unique(cluster_assign)
    assert len(cluster_ids) == newQ, (cluster_ids, newQ)

    for q, cid in enumerate(cluster_ids):
        sel = np.nonzero(cluster_assign == cid)[0]
        assert len(sel) > 0
        rows = np.asarray([pan_index[p] for p in comp_pan[sel]])
        qs = comp_qidx[sel]

        mode_mu = kde_mode(mu_all[rows, qs], weighted=True)
        out[D + newQ * D * R + q] = np.log(mode_mu)
        mode_vsr = kde_mode(vsr_all[rows, qs], weighted=True)
        out[D + newQ * (D * R + 1) + q] = np.log(mode_vsr)

        # per-patient summed B over this cluster's components
        # (mode_estimate.py:352-383), assembled in one einsum + scatter-add
        # (per-entry addition order matches the reference's loop)
        upans, inv = np.unique(comp_pan[sel], return_inverse=True)
        A_c = A_all[rows, qs]                         # (C, D, R)
        B_comp = np.einsum("cdr,cer->cde", A_c, A_c)
        B_comp[:, np.arange(D), np.arange(D)] += kap_all[rows, qs]
        all_B = np.zeros((len(upans), D, D))
        np.add.at(all_B, inv, B_comp)

        # element-wise weighted KDE modes over patients, all upper-triangle
        # elements in ONE batched pass (round-5: was a D(D+1)/2 Python loop
        # of scalar KDE fits — the kernclust stage's wall-clock hot spot)
        iu0, iu1 = np.triu_indices(D)
        modes = kde_mode_batch(all_B[:, iu0, iu1].T, weighted=True)
        kde_B = np.zeros((D, D))
        kde_B[iu0, iu1] = modes
        kde_B[iu1, iu0] = modes

        # SVD re-factorization (mode_estimate.py:411-420). For R > D the
        # (D, D) mode-B has rank <= D < R: pad A with zero columns (the
        # reference indexes A_[d, r] out of bounds in that regime —
        # mode_estimate.py:418-419 — because rank > D is mathematically
        # redundant for B = A A^T; we degrade gracefully instead).
        U, S, _ = np.linalg.svd(kde_B)
        A_ = (U * np.sqrt(np.maximum(S, 0.0)))[:, :R]
        if A_.shape[1] < R:
            A_ = np.concatenate(
                [A_, np.zeros((D, R - A_.shape[1]))], axis=1
            )
        lam = np.diag(kde_B - A_ @ A_.T).copy()
        lam[lam <= 0.0] = 1e-15
        out[D + newQ * (D * R + 2) + q * D : D + newQ * (D * R + 2) + (q + 1) * D] = np.log(lam)
        out[D + q * D * R : D + (q + 1) * D * R] = A_.reshape(-1)

    return out


def mode_kernel_se(pans: np.ndarray, hyps: np.ndarray) -> np.ndarray:
    """SE mode (mode_estimate.py:30-79): unweighted argmax modes; the
    lengthscale uses a fixed linspace(0.01, 1000, 100001) evaluation grid."""
    out = np.zeros(hyps.shape[1])
    for i in range(hyps.shape[1]):
        all_h = np.exp(hyps[:, i])
        if i == 1:  # lengthscale
            grid = np.linspace(0.01, 1000.0, 100001)
            out[i] = np.log(kde_mode(all_h, weighted=False, eval_points=grid))
        else:
            out[i] = np.log(kde_mode(all_h, weighted=False))
    return out


def mode_kernel_sm(
    spec: SMSpec,
    pans: np.ndarray,
    hyps: np.ndarray,
    comp_pan: np.ndarray,
    comp_qidx: np.ndarray,
    cluster_num: int,
    cluster_assign: np.ndarray,
) -> np.ndarray:
    """SM mode (mode_estimate.py:82-239): unweighted modes; mu/v evaluated on
    reciprocal grids of linspace(0.01, 1000, 100001); per-patient weights
    summed within a cluster before the KDE."""
    Q = spec.Q
    newQ = int(cluster_num)
    out = np.zeros(1 + 3 * newQ)
    out[0] = np.log(kde_mode(np.exp(hyps[:, 0]), weighted=False))

    pan_index = {p: i for i, p in enumerate(pans)}
    cluster_ids = np.unique(cluster_assign)
    grid = np.linspace(0.01, 1000.0, 100001)

    for q, cid in enumerate(cluster_ids):
        sel = np.nonzero(cluster_assign == cid)[0]
        rows = np.asarray([pan_index[p] for p in comp_pan[sel]])
        qs = comp_qidx[sel]

        all_mu = np.exp(hyps[rows, 1 + Q + qs])
        out[1 + newQ + q] = np.log(
            kde_mode(all_mu, weighted=False, eval_points=1.0 / grid)
        )
        all_vsr = np.exp(hyps[rows, 1 + 2 * Q + qs])
        out[1 + 2 * newQ + q] = np.log(
            kde_mode(
                all_vsr, weighted=False,
                eval_points=1.0 / (2.0 * np.pi * grid),
            )
        )

        ws = []
        for pan in np.unique(comp_pan[sel]):
            pidx = pan_index[pan]
            w = sum(
                np.exp(hyps[pidx, 1 + qq])
                for qq in qs[comp_pan[sel] == pan]
            )
            ws.append(w)
        out[1 + q] = np.log(kde_mode(np.asarray(ws), weighted=False))
    return out
