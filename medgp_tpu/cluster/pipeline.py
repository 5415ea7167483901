"""Top-level kernel-clustering pipeline for one CV fold.

Mirrors the reference flow (medgpc/clustering/kernclust.py:11-58):
  1. select training-fold patients (cv_assign != fold; fold == -1 keeps all);
  2. load successfully trained kernels (flag-filtered);
  3. extract per-component clustering features;
  4. cluster (GMM + BIC, or single cluster for algorithm None);
  5. estimate the population mode kernel and write the fold's
     {alg}_mode_param.bin + {alg}_mode_mixture_num.txt.

This stage can also run fully in-memory (arrays in, arrays out) for the fused
sharded pipeline — the file round-trip is only for reference-compatible runs.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from medgp_tpu.cluster.features import extract_kernel_features
from medgp_tpu.cluster.gmm import run_clustering_top
from medgp_tpu.cluster.mode import (
    mode_kernel_lmcsm,
    mode_kernel_se,
    mode_kernel_sm,
)
from medgp_tpu.data import formats
from medgp_tpu.models.params import LMCSMSpec, SESpec, SMSpec


def cluster_kernels(
    spec,
    pans: np.ndarray,
    hyps: np.ndarray,
    algorithm: str = "gmm",
    max_cluster_num: int | None = None,
    seed: int = 0,
    noise_mode: np.ndarray | None = None,
):
    """In-memory clustering + mode estimation.

    Returns (mode_theta, newQ). `hyps` is (P, H) flat theta of successfully
    trained patients. `noise_mode` optionally carries the (D,) log
    noise-mode block already computed over the device mesh (LMC-SM only).
    """
    pans = np.asarray(pans)
    comp_pan, comp_qidx, comp_feat = extract_kernel_features(spec, pans, hyps)
    if max_cluster_num is None:
        max_cluster_num = spec.Q if isinstance(spec, (LMCSMSpec, SMSpec)) else 1

    if isinstance(spec, SESpec):
        return mode_kernel_se(pans, hyps), 1

    cluster_num, cluster_assign = run_clustering_top(
        algorithm, comp_feat, max_cluster_num=max_cluster_num, seed=seed
    )
    if isinstance(spec, LMCSMSpec):
        mode_theta = mode_kernel_lmcsm(
            spec, pans, hyps, comp_pan, comp_qidx, cluster_num,
            cluster_assign, noise_mode=noise_mode,
        )
    else:
        mode_theta = mode_kernel_sm(
            spec, pans, hyps, comp_pan, comp_qidx, cluster_num, cluster_assign
        )
    return mode_theta, int(cluster_num)


def kernel_clustering_fold_in_memory(
    spec,
    kernel_dir: str,
    pans: np.ndarray,
    hyps: np.ndarray,
    cv_assign: np.ndarray,
    all_pans: Sequence[str],
    fold: int,
    algorithm: str = "gmm",
    seed: int = 0,
    noise_mode: np.ndarray | None = None,
    metrics=None,
):
    """Fold clustering fed directly from in-memory training results — the
    fused pipeline's train->kernclust handoff with no file round-trip
    (replaces the reference's gather of every train_hyp_*.bin from disk,
    binaryIO.py:20-35). Mode-kernel files are still written for inspection
    and for the reference-compatible test stage.

    `pans`/`hyps` are the successfully trained patients (any order);
    `cv_assign` is indexed by position in `all_pans`.
    """
    pans = np.asarray([str(p) for p in pans])
    fold_of = {
        str(p): int(f) for p, f in zip(all_pans, np.asarray(cv_assign))
    }
    if fold != -1:
        keep = np.asarray([fold_of[p] != fold for p in pans])
    else:
        keep = np.ones(len(pans), bool)
    if not keep.any():
        raise RuntimeError(f"no trained patients for fold {fold}")
    mode_theta, newQ = cluster_kernels(
        spec, pans[keep], hyps[keep], algorithm=algorithm, seed=seed,
        noise_mode=noise_mode,
    )
    formats.write_mode_kernel(kernel_dir, fold, algorithm, mode_theta, newQ)
    if metrics is not None:
        metrics.write(
            "kernclust", fold=int(fold), algorithm=algorithm,
            patients=int(keep.sum()), mixture_num=int(newQ),
        )
    return mode_theta, newQ


def kernel_clustering_fold(
    spec,
    train_dir: str,
    kernel_dir: str,
    all_pans: Sequence[str],
    cv_assign: np.ndarray,
    fold: int,
    algorithm: str = "gmm",
    seed: int = 0,
    metrics=None,
):
    """File-based fold clustering (the reference CLI's unit of work)."""
    all_pans = np.asarray([str(p) for p in all_pans])
    if fold != -1:
        keep = np.asarray(cv_assign) != fold
        sel_pans = all_pans[keep]
    else:
        sel_pans = all_pans
    pans, hyps = formats.read_train_kernels(train_dir, sel_pans)
    if len(pans) == 0:
        raise RuntimeError(
            f"no successfully trained patients for fold {fold}"
        )
    mode_theta, newQ = cluster_kernels(
        spec, pans, hyps, algorithm=algorithm, seed=seed
    )
    formats.write_mode_kernel(kernel_dir, fold, algorithm, mode_theta, newQ)
    if metrics is not None:
        metrics.write(
            "kernclust", fold=int(fold), algorithm=algorithm,
            patients=len(pans), mixture_num=int(newQ),
        )
    return mode_theta, newQ
