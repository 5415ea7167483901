"""Cohort evaluation: per-feature patient-wise MAE and 95% CI coverage.

Mirrors the reference evaluation stage (medgpc/evaluation/evals.py:7-61):
for each configured feature, de-normalize the stored predictions with the
cohort stats, align them 1:1 against the raw feature file values, and emit
per-patient MAE / CI-coverage vectors (failed patients get -1 and are
filtered) to test_{mode}_feature{f}_{mae,ci_ratio}.bin.

Also provides an in-memory variant for the fused pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

from medgp_tpu.data import formats


def compute_mae(error: np.ndarray) -> float:
    return float(np.nanmean(np.abs(error)))


def compute_coverage(ci_flags: np.ndarray) -> float:
    return 100.0 * float(np.nanmean(ci_flags))


def compute_nll(error: np.ndarray, var: np.ndarray) -> float:
    """Mean Gaussian predictive negative log-likelihood per observation —
    the acceptance metric of BASELINE.json (reference computes only MAE/CI;
    this needs the predictive variance our test stage additionally records).
    `error` and `var` must be on the same (raw) scale."""
    var = np.maximum(np.asarray(var, np.float64), 1e-12)
    return float(np.nanmean(
        0.5 * np.asarray(error, np.float64) ** 2 / var
        + 0.5 * np.log(2.0 * np.pi * var)
    ))


def eval_cohort(
    data_dir: str,
    test_dir: str,
    test_mode: str,
    feature_index: Sequence[int],
    pans: Sequence[str],
    write: bool = True,
    metrics=None,
) -> Dict[int, Dict[str, np.ndarray]]:
    """Returns {feature_idx: {"mae": (P_valid,), "ci_ratio": (P_valid,)}}.

    `metrics` optionally takes a MetricsWriter; one "eval" record per
    feature is appended (per-patient MAE / coverage distributions)."""
    out: Dict[int, Dict[str, np.ndarray]] = {}
    any_output = any(
        os.path.exists(
            formats.test_paths(test_dir, test_mode, str(p))["flag"]
        )
        for p in pans
    )
    if not any_output:
        raise FileNotFoundError(
            f"no test outputs found for mode '{test_mode}' in {test_dir} — "
            "run the test stage first or check --test-mode "
            "(mean_wo_update | mean_w_update)"
        )
    for fidx in feature_index:
        mean, std = formats.read_feature_stat(
            os.path.join(data_dir, f"feature{fidx}_stat.bin")
        )
        mae = np.full(len(pans), -1.0)
        cov = np.full(len(pans), -1.0)
        nll = np.full(len(pans), np.nan)
        for i, pan in enumerate(pans):
            try:
                flag, res = formats.read_test_result(
                    test_dir, test_mode, str(pan)
                )
            except OSError:
                continue
            if not flag or res is None:
                continue
            sel = np.nonzero(res["feature"] == fidx)[0]
            pred = res["pred"][sel] * std + mean
            ci = res["ci"][sel]
            raw_t, raw_v = formats.read_feature_txt(
                os.path.join(data_dir, str(pan), f"feature{fidx}.txt")
            )
            assert len(pred) == len(raw_v), (
                f"prediction/raw mismatch for {pan} feature{fidx}: "
                f"{len(pred)} vs {len(raw_v)}"
            )
            err = raw_v - pred
            mae[i] = compute_mae(err)
            cov[i] = compute_coverage(ci)
            if res.get("var") is not None:
                # de-normalize the variance: raw = norm * std + mean
                nll[i] = compute_nll(err, res["var"][sel] * std**2)

        valid = mae >= 0.0
        res_f = dict(mae=mae[valid], ci_ratio=cov[mae >= 0.0])
        nll_valid = nll[valid]
        if np.isfinite(nll_valid).any():
            res_f["nll"] = nll_valid
        out[fidx] = res_f
        if metrics is not None:
            extra = {"nll": res_f["nll"]} if "nll" in res_f else {}
            metrics.write(
                "eval", mode=test_mode, feature=int(fidx),
                valid_patients=int(valid.sum()), mae=res_f["mae"],
                ci_ratio=res_f["ci_ratio"], **extra,
            )
        if write:
            formats.write_double_bin(
                os.path.join(
                    test_dir, f"test_{test_mode}_feature{fidx}_mae.bin"
                ),
                res_f["mae"],
            )
            formats.write_double_bin(
                os.path.join(
                    test_dir, f"test_{test_mode}_feature{fidx}_ci_ratio.bin"
                ),
                res_f["ci_ratio"],
            )
            if "nll" in res_f:
                formats.write_double_bin(
                    os.path.join(
                        test_dir, f"test_{test_mode}_feature{fidx}_nll.bin"
                    ),
                    res_f["nll"],
                )
    return out


def summarize(results: Dict[int, Dict[str, np.ndarray]]) -> Dict[str, float]:
    """Cohort-level scalars: mean of per-patient MAE / coverage by feature,
    then averaged over features (for quick reporting; the reference keeps the
    per-feature vectors)."""
    maes, covs, nlls = [], [], []
    for fidx, r in results.items():
        if len(r["mae"]):
            maes.append(np.mean(r["mae"]))
            covs.append(np.mean(r["ci_ratio"]))
            if "nll" in r:
                nlls.append(np.nanmean(r["nll"]))
    out = dict(
        mae=float(np.mean(maes)) if maes else float("nan"),
        ci_ratio=float(np.mean(covs)) if covs else float("nan"),
    )
    if nlls:
        out["nll"] = float(np.mean(nlls))
    return out
