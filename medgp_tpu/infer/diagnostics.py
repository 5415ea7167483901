"""Sampler convergence diagnostics: split-R-hat and bulk ESS.

Implements the rank-normalized split-R-hat and bulk effective sample size
of Vehtari, Gelman, Simpson, Carpenter & Buerkner (2021), "Rank-
normalization, folding, and localization: An improved R-hat for assessing
convergence of MCMC" — the acceptance instrumentation BASELINE.json's
"posterior moments within Monte-Carlo error" gate needs (VERDICT r3
missing #4). Host-side numpy on the returned sample stacks: diagnostics
run once per patient per run, off the device hot path.

Conventions: `chains` has shape (C, S, H) (chains x draws x params).
Clamped/masked hypers (zero variance) report R-hat = 1 and ESS = C*S —
they carry no Monte-Carlo error by construction.
"""

from __future__ import annotations

import numpy as np


def _split(chains: np.ndarray) -> np.ndarray:
    """(C, S, H) -> (2C, S//2, H): split each chain in half."""
    C, S, H = chains.shape
    half = S // 2
    a = chains[:, :half]
    b = chains[:, half:2 * half]
    return np.concatenate([a, b], axis=0)


def _rank_normalize(chains: np.ndarray) -> np.ndarray:
    """Pooled fractional ranks -> standard-normal scores (per parameter)."""
    from scipy.special import ndtri

    C, S, H = chains.shape
    flat = chains.reshape(C * S, H)
    order = np.argsort(flat, axis=0)
    ranks = np.empty_like(order)
    np.put_along_axis(
        ranks, order,
        np.broadcast_to(np.arange(C * S)[:, None], (C * S, H)), axis=0,
    )
    z = ndtri((ranks + 0.5 + 0.375) / (C * S + 0.25))
    return z.reshape(C, S, H)


def _rhat_of(chains: np.ndarray) -> np.ndarray:
    C, S, H = chains.shape
    mean_c = chains.mean(axis=1)                       # (C, H)
    var_c = chains.var(axis=1, ddof=1)                 # (C, H)
    W = var_c.mean(axis=0)
    B = S * mean_c.var(axis=0, ddof=1)
    var_plus = (S - 1) / S * W + B / S
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / W)
    return np.where(W <= 1e-30, 1.0, rhat)


def split_rhat(chains: np.ndarray) -> np.ndarray:
    """Rank-normalized split-R-hat per parameter: (C, S, H) -> (H,).

    Values near 1.0 indicate between-chain agreement; > 1.01 is the usual
    convergence warning threshold.
    """
    chains = np.asarray(chains, np.float64)
    if chains.ndim == 2:
        chains = chains[None]
    C, S, H = chains.shape
    if S < 4 or C * 2 < 2:
        return np.ones(chains.shape[-1])
    sp = _split(chains)
    # constant parameters (clamped hypers) are exactly converged
    const = sp.std(axis=(0, 1)) <= 1e-30
    z = _rank_normalize(np.where(const[None, None, :], 0.0, sp))
    r = _rhat_of(z)
    return np.where(const, 1.0, r)


def _autocov_fft(x: np.ndarray) -> np.ndarray:
    """Biased autocovariance per chain/param via FFT: (C, S, H)->(C, S, H)."""
    C, S, H = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    nfft = int(2 ** np.ceil(np.log2(2 * S)))
    f = np.fft.rfft(xc, n=nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=1)[:, :S]
    return acov / S


def ess_bulk(chains: np.ndarray) -> np.ndarray:
    """Rank-normalized bulk effective sample size per parameter:
    (C, S, H) -> (H,). Uses Geyer's initial monotone positive sequence on
    the combined autocorrelation."""
    chains = np.asarray(chains, np.float64)
    if chains.ndim == 2:
        chains = chains[None]
    sp = _split(chains)
    C, S, H = sp.shape
    total = chains.shape[0] * chains.shape[1]
    if S < 4:
        return np.full(H, float(total))
    const = sp.std(axis=(0, 1)) <= 1e-30
    z = _rank_normalize(np.where(const[None, None, :], 0.0, sp))

    acov = _autocov_fft(z)                              # (C, S, H)
    mean_acov0 = acov[:, 0].mean(axis=0)                # W per param
    mean_c = z.mean(axis=1)
    var_plus = mean_acov0 * S / (S - 1.0)
    if C > 1:
        var_plus = var_plus + mean_c.var(axis=0, ddof=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = 1.0 - (mean_acov0[None] - acov.mean(axis=0)) / var_plus[None]
    rho = np.nan_to_num(rho, nan=0.0)                   # (S, H)

    # Geyer: pair sums P_k = rho_{2k} + rho_{2k+1} (P_0 includes rho_0 = 1);
    # truncate at the first nonpositive pair, enforce monotone decrease;
    # tau = -1 + 2 sum P_k  (= 1 + 2 sum_{t>=1} rho_t)
    T = S // 2
    p = rho[: 2 * T].reshape(T, 2, H).sum(axis=1)       # (T, H)
    p = np.minimum.accumulate(p, axis=0)
    first_bad = np.argmax(p <= 0, axis=0)
    has_bad = (p <= 0).any(axis=0)
    idx = np.arange(T)[:, None]
    keep = np.where(has_bad[None], idx < first_bad[None], True)
    p = np.where(p > 0, p, 0.0)
    tau = -1.0 + 2.0 * (p * keep).sum(axis=0)
    tau = np.maximum(tau, 1.0 / np.log10(max(total, 10)))
    ess = total / tau
    ess = np.clip(ess, 1.0, float(total) * np.log10(max(total, 10)))
    return np.where(const, float(total), ess)


def block_slices(spec) -> dict:
    """Hyper-vector blocks for per-block diagnostics reporting (layout:
    lik | A | mu | v | kappa — models/params.py KernelSpec.split)."""
    from medgp_tpu.models.params import LMCSMSpec

    if not isinstance(spec, LMCSMSpec):
        return {"all": slice(0, spec.n_hyp)}
    nl = spec.n_lik
    nA = spec.Q * spec.D * spec.R
    Q = spec.Q
    return {
        "lik": slice(0, nl),
        "A": slice(nl, nl + nA),
        "mu": slice(nl + nA, nl + nA + Q),
        "v": slice(nl + nA + Q, nl + nA + 2 * Q),
        "kappa": slice(nl + nA + 2 * Q, spec.n_hyp),
    }


def summarize_diagnostics(chains: np.ndarray, spec=None) -> dict:
    """Per-hyper-block min-ESS and max-split-R-hat for one patient's
    (C, S, H) sample stack. Returns a flat dict of scalars suitable for
    metrics.jsonl."""
    chains = np.asarray(chains)
    ess = ess_bulk(chains)
    rhat = split_rhat(chains)
    out = {
        "ess_bulk_min": float(np.min(ess)),
        "ess_bulk_median": float(np.median(ess)),
        "rhat_max": float(np.max(rhat)),
    }
    if spec is not None:
        for name, sl in block_slices(spec).items():
            if sl.stop > sl.start:
                out[f"ess_min_{name}"] = float(np.min(ess[sl]))
                out[f"rhat_max_{name}"] = float(np.max(rhat[sl]))
    return out
