"""Training driver for outlier-large patients over the device mesh.

The reference's top Slurm tier trains patients with 10,000 <= n < 100,000
observations as single 20-thread/100 GB jobs (scripts/slurm_della.json:51-61).
Such a patient cannot go through the padded-bucket vmap path — one (n, n)
fp32 gram at n = 100k is 40 GB — so the runner routes it here instead:

  * the observation axis is padded to a mesh multiple and ROW-SHARDED over
    all chips (the honest ICI-era analog of "sequence-length scaling",
    SURVEY §5.7);
  * the restart screen evaluates cfg.large_patient_restarts inits (64)
    through ONE distributed program (`parallel.mesh.large_patient_screen`,
    lax.map over inits). 64 — not the reference's 1,000, and not the
    earlier default of 8: a measured budget experiment at n = 8,192
    canonical scale (tools/screen_budget_exp.py, SCALE.md §7) found the
    best-of-8 init ~5,200 nats ABOVE the best-of-64 basin (~27% of the
    init spread), so 8 was not enough; 64 inits cost only ~40 s on one
    v5e because the screen is a single program (the reference's 1,000
    would cost ~10 min of pure screening per large patient — available
    via --restarts for parity runs);
  * SCG / hier-gamma varEM run UNCHANGED over the distributed
    objective+gradient (`parallel.mesh.large_patient_objective`, custom VJP,
    no (n, n) buffer in forward or backward) via varem_train's
    objective_factory hook.

Outputs mirror `train_one_patient` so the runner writes the same
train_hyp/train_flag/train_var_hyp artifacts (main_one_train.cpp:297-323).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from medgp_tpu.infer.scg import scg_minimize
from medgp_tpu.infer.varem import varem_train
from medgp_tpu.models.gp import PatientData
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.parallel.mesh import (
    large_patient_nlml_diff,
    large_patient_objective,
    large_patient_screen,
)


def pad_observations(
    t: np.ndarray, y: np.ndarray, meta: np.ndarray, multiple: int
):
    """Pad the observation axis to a multiple (mask-0 identity rows)."""
    n = len(t)
    n_pad = (-n) % multiple
    z = lambda a: np.concatenate([a, np.zeros(n_pad, a.dtype)])
    mask = np.concatenate(
        [np.ones(n, np.float32), np.zeros(n_pad, np.float32)]
    )
    return (
        z(t.astype(np.float32)), z(y.astype(np.float32)),
        z(meta.astype(np.int32)), mask,
    )


def train_one_large_patient(
    spec: LMCSMSpec,
    t: np.ndarray,
    y: np.ndarray,
    meta: np.ndarray,
    mesh,
    inits: jnp.ndarray,
    prior_mode: int = 2,
    eta: float = 0.01,
    beta_lam: float = 0.01,
    top_iters: int = 40,
    sub_opt_iter: int = 30,
    max_retries: int = 10,
    row_multiple: int = 8,
) -> dict:
    """Train one raw (unpadded) patient sharded over `mesh`.

    `inits` is the (S, H) restart set to screen (the caller slices the
    cohort's shared init sequence down to cfg.large_patient_restarts).
    Returns the same result dict train_cohort builds per patient.
    """
    ndev = int(mesh.devices.size)
    tp, yp, mp, maskp = pad_observations(t, y, meta, ndev * row_multiple)
    args = (
        jnp.asarray(tp), jnp.asarray(yp), jnp.asarray(mp),
        jnp.asarray(maskp),
    )

    # ---- data-quality gate (main_one_train.cpp:186-197), host-side ----
    counts = np.bincount(meta, minlength=spec.D)
    quality = bool((counts >= 2).all()) and len(t) > 2

    # ---- restart screen: ALL inits in one distributed program ----
    # (a lax.map over inits inside one jit: one dispatch, one host sync,
    # one factorization workspace live at a time — replacing S host-synced
    # round trips)
    screen_fn = large_patient_screen(spec, mesh, max_retries=max_retries)
    S = int(inits.shape[0])
    vals, oks = screen_fn(jnp.asarray(inits, jnp.float32), *args)
    values = np.where(
        np.asarray(oks) & np.isfinite(np.asarray(vals)),
        np.asarray(vals, np.float64), np.inf,
    )
    screen_ok = np.isfinite(values).any()
    best = int(np.argmin(values))
    theta0 = jnp.asarray(inits[best], jnp.float32)

    # ---- optimize over the distributed objective ----
    base = large_patient_nlml_diff(spec, mesh, max_retries=max_retries)

    def factory(prior):
        return large_patient_objective(
            spec, mesh, *args, prior=prior, max_retries=max_retries,
            base=base,
        )

    data = PatientData(t=args[0], y=args[1], meta=args[2], mask=args[3])
    if prior_mode == 2:
        @jax.jit
        def optimize(theta0):
            res = varem_train(
                spec, data, theta0, eta=eta, beta_lam=beta_lam,
                outer_iters=top_iters, sub_opt_iter=sub_opt_iter,
                max_retries=max_retries, objective_factory=factory,
            )
            return res.theta, res.loss, res.ok, res.state

        theta, loss, opt_ok, state = optimize(theta0)
        var_flat = np.concatenate(
            [
                np.asarray(state.psi).reshape(-1),
                np.asarray(state.delta).reshape(-1),
                np.asarray(state.phi).reshape(-1),
                np.asarray(state.tau).reshape(-1),
            ]
        ).astype(np.float64)
    else:
        @jax.jit
        def optimize(theta0):
            f = factory(None)
            res = scg_minimize(f, theta0, max_evals=top_iters)
            return res.x, res.fx, res.ok

        theta, loss, opt_ok = optimize(theta0)
        var_flat = None

    flag = bool(quality and screen_ok and bool(opt_ok)
                and np.isfinite(float(loss)))
    return dict(
        theta=np.asarray(theta, np.float64) if flag else np.zeros(
            spec.n_hyp, np.float64
        ),
        init_theta=np.asarray(theta0, np.float64),
        flag=flag,
        loss=float(loss) if flag else float("inf"),
        n_obs=int(len(t)),
        var_state=var_flat,
    )
