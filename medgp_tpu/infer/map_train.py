"""Per-patient MAP training: restart screen + optimizer dispatch.

Replaces the reference train driver (medgpc/src/main_one_train.cpp:154-324):
  1. data-quality gate: >= 2 observations per output
     (main_one_train.cpp:186-197);
  2. screen N random initializations by NLML without gradients and keep the
     argmin (main_one_train.cpp:228-258) — here a single vmapped evaluation
     instead of a serial loop;
  3. optimize: hier-gamma prior -> varEM, otherwise plain SCG
     (main_one_train.cpp:270-292).

Divergence from the reference, by design: the reference aborts the entire
patient when any single restart fails its objective evaluation
(main_one_train.cpp:245-248 `break` + success=false). We instead drop failed
restarts and only fail the patient when every restart fails — strictly more
robust, never changes the selected init when the reference succeeds.

Everything is a pure jittable function of a padded `PatientData`, so a cohort
trains as one `vmap`/`shard_map` batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from medgp_tpu.infer.scg import scg_minimize
from medgp_tpu.infer.varem import VarEMResult, VarEMState, varem_train
from medgp_tpu.models.gp import PatientData, nlml_fn, objective_and_grad
from medgp_tpu.models.params import KernelSpec, LMCSMSpec


class ScreenResult(NamedTuple):
    best_theta: jnp.ndarray  # (H,) argmin-NLML initialization
    best_loss: jnp.ndarray
    n_ok: jnp.ndarray        # how many restarts evaluated successfully
    ok: jnp.ndarray


def data_quality_ok(data: PatientData, n_outputs: int) -> jnp.ndarray:
    """>= 2 observations per output (main_one_train.cpp:186-197)."""
    counts = jnp.zeros(n_outputs, jnp.int32).at[data.meta].add(
        data.mask.astype(jnp.int32)
    )
    return jnp.all(counts >= 2)


def adaptive_screen_chunk(
    batch: int, n: int, budget_bytes: Optional[int] = None, live: int = 3
) -> int:
    """Restart-screen chunk so batch * chunk * n^2 grams (x `live`
    concurrently-resident fp32 buffers) stay inside the HBM budget
    (device-scaled; 4 GiB validated on a 16 GiB v5e — utils/hbm.py).

    The fixed chunk=32 default OOMed at 16 GB once the runner batched 128
    patients per bucket at n=512 (128 x 32 x 512^2 fp32 x ~4 live = 16 GB,
    observed on chip): the chunk must shrink as batch x n^2 grows."""
    if budget_bytes is None:
        from medgp_tpu.utils.hbm import screen_budget_bytes

        budget_bytes = screen_budget_bytes()
    c = budget_bytes // max(batch * n * n * 4 * live, 1)
    return int(max(1, min(32, c)))


def screen_inits(
    spec: KernelSpec,
    data: PatientData,
    thetas: jnp.ndarray,
    max_retries: int = 10,
    chunk: int = 32,
) -> ScreenResult:
    """Evaluate all restarts' NLML batched; keep the argmin.

    Restarts are evaluated in vmapped chunks of `chunk` (a `lax.map`
    batch) so the peak gram memory is chunk * n^2 instead of S * n^2 —
    1000-restart screens on n~10^4 patients stay inside HBM.
    """
    from jax import lax

    loss = nlml_fn(spec, data, max_retries=max_retries)

    def one(theta):
        v, res = loss(theta)
        return v, res.ok

    values, oks = lax.map(
        one, thetas, batch_size=min(chunk, thetas.shape[0])
    )
    values = jnp.where(oks, values, jnp.inf)
    best = jnp.argmin(values)
    return ScreenResult(
        best_theta=thetas[best],
        best_loss=values[best],
        n_ok=jnp.sum(oks.astype(jnp.int32)),
        ok=jnp.any(oks),
    )


class TrainResult(NamedTuple):
    theta: jnp.ndarray       # (H,) trained hypers (train_hyp_*.bin payload)
    loss: jnp.ndarray
    init_theta: jnp.ndarray  # (H,) best restart (train_init_hyp_*.bin payload)
    var_state: VarEMState    # varEM state (train_var_hyp_*.bin payload)
    flag: jnp.ndarray        # bool success (train_flag_*.txt payload)
    n_obs: jnp.ndarray       # int32 (train_num_*.txt payload)


def train_one_patient(
    spec: KernelSpec,
    data: PatientData,
    init_thetas: jnp.ndarray,
    prior_mode: int = 0,
    eta: float = 50.0,
    beta_lam: float = 0.5,
    top_iters: int = 100,
    sub_opt_iter: int = 30,
    max_retries: int = 10,
    screen_chunk: int = 32,
) -> TrainResult:
    """Full single-patient training. `prior_mode` and iteration budgets are
    static (compile-time); `init_thetas` is (n_restarts, H)."""
    dtype = init_thetas.dtype
    n_outputs = spec.D if isinstance(spec, LMCSMSpec) else 1
    quality = data_quality_ok(data, n_outputs)

    screen = screen_inits(
        spec, data, init_thetas, max_retries, chunk=screen_chunk
    )

    if prior_mode == 2:
        if not isinstance(spec, LMCSMSpec):
            raise ValueError("hier-gamma prior requires the LMC-SM kernel")
        res = varem_train(
            spec, data, screen.best_theta,
            eta=eta, beta_lam=beta_lam,
            outer_iters=top_iters, sub_opt_iter=sub_opt_iter,
            max_retries=max_retries,
        )
        theta, loss, var_state, opt_ok = res.theta, res.loss, res.state, res.ok
    else:
        f = objective_and_grad(spec, data, max_retries=max_retries)
        sres = scg_minimize(f, screen.best_theta, max_evals=top_iters)
        theta, loss, opt_ok = sres.x, sres.fx, sres.ok
        if isinstance(spec, LMCSMSpec):
            var_state = VarEMState.initial(spec, dtype)
        else:
            var_state = VarEMState(
                psi=jnp.zeros((0,), dtype), delta=jnp.zeros((0,), dtype),
                phi=jnp.zeros((0,), dtype), tau=jnp.zeros((0,), dtype),
            )

    flag = quality & screen.ok & opt_ok & jnp.isfinite(loss)
    return TrainResult(
        theta=jnp.where(flag, theta, jnp.zeros_like(theta)),
        loss=jnp.where(flag, loss, jnp.asarray(jnp.inf, dtype)),
        init_theta=screen.best_theta,
        var_state=var_state,
        flag=flag,
        n_obs=data.n_obs.astype(jnp.int32),
    )
