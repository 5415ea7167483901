"""Variational-EM loop for the hierarchical-gamma sparsity prior.

Outer EM loop around SCG M-steps with closed-form E-step updates of the
variational parameters (psi, delta, phi, tau), exact sparsification by
clamping A-elements whose psi underflows to zero, and re-linking of the
Normal(0, psi) prior each round
(reference: medgpc/src/util/c_optimizer_varEM.cpp:26-206).

Semantics preserved exactly:
  * SCG budget: 100 function evaluations for the first 5 outer iterations,
    then `sub_opt_iter` (c_optimizer_varEM.cpp:63-69).
  * Early stop when |(loss - prev_loss)/prev_loss| < 0.005, checked after the
    M-step and *before* that round's E-step (c_optimizer_varEM.cpp:89-95).
  * E-step update order tau -> phi -> delta -> psi, each using the freshly
    updated values of the previous ones (c_optimizer_varEM.cpp:105-161):
        tau   = (gamma + d) / (phi + eta)
        phi   = (D*beta + gamma - 1) / (sum_d delta + tau)
        delta = (alpha + beta) / (psi + phi)
        psi   = (s + sqrt(s^2 + 8*delta*a^2)) / (4*delta),  s = 2*alpha - 3
  * psi == 0  =>  a := 0 and the prior on that element is clamped for the
    rest of the run (type 0, gradient forced to zero).
  * Fixed hypers (alpha, beta, gamma, d) = 0.5 and eta from the experiment
    config (c_prior.cpp:234-241).

The whole loop is traced (two `lax.scan` phases for the two static SCG
budgets) so it vmaps over a padded patient batch — the reference runs this
loop in one OS process per patient.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from medgp_tpu.infer.scg import scg_minimize
from medgp_tpu.models.gp import PatientData, objective_and_grad
from medgp_tpu.models.params import LMCSMSpec, cov_slices
from medgp_tpu.models.priors import (
    PRIOR_CLAMP,
    PriorSpec,
    hier_gamma_prior,
)


class VarEMState(NamedTuple):
    """Variational parameters; flat layout [psi | delta | phi | tau]
    matches the reference's cov_varEM vector of size 2*Q*(D*R + R)
    (c_prior.h varEM accessors; c_optimizer_varEM.cpp index arithmetic)."""

    psi: jnp.ndarray    # (Q, D, R)
    delta: jnp.ndarray  # (Q, D, R)
    phi: jnp.ndarray    # (Q, R)
    tau: jnp.ndarray    # (Q, R)

    def flatten(self) -> jnp.ndarray:
        return jnp.concatenate(
            [
                self.psi.reshape(-1),
                self.delta.reshape(-1),
                self.phi.reshape(-1),
                self.tau.reshape(-1),
            ]
        )

    @classmethod
    def unflatten(cls, spec: LMCSMSpec, flat: jnp.ndarray) -> "VarEMState":
        Q, D, R = spec.Q, spec.D, spec.R
        n = Q * D * R
        return cls(
            psi=flat[:n].reshape(Q, D, R),
            delta=flat[n : 2 * n].reshape(Q, D, R),
            phi=flat[2 * n : 2 * n + Q * R].reshape(Q, R),
            tau=flat[2 * n + Q * R :].reshape(Q, R),
        )

    @classmethod
    def initial(cls, spec: LMCSMSpec, dtype=jnp.float32) -> "VarEMState":
        Q, D, R = spec.Q, spec.D, spec.R
        one = jnp.ones((Q, D, R), dtype)
        return cls(
            psi=one, delta=one,
            phi=jnp.ones((Q, R), dtype), tau=jnp.ones((Q, R), dtype),
        )


class VarEMResult(NamedTuple):
    theta: jnp.ndarray
    loss: jnp.ndarray
    state: VarEMState
    prior: PriorSpec
    n_outer: jnp.ndarray  # outer EM iterations actually run
    ok: jnp.ndarray


def e_step(
    spec: LMCSMSpec,
    st: VarEMState,
    a: jnp.ndarray,
    fixed: jnp.ndarray,
    psi_clamp_eps: float,
):
    """One E-step. `a` is the (Q, D, R) block of theta. Returns
    (new_state, clamp_mask (Q,D,R) bool)."""
    alpha, beta, gamma, d, eta = (
        fixed[0], fixed[1], fixed[2], fixed[3], fixed[4],
    )
    D = spec.D
    tau = (gamma + d) / (st.phi + eta)                            # (Q, R)
    phi = (D * beta + gamma - 1.0) / (jnp.sum(st.delta, axis=1) + tau)
    delta = (alpha + beta) / (st.psi + phi[:, None, :])
    s = 2.0 * alpha - 3.0
    psi = (s + jnp.sqrt(s * s + 8.0 * delta * a * a)) / (4.0 * delta)
    clamp = psi <= psi_clamp_eps
    return VarEMState(psi=psi, delta=delta, phi=phi, tau=tau), clamp


def varem_train(
    spec: LMCSMSpec,
    data: PatientData,
    theta0: jnp.ndarray,
    eta: float = 50.0,
    beta_lam: float = 0.5,
    outer_iters: int = 40,
    sub_opt_iter: int = 30,
    warmup_iters: int = 5,
    warmup_evals: int = 100,
    early_stop_tol: float = 0.005,
    psi_clamp_eps: float = 0.0,
    max_retries: int = 10,
    objective_factory=None,
) -> VarEMResult:
    """MAP training of one (padded) patient under the hier-gamma prior.

    `eta` and `beta_lam` are the experiment's prior hypers (cfg keys "eta",
    "beta_lam"; c_experiment.cpp:99-110). Fully traced; vmap over patients.

    `objective_factory(prior) -> f(theta) -> (value, grad, ok)` overrides the
    M-step objective builder (default: the single-device
    `objective_and_grad(spec, data, prior)`); the row-sharded large-patient
    path passes `parallel.mesh.large_patient_objective` here so varEM runs
    unchanged over the distributed blocked-Cholesky NLML.
    """
    dtype = theta0.dtype
    sl = cov_slices(spec)
    a_lo, a_hi = sl["a"].start, sl["a"].stop
    fixed = jnp.asarray([0.5, 0.5, 0.5, 0.5, eta], dtype)

    prior0 = hier_gamma_prior(spec, beta_lam=beta_lam, dtype=dtype)
    st0 = VarEMState.initial(spec, dtype)

    class Carry(NamedTuple):
        theta: jnp.ndarray
        loss: jnp.ndarray
        prev_loss: jnp.ndarray
        state: VarEMState
        prior: PriorSpec
        done: jnp.ndarray
        n_outer: jnp.ndarray
        ok: jnp.ndarray

    def one_round(carry: Carry, scg_evals: int, is_first: jnp.ndarray):
        # ---- M-step: SCG under the current prior ----
        if objective_factory is not None:
            f = objective_factory(carry.prior)
        else:
            f = objective_and_grad(
                spec, data, prior=carry.prior, max_retries=max_retries
            )
        res = scg_minimize(f, carry.theta, max_evals=scg_evals)
        loss = res.fx

        # ---- early stop (checked before the E-step) ----
        change = (loss - carry.prev_loss) / carry.prev_loss
        stop = (~is_first) & (jnp.abs(change) < early_stop_tol)

        # ---- E-step ----
        a = res.x[a_lo:a_hi].reshape(spec.Q, spec.D, spec.R)
        new_state, clamp = e_step(spec, carry.state, a, fixed, psi_clamp_eps)

        already = (
            carry.prior.active[a_lo:a_hi]
            & (carry.prior.ptype[a_lo:a_hi] == PRIOR_CLAMP)
        ).reshape(spec.Q, spec.D, spec.R)
        clamp_all = clamp | already

        theta_new = res.x.at[a_lo:a_hi].set(
            jnp.where(clamp_all.reshape(-1), 0.0, res.x[a_lo:a_hi])
        )
        ptype = carry.prior.ptype.at[a_lo:a_hi].set(
            jnp.where(
                clamp_all.reshape(-1), PRIOR_CLAMP, carry.prior.ptype[a_lo:a_hi]
            )
        )
        scale = carry.prior.scale.at[a_lo:a_hi].set(
            new_state.psi.reshape(-1).astype(dtype)
        )
        prior_new = carry.prior._replace(ptype=ptype, scale=scale)

        # Three cases per batch element:
        #   frozen (done earlier): keep everything;
        #   stopping this round:   accept the M-step result, skip the E-step
        #                          (reference breaks before the updates);
        #   continuing:            accept M-step + E-step.
        run = ~carry.done
        apply_estep = run & ~stop

        def pick(continuing, stopping, frozen):
            return jax.tree.map(
                lambda c, s, f: jnp.where(
                    apply_estep, c, jnp.where(run, s, f)
                ),
                continuing, stopping, frozen,
            )

        return Carry(
            theta=pick(theta_new, res.x, carry.theta),
            loss=jnp.where(run, loss, carry.loss),
            prev_loss=jnp.where(run, loss, carry.prev_loss),
            state=pick(new_state, carry.state, carry.state),
            prior=pick(prior_new, carry.prior, carry.prior),
            done=carry.done | stop,
            n_outer=carry.n_outer + run.astype(jnp.int32),
            ok=carry.ok & (res.ok | carry.done),
        )

    def body_warm(carry, it):
        return one_round(carry, warmup_evals, is_first=(it == 0)), None

    def body_main(carry, it):
        return one_round(carry, sub_opt_iter, is_first=jnp.asarray(False)), None

    init = Carry(
        theta=theta0,
        loss=jnp.asarray(jnp.inf, dtype),
        prev_loss=jnp.asarray(jnp.inf, dtype),
        state=st0,
        prior=prior0,
        done=jnp.asarray(False),
        n_outer=jnp.asarray(0, jnp.int32),
        ok=jnp.asarray(True),
    )
    n_warm = min(warmup_iters, outer_iters)
    carry, _ = lax.scan(body_warm, init, jnp.arange(n_warm))
    n_main = max(0, outer_iters - n_warm)
    if n_main > 0:
        carry, _ = lax.scan(body_main, carry, jnp.arange(n_main))

    return VarEMResult(
        theta=carry.theta,
        loss=carry.loss,
        state=carry.state,
        prior=carry.prior,
        n_outer=carry.n_outer,
        ok=carry.ok & jnp.isfinite(carry.loss),
    )
