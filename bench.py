"""Benchmark: LMC-SM MAP objective+gradient evaluations per second per chip.

The unit of work is the quantity every stage of the framework reduces to —
one evaluation of the canonical-scale LMC-SM MAP objective (Q=5, D=24, R=8,
H=1114 hypers) with its full hyperparameter gradient on one patient with
n=512 observations. The reference spends O(H n^2) in ~1114 hand-coded
per-hyper gradient maps per evaluation (c_kernel_LMC_SM.cpp:198-327) plus
O(n^3) factorizations, serially per patient; we spend one reverse-mode pass
over the batched gram+Cholesky NLML, vmapped over patients.

Measurement protocol:
  * TPU path: vmapped jax.value_and_grad of the MAP objective over a B=64
    patient batch, CHAINED inside one jitted lax.scan (step i+1's thetas
    depend on step i's gradients, exactly like an optimizer loop) so the
    device must execute every step sequentially; timed after compile warmup
    with a single host transfer at the end. The data dependency makes the
    number robust against async-dispatch runtimes whose block_until_ready
    does not gate on remote completion, and against any dispatch-level
    caching of repeated identical executions -> evaluations/sec/chip.
  * Baseline: the reference *algorithm* (analytic per-hyper gradient maps,
    Q-matrix from two GEMMs, fp32 BLAS) transcribed to numpy and timed on
    this host's CPU at the same (n, Q, D, R) -> evaluations/sec. This measures
    the reference's computational strategy on the hardware available here;
    the reference's own budget tables (days per patient on 10 CPU threads,
    scripts/slurm_della.json) are consistent with it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

Q, D, R = 5, 24, 8
N_OBS = 512
BATCH = 64
H = D + Q * (D * R + 2 + D)
REF_PI = 3.14159265


def _make_problem(seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 168.0, size=N_OBS)).astype(np.float32)
    meta = rng.integers(0, D, size=N_OBS).astype(np.int32)
    meta[: 2 * D] = np.tile(np.arange(D), 2)
    y = rng.normal(size=N_OBS).astype(np.float32)
    theta = (rng.normal(size=H) * 0.1).astype(np.float64)
    theta[:D] = np.log(0.3)
    return t, meta, y, theta


# --------------------------------------------------------------------------
# CPU baseline: the reference's analytic-gradient algorithm in numpy/BLAS
# --------------------------------------------------------------------------

def _cpu_reference_eval(t, meta, y, theta):
    """One NLML+full-gradient evaluation, reference strategy:
    gram -> potrf -> alpha/L^-1 -> Q = K^-1 - aa^T -> per-hyper dK maps."""
    import scipy.linalg as sla

    noise = np.exp(theta[:D]).astype(np.float32)
    A = theta[D : D + Q * D * R].reshape(Q, D, R)
    mu = np.exp(theta[D + Q * D * R : D + Q * D * R + Q])
    v = np.exp(theta[D + Q * (D * R + 1) : D + Q * (D * R + 2)])
    kap = np.exp(theta[D + Q * (D * R + 2) :]).reshape(Q, D)

    n = len(t)
    rsq = (t[:, None] - t[None, :]).astype(np.float32) ** 2
    r = np.sqrt(rsq)
    B = np.einsum("qdr,qer->qde", A, A).astype(np.float32)
    B[:, np.arange(D), np.arange(D)] += kap
    kq = [
        (np.cos(2 * REF_PI * r * mu[q]) *
         np.exp(-2 * (REF_PI * v[q]) ** 2 * rsq)).astype(np.float32)
        for q in range(Q)
    ]
    K = np.zeros((n, n), np.float32)
    for q in range(Q):
        K += B[q][np.ix_(meta, meta)] * kq[q]
    K[np.arange(n), np.arange(n)] += (noise**2)[meta]

    L = np.linalg.cholesky(K)
    alpha = sla.cho_solve((L, True), y.astype(np.float32))
    Linv = sla.solve_triangular(L, np.eye(n, dtype=np.float32), lower=True)
    nlml = (
        0.5 * float(y @ alpha)
        + float(np.log(np.diag(L)).sum())
        + 0.5 * n * np.log(2 * REF_PI)
    )
    Qm = Linv.T @ Linv - np.outer(alpha, alpha)  # two n^3 GEMM-class ops

    grads = np.zeros(H)
    # lik grads
    for i in range(D):
        sel = meta == i
        grads[i] = float((noise[i] ** 2) * np.diag(Qm)[sel].sum())
    # kernel grads: one n x n map per hyper, dotted with Qm (the hot loop)
    gi = D
    for q in range(Q):
        for d in range(D):
            for rr in range(R):
                dB = np.zeros((D, D), np.float32)
                dB[:, d] += A[q, :, rr].astype(np.float32)
                dB[d, :] += A[q, :, rr].astype(np.float32)
                mp = dB[np.ix_(meta, meta)] * kq[q]
                grads[gi] = 0.5 * float(np.tensordot(Qm, mp))
                gi += 1
    for q in range(Q):  # mu
        dmu = 2 * REF_PI * r * mu[q]
        mp = B[q][np.ix_(meta, meta)] * (
            -dmu * np.sin(dmu) * np.exp(-2 * (REF_PI * v[q]) ** 2 * rsq)
        ).astype(np.float32)
        grads[gi] = 0.5 * float(np.tensordot(Qm, mp)); gi += 1
    for q in range(Q):  # v
        d2 = (REF_PI * v[q]) ** 2 * rsq
        mp = B[q][np.ix_(meta, meta)] * (
            -4 * d2 * np.cos(2 * REF_PI * r * mu[q]) * np.exp(-2 * d2)
        ).astype(np.float32)
        grads[gi] = 0.5 * float(np.tensordot(Qm, mp)); gi += 1
    for q in range(Q):  # kappa
        for d in range(D):
            dB = np.zeros((D, D), np.float32)
            dB[d, d] = kap[q, d]
            mp = dB[np.ix_(meta, meta)] * kq[q]
            grads[gi] = 0.5 * float(np.tensordot(Qm, mp)); gi += 1
    return nlml, grads


def measure_cpu_baseline(n_evals=2):
    t, meta, y, theta = _make_problem()
    _cpu_reference_eval(t, meta, y, theta)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_evals):
        _cpu_reference_eval(t, meta, y, theta)
    dt = (time.perf_counter() - t0) / n_evals
    return 1.0 / dt


# --------------------------------------------------------------------------
# TPU measurement
# --------------------------------------------------------------------------

def measure_tpu(steps=32):
    import functools

    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, nlml_fn
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    rng = np.random.default_rng(1)

    t = np.sort(rng.uniform(0, 168.0, size=(BATCH, N_OBS)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(BATCH, N_OBS)).astype(np.int32)
    y = rng.normal(size=(BATCH, N_OBS)).astype(np.float32)
    mask = np.ones((BATCH, N_OBS), np.float32)
    thetas = (rng.normal(size=(BATCH, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)

    @functools.partial(jax.jit, static_argnums=(5,))
    def chained(thetas, t, y, meta, mask, n_inner):
        def body(th, _):
            def one(theta, t1, y1, m1, k1):
                data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
                loss = lambda x: nlml_fn(spec, data, prior=prior)(x)[0]
                return jax.value_and_grad(loss)(theta)

            v, g = jax.vmap(one)(th, t, y, meta, mask)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            # tiny dependent update: step i+1 must wait for step i's grads
            return th - 1e-6 * g, jnp.sum(v)

        th, vs = jax.lax.scan(body, thetas, None, length=n_inner)
        return th, vs

    args = tuple(map(jnp.asarray, (thetas, t, y, meta, mask)))
    out = chained(*args, steps)
    np.asarray(out[0])  # warmup incl. the result transfer
    t0 = time.perf_counter()
    out = chained(*args, steps)
    vs = np.asarray(out[1])  # single forced transfer gates on all steps
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(vs).all(), "benchmark objective went non-finite"
    return BATCH / dt


def main():
    tpu_rate = measure_tpu()
    cpu_rate = measure_cpu_baseline()
    print(
        json.dumps(
            dict(
                metric="lmcsm_map_objective_grad_evals_per_sec_per_chip",
                value=round(tpu_rate, 3),
                unit=f"evals/s (Q={Q} D={D} R={R} H={H} n={N_OBS})",
                vs_baseline=round(tpu_rate / cpu_rate, 2),
            )
        )
    )


if __name__ == "__main__":
    main()
