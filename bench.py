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
  * Sampler path: vmapped multi-patient HMC (16 chains, 16 leapfrog steps
    per draw, canonical scale) -> posterior samples/sec/chip, the second
    BASELINE.json metric.
  * Baseline: the reference *algorithm* (analytic per-hyper gradient maps,
    Q-matrix from two GEMMs, fp32 BLAS) transcribed to numpy and timed on
    this host's CPU at the same (n, Q, D, R). The measured constant is cached
    in BENCH_CPU_BASELINE.json (set MEDGP_BENCH_CPU=measure to re-measure);
    the reference's own budget tables (days per patient on 10 CPU threads,
    scripts/slurm_della.json) are consistent with it.

Capture robustness (round-1 postmortem: rc=124, no output; the TPU tunnel
also stalls transiently for minutes):
  * each device measurement runs in a CHILD process with a per-attempt
    timeout and is retried on stall — a wedged tunnel connection costs one
    attempt, not the round;
  * the JAX persistent compilation cache is enabled at .jax_cache/, so the
    ~6-minute cold compile happens at most once per machine (a timed-out
    cold attempt still leaves sub-program cache entries for the retry);
  * the parent emits the single JSON result line with whatever metrics
    finished when MEDGP_BENCH_BUDGET seconds (default 480) run out or when
    it receives SIGTERM/SIGINT (driver kills still capture the result);
  * step counts are env-tunable (MEDGP_BENCH_STEPS, MEDGP_BENCH_HMC_SAMPLES)
    and default small enough to finish warm in well under a minute.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "hmc_samples_per_sec_per_chip"}.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

Q, D, R = 5, 24, 8
N_OBS = 512
BATCH = 64
H = D + Q * (D * R + 2 + D)
REF_PI = 3.14159265

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPU_BASELINE_FILE = os.path.join(_HERE, "BENCH_CPU_BASELINE.json")

_RESULT = {}
_EMITTED = False


def _emit():
    global _EMITTED
    if _EMITTED or "value" not in _RESULT:
        return False
    print(json.dumps(_RESULT), flush=True)
    _EMITTED = True
    return True


def _enable_compile_cache():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never a failure
        print(f"compile cache unavailable: {e}", file=sys.stderr)


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


def measure_cpu_baseline(n_evals=1):
    t, meta, y, theta = _make_problem()
    _cpu_reference_eval(t, meta, y, theta)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_evals):
        _cpu_reference_eval(t, meta, y, theta)
    dt = (time.perf_counter() - t0) / n_evals
    return 1.0 / dt


def cpu_baseline_rate():
    """Cached-constant CPU baseline (evals/s). The live measurement costs
    ~10s of single-thread numpy and was the round-1 timeout's accomplice;
    re-measure with MEDGP_BENCH_CPU=measure (result is re-cached)."""
    mode = os.environ.get("MEDGP_BENCH_CPU", "cached")
    if mode != "measure" and os.path.exists(_CPU_BASELINE_FILE):
        with open(_CPU_BASELINE_FILE) as f:
            return float(json.load(f)["evals_per_sec"])
    rate = measure_cpu_baseline()
    try:
        with open(_CPU_BASELINE_FILE, "w") as f:
            json.dump(
                dict(
                    evals_per_sec=rate,
                    protocol=(
                        "reference analytic-gradient strategy in numpy/BLAS, "
                        f"1 warm eval at Q={Q} D={D} R={R} H={H} n={N_OBS}, "
                        "single process on this host's CPU"
                    ),
                ),
                f,
            )
    except OSError:
        pass
    return rate


# --------------------------------------------------------------------------
# TPU measurement #1: MAP objective+gradient evals/sec
# --------------------------------------------------------------------------

def measure_tpu(steps=None):
    import functools

    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, nlml_fn
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    if steps is None:
        steps = int(os.environ.get("MEDGP_BENCH_STEPS", "16"))

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


# --------------------------------------------------------------------------
# TPU measurement #2: HMC posterior samples/sec (BASELINE.json metric)
# --------------------------------------------------------------------------

def measure_hmc(num_samples=None, batch=16, num_leapfrog=16):
    import jax
    import jax.numpy as jnp

    from medgp_tpu.infer.hmc import hmc_sample, make_potential
    from medgp_tpu.models.gp import PatientData
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    if num_samples is None:
        num_samples = int(os.environ.get("MEDGP_BENCH_HMC_SAMPLES", "8"))

    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    gmask = prior.grad_mask()
    rng = np.random.default_rng(2)

    t = np.sort(rng.uniform(0, 168.0, size=(batch, N_OBS)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(batch, N_OBS)).astype(np.int32)
    y = rng.normal(size=(batch, N_OBS)).astype(np.float32)
    thetas = (rng.normal(size=(batch, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)

    def one(theta, t1, y1, m1, key):
        data = PatientData(t=t1, y=y1, meta=m1, mask=jnp.ones_like(t1))
        pg = make_potential(spec, data, prior=prior)
        res = hmc_sample(
            pg, theta, key,
            num_warmup=2, num_samples=num_samples,
            num_leapfrog=num_leapfrog, grad_mask=gmask,
        )
        return res.samples[-1], res.accept_rate

    f = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    args = tuple(map(jnp.asarray, (thetas, t, y, meta))) + (keys,)
    out = f(*args)
    np.asarray(out[0])  # compile + execute warmup
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    # conservative: the 2 warmup draws inside the timed call are not counted
    return batch * num_samples / dt


# --------------------------------------------------------------------------
# Orchestration: child processes with timeouts + retries; parent never
# blocks in uninterruptible native code.
# --------------------------------------------------------------------------

_CHILD = None  # current child Popen, terminated on parent signal


def _child_main(mode):
    _enable_compile_cache()
    rate = measure_tpu() if mode == "tpu" else measure_hmc()
    print(f"RATE {rate!r}", flush=True)


def _run_child(mode, timeout):
    """One measurement attempt in a subprocess; None on stall/failure."""
    global _CHILD
    t0 = time.monotonic()
    env = dict(os.environ)
    # Hash randomization perturbs trace-time dict/set ordering, which
    # perturbs the HLO and thus the persistent-cache key — without this,
    # "warm" runs recompile remotely (~75-400s+ under pool load).
    env["PYTHONHASHSEED"] = "0"
    _CHILD = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", mode],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
    )
    try:
        out, _ = _CHILD.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        _CHILD.kill()
        _CHILD.communicate()
        print(f"bench[{mode}]: attempt stalled after {timeout:.0f}s",
              file=sys.stderr)
        return None
    finally:
        _CHILD = None
    rate = None
    for line in out.strip().splitlines():
        if line.startswith("RATE "):
            rate = float(line[5:])
    print(f"bench[{mode}]: {rate} in {time.monotonic() - t0:.1f}s",
          file=sys.stderr)
    return rate


def main():
    budget = float(os.environ.get("MEDGP_BENCH_BUDGET", "480"))
    attempt_timeout = float(os.environ.get("MEDGP_BENCH_ATTEMPT", "150"))
    deadline = time.monotonic() + budget

    def on_signal(signum, frame):
        if _CHILD is not None:
            try:
                _CHILD.kill()
            except OSError:
                pass
        _emit()
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    def attempts(mode, reserve):
        """Retry `mode` until it yields a rate or the budget (minus a
        reserve for later stages) is gone. The first attempt gets extra
        headroom for a cold compile."""
        first = True
        while True:
            remaining = deadline - time.monotonic() - reserve
            if remaining <= 15:
                return None
            per = min(remaining, attempt_timeout * (2.5 if first else 1.0))
            first = False
            rate = _run_child(mode, per)
            if rate is not None:
                return rate

    tpu_rate = attempts("tpu", reserve=10)
    if tpu_rate is None:
        print("bench: primary metric never completed", file=sys.stderr)
        sys.exit(1)
    cpu_rate = cpu_baseline_rate()
    _RESULT.update(
        metric="lmcsm_map_objective_grad_evals_per_sec_per_chip",
        value=round(tpu_rate, 3),
        unit=f"evals/s (Q={Q} D={D} R={R} H={H} n={N_OBS})",
        vs_baseline=round(tpu_rate / cpu_rate, 2),
    )

    hmc_rate = attempts("hmc", reserve=5)
    if hmc_rate is not None:
        _RESULT["hmc_samples_per_sec_per_chip"] = round(hmc_rate, 3)

    _emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child_main(sys.argv[2])
    else:
        main()
