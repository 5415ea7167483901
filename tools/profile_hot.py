"""Roofline decomposition of the canonical objective+grad evaluation.

Times each sub-program of the hot chain (VERDICT r3 missing #1) at the
canonical bench shape (B=64, n=512, Q=5 D=24 R=8, H=1114, fp32) on the
attached backend, using the bench's chained-scan protocol (step i+1 depends
on step i) so async dispatch cannot hide execution time.

Components timed (each as its own jitted chained program):
  gram_fwd        noiseless gram build only (production path, Pallas on TPU)
  gram_vjp        gram VJP wrt theta at a fixed cotangent
  chol            jnp.linalg.cholesky of the batched PSD matrix
  trsm_I          solve_triangular(L, I)  (the backward's L^-1)
  matmul_nn       batched (n,n)@(n,n) fp32 matmul (Kinv = Linv^T Linv proxy)
  cho_solve_y     cho_solve((L,True), y)  (alpha)
  nlml_fwd        full masked_nlml forward
  obj_grad        full MAP objective value_and_grad (the bench unit)

Writes one JSON line per component to the log; prints a summary table with
an estimated FLOP count and achieved FLOP/s per component.

Run detached on the chip:
  setsid nohup python tools/profile_hot.py > /tmp/profile_hot.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q, D, R = 5, 24, 8
H = D + Q * (D * R + 2 + D)
B = int(os.environ.get("PROF_B", "64"))
N = int(os.environ.get("PROF_N", "512"))
STEPS = int(os.environ.get("PROF_STEPS", "8"))


def _enable_cache():
    import jax

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, nlml_fn, noiseless_gram
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 168.0, size=(B, N)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(B, N)).astype(np.int32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    thetas = (rng.normal(size=(B, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)
    args = tuple(map(jnp.asarray, (thetas, t, y, meta, mask)))

    # fixed batched PSD matrix + L for the isolated linalg components
    def _one_gram(theta, t1, y1, m1, k1):
        data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
        K = noiseless_gram(spec, theta, data)
        from medgp_tpu.models.gp import noise_variance
        nv = noise_variance(spec, theta, m1)
        return K + jnp.diag(nv) + 1e-3 * jnp.eye(N, dtype=K.dtype)

    Ks = jax.jit(jax.vmap(_one_gram))(*args)
    Ls = jax.jit(jnp.linalg.cholesky)(Ks)
    Ks, Ls = jax.block_until_ready((Ks, Ls))
    eyeN = jnp.eye(N, dtype=jnp.float32)

    def timed_chain(name, step_fn, x0, flops_per_step):
        """step_fn: carry -> carry (one full-batch unit of work).
        Chains STEPS of them in a scan; returns seconds per step."""

        @jax.jit
        def prog(x):
            def body(c, _):
                c2 = step_fn(c)
                return c2, ()

            out, _ = jax.lax.scan(body, x, None, length=STEPS)
            return out

        out = jax.block_until_ready(prog(x0))  # compile + warm
        t0 = time.perf_counter()
        out = jax.block_until_ready(prog(x0))
        dt = (time.perf_counter() - t0) / STEPS
        rec = dict(
            component=name, ms_per_step=round(dt * 1e3, 3),
            gflops=round(flops_per_step / 1e9, 2),
            achieved_tflops=round(flops_per_step / dt / 1e12, 3),
        )
        print("PROF " + json.dumps(rec), flush=True)
        return dt

    f32 = jnp.float32

    # --- gram forward (production path) ---
    def gram_step(c):
        th = c
        def one(theta, t1, y1, m1, k1):
            data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
            return noiseless_gram(spec, theta, data)
        Kb = jax.vmap(one)(th, *args[1:])
        # dependency: fold a reduction of K back into theta
        return th + 1e-20 * jnp.sum(Kb, axis=(1, 2))[:, None]

    # gram flops (rough): per element per q: ~10 ops (dist, cos, exp, fma)
    gram_flops = B * Q * N * N * 10
    timed_chain("gram_fwd", gram_step, args[0], gram_flops)

    # --- gram VJP wrt theta ---
    ct = jnp.ones((N, N), f32)

    def gramvjp_step(c):
        th = c
        def one(theta, t1, y1, m1, k1):
            data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
            _, vjp = jax.vjp(lambda x: noiseless_gram(spec, x, data), theta)
            return vjp(ct)[0]
        g = jax.vmap(one)(th, *args[1:])
        return th + 1e-20 * g

    timed_chain("gram_vjp", gramvjp_step, args[0], 2 * gram_flops)

    # --- isolated linalg ---
    def chol_step(c):
        L = jnp.linalg.cholesky(Ks + c[:, None, None] * 1e-6)
        return c + 1e-20 * L[:, 0, 0]

    timed_chain("chol", chol_step, jnp.ones(B, f32), B * N**3 / 3)

    def trsm_step(c):
        from jax.scipy.linalg import solve_triangular
        Linv = jax.vmap(
            lambda L: solve_triangular(L, eyeN, lower=True)
        )(Ls + c[:, None, None] * 1e-20)
        return c + 1e-20 * Linv[:, 0, 0]

    timed_chain("trsm_I", trsm_step, jnp.ones(B, f32), B * N**3 / 2)

    def mm_step(c):
        A = Ls + c[:, None, None] * 1e-20
        M = jnp.einsum("bij,bik->bjk", A, A)
        return c + 1e-20 * M[:, 0, 0]

    timed_chain("matmul_nn", mm_step, jnp.ones(B, f32), B * 2 * N**3)

    def chosolve_step(c):
        from jax.scipy.linalg import cho_solve
        a = jax.vmap(lambda L, yy: cho_solve((L, True), yy))(Ls, args[2] + c)
        return c + 1e-20 * a

    timed_chain("cho_solve_y", chosolve_step, jnp.zeros((B, N), f32),
                B * 2 * N * N)

    # --- full NLML forward ---
    def nlml_step(c):
        th = c
        def one(theta, t1, y1, m1, k1):
            data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
            return nlml_fn(spec, data, prior=prior)(theta)[0]
        v = jax.vmap(one)(th, *args[1:])
        return th + 1e-20 * v[:, None]

    nlml_flops = gram_flops + B * (N**3 / 3 + 2 * N * N)
    timed_chain("nlml_fwd", nlml_step, args[0], nlml_flops)

    # --- full objective+grad (bench unit) ---
    def og_step(c):
        th = c
        def one(theta, t1, y1, m1, k1):
            data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
            loss = lambda x: nlml_fn(spec, data, prior=prior)(x)[0]
            return jax.value_and_grad(loss)(theta)
        v, g = jax.vmap(one)(th, *args[1:])
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return th - 1e-6 * g

    og_flops = nlml_flops + B * (N**3 / 2 + 2 * N**3) + 2 * gram_flops
    dt = timed_chain("obj_grad", og_step, args[0], og_flops)
    print(f"SUMMARY evals_per_sec={B / dt:.1f}", flush=True)


if __name__ == "__main__":
    main()
