"""Round-5 glue accounting: the objective+grad chain vs the sum of its
kernel parts at the bench shape (B=128, n=512, canonical Q=5 D=24 R=8).

VERDICT r4 weak #3: round 4 landed at ~40% of the composed per-op bound
and named "inter-kernel XLA glue" without quantifying it. This times, with
the bench's chained-scan protocol (step i+1 depends on step i):

  obj_grad     the full MAP objective value_and_grad  (the bench unit)
  gram_fwd_m   masked fused gram kernel (round-5 epilogue)
  chol_solve   fused Pallas factorization chain (L, alpha, linvd)
  tri/qmat     fused Q-matrix backward kernel
  gram_bwd     fused gram VJP kernel
  prior        log_prior + grad (pure VPU, H-sized)

glue = obj_grad - (gram_fwd_m + chol_solve + qmat + gram_bwd + prior):
everything XLA inserts between kernels (retry-loop scaffolding,
where-selects, y_eff/noise multiplies, logdet/quad reductions, scan plumbing).

Run detached on the chip:
  setsid nohup python tools/profile5.py > /tmp/profile5.log 2>&1 &
Optional env: PROF_B, PROF_N, MEDGP_CHOL_BT, MEDGP_GRAM_BT.
(For the composed chain alone under different kernel-tile env settings,
use tools/obj_chain_time.py — much faster turnaround.)
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
B = int(os.environ.get("PROF_B", "128"))
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


def chained(fn, seed_args, steps=STEPS):
    """Time fn under a dependent scan (perturb the first float arg by a
    tiny function of the previous output sum)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, _):
            a0 = carry[0]
            out = fn(*carry)
            s = 0.0
            for o in jax.tree.leaves(out):
                s = s + jnp.sum(o.astype(jnp.float32)) * 1e-20
            a0 = a0 + s.astype(a0.dtype)
            return (a0,) + tuple(carry[1:]), s

        carry, ss = jax.lax.scan(body, seed_args, None, length=steps)
        return ss

    out = run(seed_args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = run(seed_args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import (
        PatientData,
        noise_variance,
        noiseless_gram,
        objective_and_grad,
    )
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior, log_prior
    from medgp_tpu.ops import nlml as nlml_mod
    from medgp_tpu.ops.pallas_chol import chol_solve, qmat

    print(f"backend={jax.default_backend()} B={B} N={N}", flush=True)
    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 168.0, size=(B, N)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(B, N)).astype(np.int32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    mask = np.ones((B, N), np.float32)
    thetas = (rng.normal(size=(B, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)
    args = tuple(map(jnp.asarray, (thetas, t, y, meta, mask)))

    res = {}

    # full objective+grad (the bench unit)
    def obj(th, t1, y1, m1, k1):
        def one(theta, tt, yy, mm, kk):
            data = PatientData(t=tt, y=yy, meta=mm, mask=kk)
            return objective_and_grad(spec, data, prior=prior)(theta)

        return jax.vmap(one)(th, t1, y1, m1, k1)

    res["obj_grad"] = chained(obj, args)

    # masked gram forward
    def gfwd(th, t1, y1, m1, k1):
        def one(theta, tt, yy, mm, kk):
            data = PatientData(t=tt, y=yy, meta=mm, mask=kk)
            return noiseless_gram(spec, theta, data, masked=True)

        return jax.vmap(one)(th, t1, y1, m1, k1)

    res["gram_fwd_m"] = chained(gfwd, args)

    # fused factorization chain
    K0 = np.asarray(
        jax.jit(gfwd)(*args)
    )
    nv0 = np.asarray(
        jax.jit(
            lambda th, m1: jax.vmap(
                lambda theta, mm: noise_variance(spec, theta, mm)
            )(th, m1)
        )(args[0], args[3])
    )
    cargs = (jnp.asarray(K0), jnp.asarray(nv0), args[2])

    def chol_fn(Kb, nvb, yb):
        return chol_solve(Kb, nvb, yb)

    res["chol_solve"] = chained(chol_fn, cargs)

    L0, a0, d0 = jax.jit(chol_fn)(*cargs)
    qargs = (L0, d0, a0, jnp.ones((B, 1), jnp.float32))

    def qmat_fn(Lb, db, ab, cb):
        return qmat(Lb, db, ab, cb)

    res["qmat"] = chained(qmat_fn, qargs)

    # gram backward (VJP at fixed cotangent)
    ct = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))

    def gbwd(ctb, t1, y1, m1, k1):
        def one(cc, tt, yy, mm, kk):
            data = PatientData(t=tt, y=yy, meta=mm, mask=kk)

            def f(theta):
                return noiseless_gram(spec, theta, data, masked=True)

            _, vjp = jax.vjp(f, args[0][0])
            return vjp(cc)

        return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(ctb, t1, y1, m1, k1)

    res["gram_bwd"] = chained(gbwd, (ct,) + args[1:])

    # prior value+grad (VPU, H-sized)
    def pr(th, *_):
        def one(theta):
            return jax.value_and_grad(lambda x: log_prior(prior, x))(theta)

        return jax.vmap(one)(th)

    res["prior"] = chained(pr, args)

    parts = (
        res["gram_fwd_m"] + res["chol_solve"] + res["qmat"]
        + res["gram_bwd"] + res["prior"]
    )
    res["parts_sum"] = parts
    res["glue"] = res["obj_grad"] - parts
    for k, v in res.items():
        print(
            json.dumps(
                dict(component=k, ms_per_batch=v * 1e3,
                     evals_per_sec=B / v if v > 0 else None)
            ),
            flush=True,
        )
    print(
        f"SUMMARY obj={res['obj_grad']*1e3:.2f}ms parts={parts*1e3:.2f}ms "
        f"glue={res['glue']*1e3:.2f}ms "
        f"({100*res['glue']/res['obj_grad']:.0f}% of the eval)",
        flush=True,
    )


if __name__ == "__main__":
    main()
