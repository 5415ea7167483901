"""A/B the Pallas factorization chain against the XLA path on chip.

Correctness: value+grad of the canonical MAP objective with
MEDGP_PALLAS_CHOL on vs off (same inputs, fp32 tolerances).
Speed: the bench obj_grad unit with the pallas chain enabled.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q, D, R = 5, 24, 8
H = D + Q * (D * R + 2 + D)
B, N, STEPS = 64, 512, 8


def _cache():
    import jax

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main():
    _cache()
    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, nlml_fn
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    print(f"backend={jax.default_backend()}", flush=True)
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

    def build(pallas: bool):
        os.environ["MEDGP_PALLAS_CHOL"] = "1" if pallas else "0"

        @jax.jit
        def vg(th, t, y, meta, mask):
            def one(theta, t1, y1, m1, k1):
                data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
                loss = lambda x: nlml_fn(spec, data, prior=prior)(x)[0]
                return jax.value_and_grad(loss)(theta)

            return jax.vmap(one)(th, t, y, meta, mask)

        return vg

    # correctness first
    v0, g0 = jax.block_until_ready(build(False)(*args))
    v1, g1 = jax.block_until_ready(build(True)(*args))
    dv = np.abs(np.asarray(v1) - np.asarray(v0)) / np.abs(np.asarray(v0))
    gn0 = np.abs(np.asarray(g0)).max()
    dg = np.abs(np.asarray(g1) - np.asarray(g0)).max() / gn0
    print(f"CHECK value_rel_err={dv.max():.3e} grad_rel_err={dg:.3e}",
          flush=True)

    # speed: chained protocol with pallas on
    os.environ["MEDGP_PALLAS_CHOL"] = "1"

    @jax.jit
    def chained(th, t, y, meta, mask):
        def body(c, _):
            def one(theta, t1, y1, m1, k1):
                data = PatientData(t=t1, y=y1, meta=m1, mask=k1)
                loss = lambda x: nlml_fn(spec, data, prior=prior)(x)[0]
                return jax.value_and_grad(loss)(theta)

            v, g = jax.vmap(one)(c, t, y, meta, mask)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            return c - 1e-6 * g, jnp.sum(v)

        out, vs = jax.lax.scan(body, th, None, length=STEPS)
        return out, vs

    out = jax.block_until_ready(chained(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(chained(*args))
    dt = (time.perf_counter() - t0) / STEPS
    print("PROF " + json.dumps(dict(
        component="obj_grad_pallas", ms_per_step=round(dt * 1e3, 3),
        evals_per_sec=round(B / dt, 1))), flush=True)


if __name__ == "__main__":
    main()
