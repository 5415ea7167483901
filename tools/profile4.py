"""Standalone timings of the pallas chol/tri_inv kernels vs XLA, with a
batch-tile sweep (MEDGP_CHOL_BT)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, STEPS = 64, 512, 8


def main():
    import jax
    import jax.numpy as jnp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(here, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    Ks = jax.block_until_ready(
        jnp.einsum("bij,bkj->bik", A, A,
                   precision=jax.lax.Precision.HIGHEST) + 10.0 * jnp.eye(N)
    )
    y = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))
    Ls = jax.block_until_ready(jnp.linalg.cholesky(Ks))

    def timed(name, step_fn, x0):
        @jax.jit
        def prog(x):
            def body(c, _):
                return step_fn(c), ()
            out, _ = jax.lax.scan(body, x, None, length=STEPS)
            return out

        out = jax.block_until_ready(prog(x0))
        t0 = time.perf_counter()
        out = jax.block_until_ready(prog(x0))
        dt = (time.perf_counter() - t0) / STEPS
        print("PROF " + json.dumps(
            dict(component=name, ms=round(dt * 1e3, 3))), flush=True)

    for bt in (4, 8, 16):
        os.environ["MEDGP_CHOL_BT"] = str(bt)
        import importlib

        import medgp_tpu.ops.pallas_chol as pc
        importlib.reload(pc)

        def ch(c, pc=pc):
            L, a = pc.chol_solve(Ks + c[:, None, None] * 1e-6, y)
            return c + 1e-20 * (L[:, 0, 0] + a[:, 0])

        try:
            timed(f"pallas_chol_solve_bt{bt}", ch, jnp.ones(B, jnp.float32))
        except Exception as e:
            print(f"FAIL bt{bt}: {type(e).__name__} {str(e)[:200]}",
                  flush=True)

        def ti(c, pc=pc):
            X = pc.tri_inv(Ls + c[:, None, None] * 1e-20)
            return c + 1e-20 * X[:, 0, 0]

        try:
            timed(f"pallas_tri_inv_bt{bt}", ti, jnp.ones(B, jnp.float32))
        except Exception as e:
            print(f"FAIL ti bt{bt}: {type(e).__name__} {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
