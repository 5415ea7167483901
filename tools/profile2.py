"""Profile round 2: precision-mode and transcendental micro-benchmarks.

Questions (feeding the r4 roofline work):
  1. What does matmul precision (DEFAULT/HIGH/HIGHEST) do to the batched
     syrk (Kinv = Linv^T Linv) and to cholesky/trsm expansions?
  2. What do raw exp/cos/sqrt maps cost at (64, 512, 512)? (the gram's
     transcendental floor)
  3. Does a single-tile pallas gram grid beat the 256-tile grid?
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N = 64, 512
STEPS = 8


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

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    Ks = jnp.einsum(
        "bij,bkj->bik", A, A, precision=jax.lax.Precision.HIGHEST
    ) + 10.0 * jnp.eye(N)
    Ks = jax.block_until_ready(Ks)

    def timed(name, step_fn, x0, flops):
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
        print("PROF " + json.dumps(dict(
            component=name, ms=round(dt * 1e3, 3),
            tflops=round(flops / dt / 1e12, 2))), flush=True)
        return dt

    f32 = jnp.float32
    syrk_fl = B * 2 * N**3

    for prec in ("default", "high", "highest"):
        p = dict(default=jax.lax.Precision.DEFAULT,
                 high=jax.lax.Precision.HIGH,
                 highest=jax.lax.Precision.HIGHEST)[prec]

        def mm(c, p=p):
            M = jnp.einsum("bij,bik->bjk", A + c[:, None, None] * 1e-20, A,
                           precision=p)
            return c + 1e-20 * M[:, 0, 0]

        timed(f"syrk_{prec}", mm, jnp.ones(B, f32), syrk_fl)

    # chol under each default_matmul_precision
    for prec in ("high", "highest"):
        with jax.default_matmul_precision(prec):
            def ch(c):
                L = jnp.linalg.cholesky(Ks + c[:, None, None] * 1e-6)
                return c + 1e-20 * L[:, 0, 0]

            timed(f"chol_prec_{prec}", ch, jnp.ones(B, f32), B * N**3 / 3)

            def tr(c):
                from jax.scipy.linalg import solve_triangular
                Linv = jax.vmap(lambda L: solve_triangular(
                    L, jnp.eye(N, dtype=f32), lower=True))(
                        Ks + c[:, None, None] * 1e-20)
                return c + 1e-20 * Linv[:, 0, 0]

            timed(f"trsm_prec_{prec}", tr, jnp.ones(B, f32), B * N**3 / 2)

    # raw transcendental maps
    X = jnp.abs(A) * 0.01

    def m_exp(c):
        return c * 0.5 + 0.5 * jnp.exp(-X - c[:, None, None] * 1e-20)[:, 0, :]

    timed("map_exp", m_exp, jnp.ones((B, N), f32), B * N * N)

    def m_cos(c):
        return c * 0.5 + 0.5 * jnp.cos(X + c[:, None, None] * 1e-20)[:, 0, :]

    timed("map_cos", m_cos, jnp.ones((B, N), f32), B * N * N)

    def m_sqrt(c):
        return c * 0.5 + 0.5 * jnp.sqrt(X + c[:, None, None] * 1e-20)[:, 0, :]

    timed("map_sqrt", m_sqrt, jnp.ones((B, N), f32), B * N * N)

    def m_5exp(c):
        acc = jnp.zeros_like(X)
        for q in range(5):
            acc = acc + jnp.exp(-X * (1.0 + q) - c[:, None, None] * 1e-20)
        return c * 0.5 + 0.5 * acc[:, 0, :]

    timed("map_5exp", m_5exp, jnp.ones((B, N), f32), 5 * B * N * N)

    # full old-style per-q map set: sqrt + cos + exp per q (5x)
    def m_5full(c):
        acc = jnp.zeros_like(X)
        for q in range(5):
            r = jnp.sqrt(X + c[:, None, None] * 1e-20)
            acc = acc + jnp.cos(r * (1.0 + q)) * jnp.exp(-X * (1.0 + q))
        return c * 0.5 + 0.5 * acc[:, 0, :]

    timed("map_5full", m_5full, jnp.ones((B, N), f32), 15 * B * N * N)


if __name__ == "__main__":
    main()
