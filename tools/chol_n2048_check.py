"""Round-5: validate + time the fused Cholesky chain at n=2048 (the
mid-size bucket size that falls back to XLA). Correctness vs the XLA
oracle, then chained timing of both paths.

MEASURED RESULT (v5e, B=4): bit-correct (rel err ~4e-7 on L, ~1e-6 on
alpha) but 2.3x SLOWER than XLA's blocked cholesky (1,297 vs 558 ms per
batch) — at n=2048 the VMEM cap admits only BT=1, so the serial
32-column factor loop loses its batch amortization, while XLA's While
expansion is no longer dispatch-bound at this n. This is why
pallas_chol_supported stays capped at n=1024: a measured crossover, not
a VMEM limitation. Run with MEDGP_CHOL_VMEM raised and _MAX_N bumped to
reproduce.

Run on the chip:  python tools/chol_n2048_check.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_B", "4"))
N = int(os.environ.get("PROF_N", "2048"))
STEPS = 4


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import cho_solve

    from medgp_tpu.ops import pallas_chol as pc
    from medgp_tpu.ops.pallas_chol import chol_solve

    # the production gate caps at 1024 BECAUSE of this experiment's
    # result; lift it here so the kernel path can be driven at N anyway
    pc._MAX_N = max(pc._MAX_N, N)
    print(f"backend={jax.default_backend()} B={B} N={N} "
          f"supported={pc.pallas_chol_supported(N)}", flush=True)
    assert pc.pallas_chol_supported(N)

    rng = np.random.default_rng(7)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) / N + 3.0 * np.eye(N, dtype=np.float32)
    nv = (0.1 + rng.uniform(size=(B, N))).astype(np.float32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    Kb, nvb, yb = map(jnp.asarray, (K, nv, y))

    # ---- correctness vs the XLA oracle ----
    L_p, a_p, _ = jax.jit(chol_solve)(Kb, nvb, yb)
    Km = Kb + jax.vmap(jnp.diag)(nvb)

    def oracle(Km1, y1):
        L = jnp.linalg.cholesky(Km1)
        a = cho_solve((L, True), y1)
        return L, a

    L_o, a_o = jax.jit(jax.vmap(oracle))(Km, yb)
    dL = float(jnp.max(jnp.abs(L_p - L_o)) / jnp.max(jnp.abs(L_o)))
    da = float(jnp.max(jnp.abs(a_p - a_o)) / jnp.max(jnp.abs(a_o)))
    print(json.dumps({"rel_err_L": dL, "rel_err_alpha": da}), flush=True)
    assert dL < 5e-4 and da < 5e-3, (dL, da)

    # ---- chained timing: pallas vs XLA expansion ----
    def timed(fn):
        @jax.jit
        def chain(Kb):
            def body(carry, _):
                out = fn(carry)
                s = sum(jnp.sum(o) for o in jax.tree.leaves(out)) * 1e-20
                return carry + s, 0.0
            return jax.lax.scan(body, Kb, None, length=STEPS)[0]
        np.asarray(chain(Kb))
        t0 = time.perf_counter()
        np.asarray(chain(Kb))
        return (time.perf_counter() - t0) / STEPS

    t_pallas = timed(lambda Kb1: chol_solve(Kb1, nvb, yb))
    t_xla = timed(
        lambda Kb1: jax.vmap(oracle)(Kb1 + jax.vmap(jnp.diag)(nvb), yb)
    )
    print(json.dumps({
        "pallas_ms_per_batch": t_pallas * 1e3,
        "xla_ms_per_batch": t_xla * 1e3,
        "speedup": t_xla / t_pallas,
    }), flush=True)


if __name__ == "__main__":
    main()
