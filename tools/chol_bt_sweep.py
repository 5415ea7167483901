"""Sweep the fused Cholesky chain's batch tile (BT) x scoped-VMEM cap at
the bench shape (B=128, n=512): chol_solve standalone is 64% of the
composed objective+grad chain (tools/profile5.py), so its tile is the one
knob with leverage left toward the composed bound.

Run on the chip:  python tools/chol_bt_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PROF_B", "128"))
N = int(os.environ.get("PROF_N", "512"))
STEPS = 8


def run_one(bt, vmem_mb):
    os.environ["MEDGP_CHOL_BT"] = str(bt)
    os.environ["MEDGP_CHOL_VMEM"] = str(vmem_mb * 1024 * 1024)
    # fresh import per setting (module reads env at call time, but be safe)
    for m in [k for k in sys.modules if k.startswith("medgp_tpu")]:
        del sys.modules[m]
    import jax
    import jax.numpy as jnp
    from medgp_tpu.ops.pallas_chol import chol_solve

    rng = np.random.default_rng(7)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) / N + 3.0 * np.eye(N, dtype=np.float32)
    nv = (0.1 + rng.uniform(size=(B, N))).astype(np.float32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    Kb, nvb, yb = map(jnp.asarray, (K, nv, y))

    @jax.jit
    def chain(Kb, nvb, yb):
        def body(carry, _):
            L, a, d = chol_solve(carry, nvb, yb)
            s = jnp.sum(a) * 1e-20
            return carry + s, jnp.sum(L[:, 0, 0])
        return jax.lax.scan(body, Kb, None, length=STEPS)[1]

    out = np.asarray(chain(Kb, nvb, yb))
    assert np.isfinite(out).all()
    t0 = time.perf_counter()
    np.asarray(chain(Kb, nvb, yb))
    dt = (time.perf_counter() - t0) / STEPS
    return dt


def main():
    results = {}
    for bt, vmem in [(8, 64), (8, 100), (16, 100), (16, 112), (4, 64)]:
        key = f"bt{bt}_vmem{vmem}"
        try:
            dt = run_one(bt, vmem)
            results[key] = dt * 1e3
            print(json.dumps({key: {"ms_per_batch": dt * 1e3,
                                    "evals_per_sec": B / dt}}), flush=True)
        except Exception as e:  # Mosaic VMEM overflow etc.
            results[key] = None
            print(json.dumps({key: f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    print("SUMMARY " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
