"""Time ONLY the composed objective+grad chain (the bench unit) at the
bench shape — fast turnaround for kernel-tile tuning:

  MEDGP_CHOL_BT=16 MEDGP_CHOL_VMEM=$((100*1024*1024)) \
      python tools/obj_chain_time.py
"""

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


def main():
    import jax
    import jax.numpy as jnp

    from medgp_tpu.models.gp import PatientData, objective_and_grad
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    print(f"backend={jax.default_backend()} B={B} N={N} "
          f"BT={os.environ.get('MEDGP_CHOL_BT')} "
          f"VMEM={os.environ.get('MEDGP_CHOL_VMEM')}", flush=True)
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

    @jax.jit
    def chain(th, t1, y1, m1, k1):
        def one(theta, tt, yy, mm, kk):
            data = PatientData(t=tt, y=yy, meta=mm, mask=kk)
            return objective_and_grad(spec, data, prior=prior)(theta)

        def body(carry, _):
            v, g, _ok = jax.vmap(one)(carry, t1, y1, m1, k1)
            return carry + 1e-20 * g, jnp.sum(v)

        return jax.lax.scan(body, th, None, length=STEPS)[1]

    out = np.asarray(chain(*args))
    assert np.isfinite(out).all()
    t0 = time.perf_counter()
    np.asarray(chain(*args))
    dt = (time.perf_counter() - t0) / STEPS
    print(json.dumps({"obj_grad_ms_per_batch": dt * 1e3,
                      "evals_per_sec": B / dt}), flush=True)


if __name__ == "__main__":
    main()
