"""Large-patient screen-budget experiment (VERDICT r3 weak #4).

Question: does the large-patient restart screen's reduced default
(cfg.large_patient_restarts = 8, vs the reference's 1,000 —
large_train.py's rationale) change which basin the optimizer starts in at
large n? Protocol: one synthetic n≈8k patient on the real chip; screen
S=64 inits through the ONE-program distributed screen on a 1-device mesh;
compare the argmin over the first 8 against the argmin over all 64, and
the NLML spread across inits.

Run detached: setsid nohup python -u tools/screen_budget_exp.py > log &
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from medgp_tpu.data.inits import default_bounds, random_inits
    from medgp_tpu.infer.large_train import pad_observations
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.parallel.mesh import cohort_mesh, large_patient_screen

    spec = LMCSMSpec(Q=5, D=24, R=8)
    n = 8192
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 24 * 21, size=n))
    meta = rng.integers(0, spec.D, size=n)
    meta[: 2 * spec.D] = np.tile(np.arange(spec.D), 2)
    y = rng.normal(size=n).astype(np.float64)

    mesh = cohort_mesh(jax.devices()[:1])
    tp, yp, mp, maskp = pad_observations(t, y, meta, 8)
    args = tuple(map(jnp.asarray, (tp, yp, mp, maskp)))

    bounds = default_bounds(spec)
    S = 64
    inits = random_inits(jax.random.key(718), spec, bounds, S)

    screen = large_patient_screen(spec, mesh)
    t0 = time.time()
    vals, oks = screen(jnp.asarray(inits, jnp.float32), *args)
    vals = np.asarray(vals, np.float64)
    dt = time.time() - t0
    finite = np.isfinite(vals)
    print(f"n={n} S={S} wall={dt:.1f}s ok={int(finite.sum())}/{S}")
    best8 = int(np.argmin(np.where(finite[:8], vals[:8], np.inf)))
    best64 = int(np.argmin(np.where(finite, vals, np.inf)))
    v8, v64 = vals[best8], vals[best64]
    print(f"argmin over first 8: init {best8}  nlml={v8:.2f}")
    print(f"argmin over all 64:  init {best64}  nlml={v64:.2f}")
    print(f"gap (v8 - v64) = {v8 - v64:.3f}  "
          f"relative to spread p95-p5 = "
          f"{np.nanpercentile(vals[finite], 95) - np.nanpercentile(vals[finite], 5):.3f}")
    print("VALS", np.round(np.sort(vals[finite])[:12], 2).tolist())


if __name__ == "__main__":
    main()
