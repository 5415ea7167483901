"""Round-5 NUTS account (VERDICT r4 weak #2 / next #4): decompose WHERE
the NUTS min-ESS/s deficit vs HMC comes from, on chip, at the bench shape
(canonical Q=5 D=24 R=8, n=512).

Times, at a common batch size B (default 8 = the bench NUTS batch):

  grad_chain   chained potential_grad evals/s at B  (the per-leaf floor)
  hmc          hmc_sample draws/s + min-ESS/s at B  (same-batch control)
  nuts         nuts_sample draws/s + min-ESS/s at B, + the per-draw leaf
               statistics the sampler itself reports (n_leapfrog, depth):
               own-leaves vs batch-max-leaves = the vmap lockstep tax
  nuts_nocap   same with adapt_depth=False (the round-4 configuration)

Derived lines:
  leaf_rate        = total batch-max leaves / wall  (what the chip executed)
  leaf_overhead    = grad_chain rate / leaf rate    (while-loop machinery tax)
  lockstep_tax     = mean(batch-max leaves) / mean(own leaves)

Run detached on the chip:
  setsid nohup python tools/profile_nuts.py > /tmp/profile_nuts.log 2>&1 &
Env: PROF_B (batch), PROF_N, PROF_SAMPLES, PROF_WARMUP.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q, D, R = 5, 24, 8
H = D + Q * (D * R + 2 + D)
B = int(os.environ.get("PROF_B", "8"))
N = int(os.environ.get("PROF_N", "512"))
S = int(os.environ.get("PROF_SAMPLES", "12"))
W = int(os.environ.get("PROF_WARMUP", "32"))


def main():
    import jax
    import jax.numpy as jnp

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from medgp_tpu.infer.diagnostics import ess_bulk
    from medgp_tpu.infer.hmc import hmc_sample, make_potential
    from medgp_tpu.infer.nuts import nuts_sample
    from medgp_tpu.models.gp import PatientData
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.models.priors import hier_gamma_prior

    print(f"backend={jax.default_backend()} B={B} N={N} S={S} W={W}",
          flush=True)
    spec = LMCSMSpec(Q, D, R)
    prior = hier_gamma_prior(spec, beta_lam=0.01)
    gmask = prior.grad_mask()
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0, 168.0, size=(B, N)), 1).astype(np.float32)
    meta = rng.integers(0, D, size=(B, N)).astype(np.int32)
    y = rng.normal(size=(B, N)).astype(np.float32)
    thetas = (rng.normal(size=(B, H)) * 0.1).astype(np.float32)
    thetas[:, :D] = np.log(0.3)
    args = tuple(map(jnp.asarray, (thetas, t, y, meta)))
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    out = {}

    # ---- per-leaf floor: chained potential_grad at this batch ----
    def pg_batch(th, t1, y1, m1):
        def one(theta, tt, yy, mm):
            data = PatientData(t=tt, y=yy, meta=mm, mask=jnp.ones_like(tt))
            pg = make_potential(spec, data, prior=prior)
            return pg(theta)
        return jax.vmap(one)(th, t1, y1, m1)

    STEPS = 64

    @jax.jit
    def chain(th, t1, y1, m1):
        def body(carry, _):
            u, g = pg_batch(carry, t1, y1, m1)
            return carry + 1e-20 * g, jnp.sum(u)
        return jax.lax.scan(body, th, None, length=STEPS)[1]

    np.asarray(chain(*args))
    t0 = time.perf_counter()
    np.asarray(chain(*args))
    dt = (time.perf_counter() - t0) / STEPS
    out["grad_chain_evals_per_s"] = B / dt
    print(json.dumps({"grad_chain": out["grad_chain_evals_per_s"],
                      "ms_per_batch_eval": dt * 1e3}), flush=True)

    def time_sampler(kind, num_samples, **kw):
        def one(theta, t1, y1, m1, key):
            data = PatientData(t=t1, y=y1, meta=m1, mask=jnp.ones_like(t1))
            pg = make_potential(spec, data, prior=prior)
            if kind == "hmc":
                r = hmc_sample(pg, theta, key, num_warmup=W,
                               num_samples=num_samples,
                               num_leapfrog=16, grad_mask=gmask)
                return r.samples, jnp.full((num_samples,), 16, jnp.int32)
            r = nuts_sample(pg, theta, key, num_warmup=W,
                            num_samples=num_samples,
                            max_depth=6, grad_mask=gmask, **kw)
            return r.samples, r.n_leapfrog
        f = jax.jit(jax.vmap(one))
        res = f(*args, keys)
        np.asarray(res[0])
        t0 = time.perf_counter()
        res = f(*args, keys)
        samples = np.asarray(res[0])
        nlf = np.asarray(res[1])          # (B, num_samples)
        dt = time.perf_counter() - t0
        ess = sum(float(np.min(ess_bulk(samples[b][None])))
                  for b in range(B))
        return dict(
            draws_per_s=B * num_samples / dt,
            min_ess_per_s=ess / dt,
            wall_s=dt,
            own_leaves_mean=float(nlf.mean()),
            batchmax_leaves_mean=float(nlf.max(axis=0).mean()),
            leaves_total_batchmax=float(nlf.max(axis=0).sum()),
        )

    for name, kind, kw in (
        ("hmc", "hmc", {}),
        ("nuts", "nuts", {}),                      # round-5 default: wcap=4
        ("nuts_nowcap", "nuts", {"warmup_max_depth": None}),
        ("nuts_r4", "nuts", {"adapt_depth": False,
                             "warmup_max_depth": None}),
    ):
        # two budgets: the marginal between them isolates the sampling
        # phase from the (shared, in-jit) warmup — warmup-free per-draw
        # wall and leaf rates.
        r1 = time_sampler(kind, S, **kw)
        r2 = time_sampler(kind, 3 * S, **kw)
        dw = r2["wall_s"] - r1["wall_s"]
        dleaves = (r2["leaves_total_batchmax"]
                   - r1["leaves_total_batchmax"])
        r = dict(r2)
        r["marginal_draws_per_s"] = B * 2 * S / max(dw, 1e-9)
        r["marginal_leaf_rate_per_s"] = B * dleaves / max(dw, 1e-9)
        r["leaf_overhead_vs_grad_chain"] = (
            out["grad_chain_evals_per_s"] / r["marginal_leaf_rate_per_s"]
            if dleaves > 0 else None
        )
        r["lockstep_tax"] = (
            r2["batchmax_leaves_mean"]
            / max(r2["own_leaves_mean"], 1e-9)
        )
        out[name] = r
        print(json.dumps({name: r}), flush=True)

    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
