"""SCG optimizer: convergence on analytic problems, failure handling,
budget accounting, vmap batching, and GP-NLML optimization quality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medgp_tpu.infer.scg import scg_minimize
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.gp import objective_and_grad
from tests.test_nlml import make_patient, random_theta


def as_obj(fun):
    """Wrap value-only function into the (value, grad, ok) protocol."""
    vg = jax.value_and_grad(fun)

    def f(x):
        v, g = vg(x)
        return v, g, jnp.asarray(True)

    return f


def test_quadratic_converges():
    A = jnp.asarray([[3.0, 0.5], [0.5, 1.0]])
    b = jnp.asarray([1.0, -2.0])

    def fun(x):
        return 0.5 * x @ A @ x - b @ x

    res = scg_minimize(as_obj(fun), jnp.zeros(2), max_evals=100)
    x_star = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_star, rtol=1e-4, atol=1e-5)
    assert bool(res.ok)
    assert int(res.n_evals) <= 101


def test_rosenbrock_converges():
    def fun(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    res = scg_minimize(as_obj(fun), jnp.asarray([-1.2, 1.0]), max_evals=500)
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=2e-2)


def test_budget_respected():
    calls = []

    def fun(x):
        return jnp.sum(x**2)

    res = scg_minimize(as_obj(fun), jnp.ones(3) * 5.0, max_evals=7)
    assert int(res.n_evals) <= 8  # outer-loop tick can add one


def test_failure_region_is_avoided():
    """Objective that fails (ok=False) for x[0] > 2: the line search must
    halve its way back and still make progress toward the feasible minimum."""

    def f(x):
        v = jnp.sum((x - jnp.asarray([1.5, 0.0])) ** 2)
        g = 2.0 * (x - jnp.asarray([1.5, 0.0]))
        ok = x[0] <= 2.0
        v = jnp.where(ok, v, jnp.inf)
        return v, g, ok

    res = scg_minimize(f, jnp.zeros(2), max_evals=100)
    assert float(res.fx) < 1e-3
    np.testing.assert_allclose(np.asarray(res.x), [1.5, 0.0], atol=5e-2)


def test_vmap_over_starts():
    def fun(x):
        return jnp.sum((x - 3.0) ** 2)

    f = as_obj(fun)
    starts = jnp.asarray([[0.0, 0.0], [10.0, -5.0], [2.9, 3.1]])
    res = jax.vmap(lambda x0: scg_minimize(f, x0, max_evals=60))(starts)
    np.testing.assert_allclose(np.asarray(res.x), 3.0 * np.ones((3, 2)), atol=1e-3)


def test_gp_nlml_optimization_beats_init_and_matches_scipy(rng):
    """On a small LMC-SM patient, SCG must reach (at least) the quality of
    scipy L-BFGS-B from the same start."""
    import scipy.optimize

    spec = LMCSMSpec(2, 2, 1)
    data = make_patient(rng, spec, n=24)
    theta0 = random_theta(rng, spec)
    f = objective_and_grad(spec, data)

    res = scg_minimize(
        lambda x: f(x), jnp.asarray(theta0, jnp.float32), max_evals=200
    )
    v0, _, _ = f(jnp.asarray(theta0, jnp.float32))
    assert float(res.fx) < float(v0) - 1.0  # made real progress

    def np_f(th):
        v, g, ok = f(jnp.asarray(th, jnp.float32))
        return float(v), np.asarray(g, np.float64)

    sp = scipy.optimize.minimize(
        np_f, theta0, jac=True, method="L-BFGS-B",
        options=dict(maxiter=200),
    )
    # within a few nats of the scipy optimum (both are local optimizers in
    # float32; exact equality is not expected)
    assert float(res.fx) <= sp.fun + 3.0
