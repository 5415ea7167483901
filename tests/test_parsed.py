"""parsed_predict decomposition: per-source-covariate contributions sum to
the predictive mean (gp_regression.cpp:216-320 semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.gp import parsed_posterior_at, posterior_at
from tests.test_nlml import make_patient, random_theta


def test_contributions_sum_to_mean(rng):
    spec = LMCSMSpec(2, 3, 2)
    data = make_patient(rng, spec, n=24, n_pad=8)
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    t2 = jnp.asarray([5.0, 40.0, 66.0], jnp.float32)
    meta2 = jnp.asarray([0, 1, 2], jnp.int32)

    post, contrib = parsed_posterior_at(spec, theta, data, t2, meta2)
    assert contrib.shape == (spec.D, 3)
    total = np.asarray(contrib).sum(0)
    np.testing.assert_allclose(
        total, np.asarray(post.mean), rtol=1e-4, atol=1e-5
    )
    ref = posterior_at(spec, theta, data, t2, meta2)
    np.testing.assert_allclose(
        np.asarray(post.mean), np.asarray(ref.mean), atol=1e-6
    )


def test_single_output_gets_everything(rng):
    """If all training observations come from output 0, only row 0 of the
    decomposition can be nonzero."""
    spec = LMCSMSpec(1, 2, 1)
    data = make_patient(rng, spec, n=16)
    meta = np.zeros(16, np.int32)
    data = data._replace(meta=jnp.asarray(meta))
    theta = jnp.asarray(random_theta(rng, spec), jnp.float32)
    post, contrib = parsed_posterior_at(
        spec, theta, data,
        jnp.asarray([10.0], jnp.float32), jnp.asarray([1], jnp.int32),
    )
    c = np.asarray(contrib)
    assert abs(c[1, 0]) == 0.0
    np.testing.assert_allclose(c[0, 0], float(post.mean[0]), rtol=1e-5)
