"""Clustering stack: KDE vs closed forms, GMM-BIC vs sklearn, feature
extraction layout, mode-kernel estimation round trip."""

import numpy as np
import jax
import pytest

from medgp_tpu.cluster.kde import silverman_bandwidth, gaussian_kde, kde_mode
from medgp_tpu.cluster.gmm import run_clustering_top, run_gmm_bic
from medgp_tpu.cluster.features import (
    extract_lmcsm_features,
    sm_response_curve,
    periodicity_flag,
)
from medgp_tpu.cluster.mode import mode_kernel_lmcsm
from medgp_tpu.cluster.pipeline import cluster_kernels
from medgp_tpu.models.params import LMCSMSpec


def test_silverman_bandwidth_formula(rng):
    x = rng.normal(size=200) * 3.0 + 1.0
    bw = silverman_bandwidth(x)
    std = np.std(x, ddof=1)
    q75, q25 = np.percentile(x, [75, 25])
    sigma = min(std, (q75 - q25) / 1.349)
    assert bw == pytest.approx(0.9 * sigma * 200 ** (-0.2), rel=1e-12)


def test_gaussian_kde_is_a_density(rng):
    x = rng.normal(size=100)
    grid = np.linspace(-6, 6, 2001)
    dens = gaussian_kde(x, grid)
    integral = np.trapezoid(dens, grid)
    assert integral == pytest.approx(1.0, abs=1e-3)


def test_kde_mode_weighted_vs_argmax(rng):
    x = np.concatenate([rng.normal(size=400) * 0.2 + 2.0,
                        rng.normal(size=40) * 0.2 - 1.0])
    m_arg = kde_mode(x, weighted=False)
    assert abs(m_arg - 2.0) < 0.3  # argmax lands on the dominant mass
    m_w = kde_mode(x, weighted=True)
    # weighted mean-of-density is pulled toward the overall mean
    assert m_arg != m_w


def test_gmm_recovers_separated_clusters(rng):
    X = np.concatenate([
        rng.normal(size=(80, 3)) * 0.3 + np.array([4.0, 0, 0]),
        rng.normal(size=(60, 3)) * 0.3 + np.array([-4.0, 1, 0]),
    ])
    k, assign = run_clustering_top("gmm", X, max_cluster_num=4, init_num=4)
    assert k == 2
    a, b = assign[:80], assign[80:]
    assert len(np.unique(a)) == 1 and len(np.unique(b)) == 1
    assert a[0] != b[0]


def test_gmm_bic_agrees_with_sklearn(rng):
    X = np.concatenate([
        rng.normal(size=(70, 2)) * 0.4 + np.array([3.0, 3.0]),
        rng.normal(size=(70, 2)) * 0.4 + np.array([-3.0, -3.0]),
        rng.normal(size=(70, 2)) * 0.4 + np.array([3.0, -3.0]),
    ])
    k_jax, _ = run_gmm_bic(X, 5, init_num=4, seed=0, algorithm="gmm")
    k_skl, _ = run_gmm_bic(X, 5, init_num=4, algorithm="sklearn")
    assert k_jax == k_skl == 3


def test_gmm_vmapped_inits_match_solo_runs(rng):
    """EM under vmap over n_init must freeze converged members (masked
    while): every init's vmapped result equals its solo run bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from medgp_tpu.cluster.gmm import _fit_single

    X = jnp.asarray(np.concatenate([
        rng.normal(size=(40, 2)) * 0.4 + np.array([2.5, 0.0]),
        rng.normal(size=(40, 2)) * 0.4 + np.array([-2.5, 0.0]),
    ]))
    keys = jax.random.split(jax.random.key(0), 6)
    # loose tol: members stop EARLY, far from the EM fixed point — if a
    # converged member kept running (the unmasked-while bug) its params
    # would keep refining and drift visibly from the solo run. The only
    # tolerated difference is batched-vs-solo fp reduction order (~1e-8).
    p_v, ll_v = jax.vmap(
        lambda k: _fit_single(k, X, jnp.ones(X.shape[0], X.dtype), 2, 200, 0.05, 1e-6)
    )(keys)
    for i in range(6):
        p_s, ll_s = _fit_single(keys[i], X, jnp.ones(X.shape[0], X.dtype), 2, 200, 0.05, 1e-6)
        np.testing.assert_allclose(
            np.asarray(ll_v[i]), np.asarray(ll_s), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(p_v.means[i]), np.asarray(p_s.means), atol=1e-5
        )


def test_none_algorithm_single_cluster(rng):
    X = rng.normal(size=(30, 5))
    k, assign = run_clustering_top("None", X)
    assert k == 1 and np.all(assign == 0)


def test_feature_extraction_shapes_and_gating(rng):
    spec = LMCSMSpec(3, 2, 2)
    P = 5
    hyps = rng.normal(size=(P, spec.n_hyp)) * 0.3
    # zero out component 1 of patient 0 completely (A=0, kappa -> ~0)
    D, Q, R = spec.D, spec.Q, spec.R
    hyps[0, D + 1 * D * R : D + 2 * D * R] = 0.0
    hyps[0, D + Q * (D * R + 2) + 1 * D : D + Q * (D * R + 2) + 2 * D] = -60.0
    pans = np.asarray([f"p{i}" for i in range(P)])
    cp, cq, cf = extract_lmcsm_features(spec, pans, hyps)
    assert cf.shape[1] == 73
    assert len(cp) == P * Q - 1  # one gated component dropped
    assert not np.any((cp == "p0") & (cq == 1))
    # response at lag 0 is always 1
    np.testing.assert_allclose(cf[:, 0], 1.0, atol=1e-12)
    assert set(np.unique(cf[:, -1])) <= {0.0, 10.0}


def test_mode_kernel_lmcsm_recovers_shared_kernel(rng):
    """If every patient has an identical kernel, the mode kernel must
    reproduce its B matrices and mu/v. R = D makes the reference's rank-R SVD
    truncation exact, isolating the KDE/mode path under test."""
    spec = LMCSMSpec(2, 3, 3)
    D, Q, R = spec.D, spec.Q, spec.R
    base = rng.normal(size=spec.n_hyp) * 0.3
    base[:D] = np.log(0.25)
    P = 12
    hyps = np.tile(base, (P, 1)) + rng.normal(size=(P, spec.n_hyp)) * 1e-4
    pans = np.asarray([f"p{i}" for i in range(P)])

    mode_theta, newQ = cluster_kernels(
        spec, pans, hyps, algorithm="gmm", seed=0
    )
    assert newQ in (1, 2)
    new_spec = LMCSMSpec(newQ, D, R)
    # noise recovered
    np.testing.assert_allclose(
        np.exp(mode_theta[:D]), 0.25 * np.ones(D), rtol=5e-2
    )
    # total coregional matrix recovered: sum_q B_q equal up to refactoring
    def total_B(spec_, th):
        import jax.numpy as jnp
        p = spec_.unpack(jnp.asarray(th, jnp.float64))
        B = np.asarray(spec_.coregional_B(p["A"], p["kappa"]))
        return B.sum(0)

    want = total_B(spec, base)
    got = total_B(new_spec, mode_theta)
    np.testing.assert_allclose(got, want, rtol=0.15, atol=0.05)


def test_mode_svd_refactorization_properties(rng):
    """A(AT) + diag(lam) from the SVD split approximates the KDE mode B, and
    lam is strictly positive (clamped at 1e-15)."""
    spec = LMCSMSpec(1, 4, 2)
    D, R = spec.D, spec.R
    base = rng.normal(size=spec.n_hyp) * 0.4
    P = 10
    hyps = np.tile(base, (P, 1)) + rng.normal(size=(P, spec.n_hyp)) * 1e-5
    pans = np.asarray([f"p{i}" for i in range(P)])
    from medgp_tpu.cluster.features import extract_lmcsm_features
    cp, cq, cf = extract_lmcsm_features(spec, pans, hyps)
    mode_theta = mode_kernel_lmcsm(
        spec, pans, hyps, cp, cq, 1, np.zeros(len(cp), int)
    )
    lam = np.exp(mode_theta[D + 1 * (D * R + 2) :])
    assert np.all(lam > 0)


def test_in_memory_fold_clustering_matches_file_path(rng, tmp_path):
    """The fused train->kernclust handoff (arrays in memory + ICI noise
    mode) must produce the same mode kernels as the file-based fold
    pipeline, for every fold."""
    import jax
    import jax.numpy as jnp

    from medgp_tpu.cluster.pipeline import (
        kernel_clustering_fold,
        kernel_clustering_fold_in_memory,
    )
    from medgp_tpu.data import formats
    from medgp_tpu.parallel.mesh import (
        cohort_mesh,
        population_noise_modes_by_fold,
    )

    spec = LMCSMSpec(2, 2, 1)
    P = 12
    base = rng.normal(size=spec.n_hyp) * 0.4
    hyps = np.tile(base, (P, 1)) + rng.normal(size=(P, spec.n_hyp)) * 0.05
    pans = [f"p{i:02d}" for i in range(P)]
    cv = np.asarray([i % 2 for i in range(P)])

    import os

    train_dir = str(tmp_path / "train")
    file_kdir = str(tmp_path / "kernel_file")
    mem_kdir = str(tmp_path / "kernel_mem")
    os.makedirs(train_dir)
    for i, pan in enumerate(pans):
        formats.write_train_result(
            train_dir, pan, hyps[i], init_theta=hyps[i],
            var_state_flat=None, flag=True, n_obs=10,
        )

    mesh = cohort_mesh()
    n_dev = mesh.devices.size
    pad = (-P) % n_dev
    th = np.concatenate([hyps, np.zeros((pad, spec.n_hyp))]).astype(np.float32)
    fl = np.concatenate([np.ones(P), np.zeros(pad)]).astype(np.float32)
    cvs = np.concatenate([cv, np.full(pad, -2)]).astype(np.int32)
    # ONE collective yields every fold's noise modes (rows 0..F-1, then -1)
    fold_modes = np.asarray(
        population_noise_modes_by_fold(spec, mesh, 2)(
            jnp.asarray(th), jnp.asarray(fl), jnp.asarray(cvs)
        ),
        np.float64,
    )

    for fold in (-1, 0, 1):
        noise_mode = fold_modes[fold]
        want_theta, want_q = kernel_clustering_fold(
            spec, train_dir, file_kdir, pans, cv, fold,
            algorithm="gmm", seed=0,
        )
        got_theta, got_q = kernel_clustering_fold_in_memory(
            spec, mem_kdir, pans, hyps, cv, pans, fold,
            algorithm="gmm", seed=0, noise_mode=noise_mode,
        )
        assert got_q == want_q
        D = spec.D
        # noise block: ICI all_gather+KDE vs host KDE (same numbers to fp)
        np.testing.assert_allclose(got_theta[:D], want_theta[:D], rtol=2e-3)
        # everything else identical (same clustering inputs, same seed)
        np.testing.assert_allclose(got_theta[D:], want_theta[D:], rtol=1e-12)
        # files written by both paths
        f_theta, f_q = formats.read_mode_kernel(mem_kdir, fold, "gmm")
        assert f_q == got_q
        np.testing.assert_allclose(f_theta, got_theta, atol=0)


def test_mode_kernel_rank_deficient_R_exceeds_D(rng):
    """R > D: the (D, D) mode-B has rank <= D < R; the SVD refactorization
    must pad A with zero columns instead of crashing (the reference indexes
    out of bounds here, mode_estimate.py:418-419 — R > D is redundant for
    B = A A^T but must not take the pipeline down). The regime is real:
    PT/INR experiments keep the canonical Q=5 with only D=2 features."""
    spec = LMCSMSpec(2, 2, 4)  # R=4 > D=2
    D, R = spec.D, spec.R
    base = rng.normal(size=spec.n_hyp) * 0.3
    P = 10
    hyps = np.tile(base, (P, 1)) + rng.normal(size=(P, spec.n_hyp)) * 1e-4
    pans = np.asarray([f"p{i}" for i in range(P)])
    mode_theta, newQ = cluster_kernels(
        spec, pans, hyps, algorithm="gmm", seed=0
    )
    assert np.all(np.isfinite(mode_theta))
    # padded A columns are zero, so B = A A^T + diag(lam) is still PSD
    new_spec = LMCSMSpec(newQ, D, R)
    import jax.numpy as jnp
    p_ = new_spec.unpack(jnp.asarray(mode_theta, jnp.float64))
    A = np.asarray(p_["A"])
    assert A.shape == (newQ, D, R)
    assert np.allclose(A[:, :, D:], 0.0)
