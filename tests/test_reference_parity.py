"""Cross-implementation parity against the ACTUAL reference pipeline.

The reference's L4 stages (medgpc/clustering/kernclust.py:11-58,
medgpc/evaluation/evals.py:7-51) are pure Python and runnable from
/root/reference. These tests feed artifacts THIS repo wrote into the
reference's own code (and reference-written files into repo readers) and
require the numbers to agree — a true cross-implementation check, unlike the
transcribed numpy oracles used elsewhere in the suite.

Compatibility shims (documented blockers; none touch the numeric path):
  * numpy 2 removed the `np.float_`/`np.infty` aliases the 2017-era
    reference uses — re-aliased to the identical objects;
  * statsmodels is not installed in this image; the reference only uses
    `KDEUnivariate(..).fit(kernel="gau", bw="silverman").evaluate(x)`
    (mode_estimate.py:438-444). The shim transcribes statsmodels'
    published bw_silverman (0.9 * min(std(ddof=1), IQR/1.349) * n^-0.2)
    and the exact pointwise gaussian kernel density — independent code
    from the repo's cluster/kde.py;
  * `array.fromstring` (binaryIO.py:16) was removed in Python 3.9 —
    `read_double_from_bin` is re-bound to a byte-identical np.fromfile;
  * the reference's unconditional matplotlib calls use APIs removed in
    matplotlib 3 (`plt.cm.spectral`, `xlim(xmin=)`); the three plot
    functions are no-op'd inside mode_estimate — plots are not under test.
"""

import os
import sys
import types

import numpy as np
import pytest

from medgp_tpu.config.experiment import generate_experiment
from medgp_tpu.data import formats
from medgp_tpu.data.synthetic import sample_cohort, write_reference_format_cohort
from medgp_tpu.models.params import LMCSMSpec

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------
# reference import machinery
# --------------------------------------------------------------------------

def _faithful_statsmodels_shim():
    """statsmodels.nonparametric.kde.KDEUnivariate, restricted to the exact
    call pattern the reference makes (gaussian kernel, silverman bandwidth,
    pointwise evaluate)."""

    class KDEUnivariate:
        def __init__(self, endog):
            self.endog = np.asarray(endog, np.float64).ravel()

        def fit(self, kernel="gau", bw="silverman", **_kw):
            assert kernel == "gau" and bw == "silverman"
            x = self.endog
            n = len(x)
            # statsmodels bandwidths._select_sigma + bw_silverman
            iqr = (
                np.percentile(x, 75) - np.percentile(x, 25)
            ) / 1.349
            std = np.std(x, ddof=1)
            sigma = np.minimum(std, iqr) if iqr > 0 else std
            self.bw = 0.9 * sigma * n ** (-0.2)
            return self

        def evaluate(self, points):
            pts = np.atleast_1d(np.asarray(points, np.float64))
            z = (pts[:, None] - self.endog[None, :]) / self.bw
            return np.exp(-0.5 * z * z).sum(axis=1) / (
                len(self.endog) * self.bw * np.sqrt(2 * np.pi)
            )

    mod = types.ModuleType("statsmodels.nonparametric.kde")
    mod.KDEUnivariate = KDEUnivariate
    pkg = types.ModuleType("statsmodels")
    sub = types.ModuleType("statsmodels.nonparametric")
    pkg.nonparametric = sub
    sub.kde = mod
    sys.modules.setdefault("statsmodels", pkg)
    sys.modules.setdefault("statsmodels.nonparametric", sub)
    sys.modules.setdefault("statsmodels.nonparametric.kde", mod)


@pytest.fixture(scope="module")
def medgpc():
    """Import the reference package with the documented compat shims."""
    np.float_ = np.float64
    np.infty = np.inf
    _faithful_statsmodels_shim()
    import matplotlib

    matplotlib.use("Agg")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import medgpc.util.binaryIO as bio

    def _read_double_from_bin(filename):
        return np.fromfile(filename, dtype="<f8")

    bio.read_double_from_bin = _read_double_from_bin

    import medgpc.clustering.cluster as ref_cluster
    import medgpc.clustering.feature_extraction as ref_feat
    import medgpc.clustering.mode_estimate as ref_mode
    import medgpc.evaluation.evals as ref_evals
    import medgpc.visualization.fastkernel as ref_fast

    ref_evals.read_double_from_bin = _read_double_from_bin
    # plots are not under test; the originals call matplotlib APIs removed
    # since the reference was written (plt.cm.spectral, xlim(xmin=))
    ref_mode.plot_one_kernel = lambda *a, **k: None
    ref_mode.plot_kde_hist = lambda *a, **k: None
    ref_mode.plot_cluster_scatter_2d = lambda *a, **k: None

    return types.SimpleNamespace(
        binaryIO=bio, cluster=ref_cluster, feat=ref_feat,
        mode=ref_mode, evals=ref_evals, fast=ref_fast,
    )


# --------------------------------------------------------------------------
# shared synthetic experiment with planted 2-cluster kernel structure
# --------------------------------------------------------------------------

Q, D, R = 2, 3, 2
SPEC = LMCSMSpec(Q, D, R)


def _planted_hyps(rng, n_patients):
    """Per-patient flat thetas with two latent kernel-component clusters:
    component q=0 is slow/aperiodic, q=1 fast/periodic; every patient
    carries both, so clustering must recover k=2 with components grouped
    by q across patients."""
    H = SPEC.n_hyp
    hyps = np.zeros((n_patients, H))
    sl_mu = D + Q * D * R
    sl_v = sl_mu + Q
    sl_kap = sl_v + Q
    for i in range(n_patients):
        hyps[i, :D] = np.log(0.3) + 0.05 * rng.normal(size=D)
        A = 0.8 * rng.normal(size=(Q, D, R)) / np.sqrt(Q * R)
        hyps[i, D:sl_mu] = A.ravel()
        # q=0: aperiodic fast-decay (period 60 h, lengthscale 2 h, flag 0);
        # q=1: periodic persistent (period 6 h, lengthscale 30 h, flag 10)
        hyps[i, sl_mu:sl_v] = [
            np.log(1.0 / 60.0) + 0.05 * rng.normal(),
            np.log(1.0 / 6.0) + 0.05 * rng.normal(),
        ]
        hyps[i, sl_v:sl_kap] = [
            np.log(1.0 / (2 * np.pi * 2.0)) + 0.05 * rng.normal(),
            np.log(1.0 / (2 * np.pi * 30.0)) + 0.05 * rng.normal(),
        ]
        hyps[i, sl_kap:] = np.log(
            0.1 * rng.uniform(0.5, 1.5, size=Q * D) / Q
        )
    return hyps


@pytest.fixture(scope="module")
def parity_experiment(tmp_path_factory):
    """Experiment tree + repo-written train artifacts for 16 patients."""
    rng = np.random.default_rng(718)
    root = tmp_path_factory.mktemp("parity")
    data_root = str(root / "cohort")
    fidx = [18, 19, 20]
    records = sample_cohort(
        7, SPEC, n_patients=16, n_clusters=1, n_obs_range=(18, 40)
    )
    cohort_dir = os.path.join(data_root, "synth")
    write_reference_format_cohort(cohort_dir, records, fidx)
    cfg = generate_experiment(
        data_root=data_root,
        exp_root=str(root / "experiment"),
        cohort="synth",
        feature_list=fidx,
        kernel="LMC-SM",
        prior="hier-gamma",
        Q=Q, R=R, eta=0.01, beta_lam=0.01,
        cv_fold_num=2, cv_seed=718,
        opt_config=dict(random_init_num=8, top_iteration_num=4,
                        iteration_num_per_update=10),
    )
    hyps = _planted_hyps(rng, len(records))
    for i, rec in enumerate(records):
        formats.write_train_result(
            cfg.exp_train_dir, rec.pan, hyps[i], init_theta=hyps[i],
            var_state_flat=None, flag=True, n_obs=rec.n_obs,
        )
    return cfg, records, hyps


# --------------------------------------------------------------------------
# L3->L4 file boundary: reference readers on repo-written artifacts
# --------------------------------------------------------------------------

def test_reference_reads_repo_train_artifacts(medgpc, parity_experiment):
    cfg, records, hyps = parity_experiment
    pans = np.asarray([r.pan for r in records])
    ref_pan, ref_hyp = medgpc.binaryIO.read_train_kernel(
        pan_array=pans, kernel_dir=cfg.exp_train_dir
    )
    assert list(ref_pan) == list(pans)
    np.testing.assert_allclose(ref_hyp, hyps, rtol=0, atol=0)

    repo_pan, repo_hyp = formats.read_train_kernels(cfg.exp_train_dir, pans)
    np.testing.assert_array_equal(ref_hyp, repo_hyp)


def test_repo_reads_reference_written_artifacts(medgpc, tmp_path):
    """Reverse direction: files written by the reference's own writer load
    byte-identically through repo readers."""
    rng = np.random.default_rng(3)
    arr = rng.normal(size=37)
    path = str(tmp_path / "ref_written.bin")
    medgpc.binaryIO.write_double_to_bin(path, arr)
    got = formats.read_double_bin(path)
    np.testing.assert_array_equal(got, arr)


# --------------------------------------------------------------------------
# feature extraction parity
# --------------------------------------------------------------------------

def test_feature_extraction_parity(medgpc, parity_experiment):
    cfg, records, hyps = parity_experiment
    pans = np.asarray([r.pan for r in records])

    ref_pan, ref_q, ref_feat = medgpc.feat.extract_kernel_feature(
        kernel_type="LMC-SM", Q=Q, D=D, R=R,
        pan_array=pans, hyp_array=hyps,
    )
    from medgp_tpu.cluster.features import extract_kernel_features

    repo_pan, repo_q, repo_feat = extract_kernel_features(SPEC, pans, hyps)

    assert list(ref_pan) == list(repo_pan)
    np.testing.assert_array_equal(ref_q, repo_q)
    assert ref_feat.shape == repo_feat.shape  # 73-dim response features
    np.testing.assert_allclose(ref_feat, repo_feat, rtol=1e-10, atol=1e-12)


# --------------------------------------------------------------------------
# GMM + BIC model selection parity
# --------------------------------------------------------------------------

def _comembership(assign):
    a = np.asarray(assign)
    return a[:, None] == a[None, :]


def test_gmm_clustering_parity(medgpc, parity_experiment):
    """Reference sklearn GMM+BIC and the repo's JAX GMM+BIC must choose the
    same k and the same partition (up to label permutation).

    Note: at this cohort size BIC legitimately prefers k=1 in BOTH
    implementations (73-dim full covariances need hundreds of components
    before a split pays its parameter penalty) — the parity claim is that
    the two selectors AGREE, and that at a forced k=2 the partitions match
    the planted per-q structure."""
    cfg, records, hyps = parity_experiment
    pans = np.asarray([r.pan for r in records])
    comp_pan, comp_q, feat = medgpc.feat.extract_kernel_feature(
        kernel_type="LMC-SM", Q=Q, D=D, R=R, pan_array=pans, hyp_array=hyps
    )
    np.random.seed(718)  # reference sklearn GMM uses the global RNG
    ref_k, ref_assign = medgpc.cluster.run_clustering_top(
        algorithm="gmm", feature=feat, max_cluster_num=Q
    )

    from medgp_tpu.cluster.gmm import run_clustering_top as repo_top

    repo_k, repo_assign = repo_top("gmm", feat, max_cluster_num=Q, seed=0)
    assert ref_k == repo_k
    np.testing.assert_array_equal(
        _comembership(ref_assign), _comembership(repo_assign)
    )

    # forced k=2: both EMs must recover the planted q-index partition
    from sklearn import mixture

    np.random.seed(718)
    g = mixture.GaussianMixture(
        n_components=2, covariance_type="full", max_iter=2000, n_init=10
    ).fit(feat)
    sk2 = g.predict(feat)

    import jax
    import jax.numpy as jnp

    from medgp_tpu.cluster.gmm import fit_gmm, predict

    Xj = jnp.asarray(feat)
    p, _ = fit_gmm(jax.random.key(0), Xj, 2)
    repo2 = np.asarray(predict(Xj, p))
    planted = _comembership(comp_q)
    np.testing.assert_array_equal(_comembership(sk2), planted)
    np.testing.assert_array_equal(_comembership(repo2), planted)


# --------------------------------------------------------------------------
# mode-kernel estimation parity (KDE modes, B summing, SVD refactorization)
# --------------------------------------------------------------------------

def test_mode_kernel_parity(medgpc, parity_experiment, tmp_path):
    """With identical cluster assignments, the reference's
    output_mode_LMC_SM and the repo's mode_kernel_lmcsm must produce the
    same mode kernel: noise block, per-cluster mu/v, and the reassembled
    B_q = A_q A_q^T + diag(lambda_q)."""
    cfg, records, hyps = parity_experiment
    pans = np.asarray([r.pan for r in records])
    _, _, feat = medgpc.feat.extract_kernel_feature(
        kernel_type="LMC-SM", Q=Q, D=D, R=R, pan_array=pans, hyp_array=hyps
    )
    comp_pan, comp_q, _ = medgpc.feat.extract_kernel_feature(
        kernel_type="LMC-SM", Q=Q, D=D, R=R, pan_array=pans, hyp_array=hyps
    )
    from medgp_tpu.cluster.gmm import run_clustering_top as repo_top

    k, assign = repo_top("gmm", feat, max_cluster_num=Q, seed=0)

    exp_param = dict(
        kernel="LMC-SM", Q=Q, D=D, R=R,
        exp_kernel_dir=str(tmp_path / "kernel"),
        exp_figure_dir=str(tmp_path / "figure"),
    )
    ref_hyp = medgpc.mode.output_mode_LMC_SM(
        fold=-1, exp_param=exp_param, pan_array=pans, hyp_array=hyps,
        mixture_pan=comp_pan, mixture_index=comp_q,
        mixture_cluster_num=int(k), mixture_cluster_assign=assign,
        kernclust_alg="gmm", plotting_mode=1, plotting_param=None,
    )

    from medgp_tpu.cluster.mode import mode_kernel_lmcsm

    repo_hyp = mode_kernel_lmcsm(
        SPEC, pans, hyps, comp_pan, comp_q, int(k), assign
    )
    newQ = int(k)
    assert len(ref_hyp) == len(repo_hyp) == D + newQ * (D * R + 2 + D)

    # noise block (log KDE modes of exp(theta_d))
    np.testing.assert_allclose(repo_hyp[:D], ref_hyp[:D], rtol=1e-8)
    # mu / v blocks per cluster
    o = D + newQ * D * R
    np.testing.assert_allclose(
        repo_hyp[o:o + 2 * newQ], ref_hyp[o:o + 2 * newQ], rtol=1e-8
    )
    # B matrices: SVD factor signs may differ; compare the assembled B
    for impl_hyp in (ref_hyp, repo_hyp):
        assert np.all(np.isfinite(impl_hyp))
    ref_B = medgpc.fast.compute_B_matrix(newQ, D, R, ref_hyp)
    repo_B = medgpc.fast.compute_B_matrix(newQ, D, R, repo_hyp)
    np.testing.assert_allclose(repo_B, ref_B, rtol=1e-6, atol=1e-8)

    # and the reference-written mode files parse through repo readers
    got_theta, got_q = formats.read_mode_kernel(
        exp_param["exp_kernel_dir"], -1, "gmm"
    )
    assert got_q == newQ
    np.testing.assert_allclose(got_theta, ref_hyp, rtol=0, atol=0)


# --------------------------------------------------------------------------
# evaluation parity (denormalize, align, MAE / CI coverage)
# --------------------------------------------------------------------------

def _craft_test_artifacts(cfg, records, rng):
    """Write per-patient test outputs (repo writer): predictions = true
    normalized value + noise, one per raw observation, time-ordered like the
    online test stage writes them."""
    fidx = cfg.feature_list
    for rec in records:
        order = np.argsort(rec.t, kind="stable")
        feat = np.asarray([fidx[m] for m in rec.meta[order]], int)
        pred = rec.y[order] + 0.1 * rng.normal(size=rec.n_obs)
        err = rec.y[order] - pred
        ci = (np.abs(err) <= 1.96 * 0.1).astype(int)
        formats.write_test_result(
            cfg.exp_test_dir, "mean_wo_update", rec.pan,
            feature_idx=feat, pred=pred, error=err, ci=ci,
            etime=np.zeros(rec.n_obs), flag=True,
        )


def test_eval_parity(medgpc, parity_experiment):
    """The reference's eval_medgpc_top run on repo-written test artifacts
    must produce the same per-feature MAE / CI-coverage vectors as the repo
    evaluation stage."""
    cfg, records, hyps = parity_experiment
    rng = np.random.default_rng(11)
    _craft_test_artifacts(cfg, records, rng)

    exp_cfg_json = os.path.join(cfg.exp_cfg_dir, "exp_setup.json")
    medgpc.evals.eval_medgpc_top(exp_cfg_json, "mean_wo_update")

    from medgp_tpu.evaluation.evals import eval_cohort

    repo = eval_cohort(
        cfg.data_dir, cfg.exp_test_dir, "mean_wo_update",
        cfg.feature_list, cfg.pans(), write=False,
    )
    for fidx in cfg.feature_list:
        for metric in ("mae", "ci_ratio"):
            ref_vec = np.fromfile(
                os.path.join(
                    cfg.exp_test_dir,
                    f"test_mean_wo_update_feature{fidx}_{metric}.bin",
                ),
                dtype="<f8",
            )
            np.testing.assert_allclose(
                repo[fidx][metric], ref_vec, rtol=1e-10,
                err_msg=f"feature {fidx} {metric}",
            )


def test_mode_kernel_parity_forced_k2(medgpc, parity_experiment, tmp_path):
    """Mode-kernel parity at k=2 (VERDICT r2: BIC picks k=1 at this cohort
    size, leaving the per-cluster mu/sqrt(v) KDE-mode paths and the
    multi-cluster B summing/SVD untested against the reference). Force the
    planted 2-cluster partition (which both GMMs recover at forced k=2,
    test_gmm_clustering_parity) into BOTH mode estimators and compare every
    block (mode_estimate.py:242-435 vs cluster/mode.py)."""
    cfg, records, hyps = parity_experiment
    pans = np.asarray([r.pan for r in records])
    comp_pan, comp_q, _ = medgpc.feat.extract_kernel_feature(
        kernel_type="LMC-SM", Q=Q, D=D, R=R, pan_array=pans, hyp_array=hyps
    )
    k = 2
    assign = np.asarray(comp_q, int)  # planted per-q partition, k=2

    exp_param = dict(
        kernel="LMC-SM", Q=Q, D=D, R=R,
        exp_kernel_dir=str(tmp_path / "kernel"),
        exp_figure_dir=str(tmp_path / "figure"),
    )
    ref_hyp = medgpc.mode.output_mode_LMC_SM(
        fold=-1, exp_param=exp_param, pan_array=pans, hyp_array=hyps,
        mixture_pan=comp_pan, mixture_index=comp_q,
        mixture_cluster_num=k, mixture_cluster_assign=assign,
        kernclust_alg="gmm", plotting_mode=1, plotting_param=None,
    )

    from medgp_tpu.cluster.mode import mode_kernel_lmcsm

    repo_hyp = mode_kernel_lmcsm(
        SPEC, pans, hyps, comp_pan, comp_q, k, assign
    )
    assert len(ref_hyp) == len(repo_hyp) == D + k * (D * R + 2 + D)

    # noise block
    np.testing.assert_allclose(repo_hyp[:D], ref_hyp[:D], rtol=1e-8)
    # per-cluster mu / v KDE modes — the k>=2 path under test
    o = D + k * D * R
    np.testing.assert_allclose(
        repo_hyp[o:o + 2 * k], ref_hyp[o:o + 2 * k], rtol=1e-8
    )
    # per-cluster assembled B (multi-cluster summing + SVD refactorization)
    ref_B = medgpc.fast.compute_B_matrix(k, D, R, ref_hyp)
    repo_B = medgpc.fast.compute_B_matrix(k, D, R, repo_hyp)
    np.testing.assert_allclose(repo_B, ref_B, rtol=1e-6, atol=1e-8)
    # the two clusters produced genuinely different mode components
    assert not np.allclose(ref_B[0], ref_B[1])
