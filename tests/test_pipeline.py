"""End-to-end pipeline: generate -> train -> kernclust -> test -> eval on a
small synthetic cohort, through the same code paths as the CLI."""

import json
import os

import numpy as np
import pytest

from medgp_tpu.config.experiment import ExperimentConfig, generate_experiment
from medgp_tpu.data.synthetic import sample_cohort, write_reference_format_cohort
from medgp_tpu.models.params import LMCSMSpec


@pytest.fixture(scope="module")
def synth_experiment(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    data_root = str(root / "cohort")
    exp_root = str(root / "experiment")
    spec = LMCSMSpec(2, 2, 1)
    fidx = [18, 19]
    records = sample_cohort(
        3, spec, n_patients=8, n_clusters=1, n_obs_range=(24, 60)
    )
    cohort_dir = os.path.join(data_root, "synth")
    write_reference_format_cohort(cohort_dir, records, fidx)
    cfg = generate_experiment(
        data_root=data_root,
        exp_root=exp_root,
        cohort="synth",
        feature_list=fidx,
        kernel="LMC-SM",
        prior="hier-gamma",
        Q=2, R=1, eta=0.01, beta_lam=0.01,
        cv_fold_num=2, cv_seed=718,
        opt_config=dict(random_init_num=8, top_iteration_num=4,
                        iteration_num_per_update=10),
    )
    return cfg, records, fidx


def test_generate_layout(synth_experiment):
    cfg, records, fidx = synth_experiment
    assert os.path.exists(os.path.join(cfg.exp_cfg_dir, "exp_setup.json"))
    assert os.path.exists(os.path.join(cfg.exp_cfg_dir, "hyp_bound.txt"))
    assert os.path.exists(cfg.cv_assign_file)
    # round-trip through JSON keeps the key contract
    cfg2 = ExperimentConfig.from_json(
        os.path.join(cfg.exp_cfg_dir, "exp_setup.json")
    )
    assert cfg2.kernel_index == 7 and cfg2.D == 2 and cfg2.Q == 2
    assert cfg2.feature_list == fidx
    assert len(cfg2.pans()) == 8
    cv = cfg2.cv_assign()
    assert len(cv) == 8 and set(np.unique(cv)) <= {0, 1}


def test_full_pipeline(synth_experiment):
    cfg, records, fidx = synth_experiment
    from medgp_tpu.data.cohort import load_cohort
    from medgp_tpu.parallel.runner import train_cohort, test_cohort
    from medgp_tpu.cluster.pipeline import kernel_clustering_fold
    from medgp_tpu.evaluation.evals import eval_cohort, summarize

    recs = load_cohort(cfg.data_dir, cfg.pans(), cfg.feature_list)
    out = train_cohort(cfg, recs, n_restarts=8)
    flags = [r["flag"] for r in out.values()]
    assert sum(flags) == len(recs), "all synthetic patients must train"
    # artifacts exist and are flag-readable
    from medgp_tpu.data import formats
    pans, hyps = formats.read_train_kernels(cfg.exp_train_dir, cfg.pans())
    assert len(pans) == len(recs)
    assert hyps.shape[1] == cfg.spec().n_hyp

    cv = cfg.cv_assign()
    for fold in (-1, 0, 1):
        mode_theta, newQ = kernel_clustering_fold(
            cfg.spec(), cfg.exp_train_dir, cfg.exp_kernel_dir,
            cfg.pans(), cv, fold, algorithm="gmm", seed=0,
        )
        assert 1 <= newQ <= cfg.Q
        assert len(mode_theta) == cfg.D + newQ * (
            cfg.D * cfg.R + 2 + cfg.D
        )

    folds = np.asarray([cv[i] for i in range(len(recs))])
    tres = test_cohort(cfg, recs, folds=folds, kernclust_alg="gmm")
    assert len(tres) == len(recs)
    for pan, entry in tres.items():
        assert entry["mean_wo_update"]["flag"]
        n_out = len(entry["mean_wo_update"]["pred"])
        rec = next(r for r in recs if r.pan == pan)
        assert n_out == rec.n_obs

    summary = {}
    for mode in ("mean_wo_update", "mean_w_update"):
        res = eval_cohort(
            cfg.data_dir, cfg.exp_test_dir, mode, cfg.feature_list,
            cfg.pans(),
        )
        s = summarize(res)
        summary[mode] = s
        assert np.isfinite(s["mae"]) and s["mae"] < 5.0
        assert 0.0 <= s["ci_ratio"] <= 100.0
        # held-out predictive NLL (BASELINE acceptance metric): finite and
        # better than a naive N(0, cohort-variance) guess would be
        assert "nll" in s and np.isfinite(s["nll"])
    # the NLL per-feature artifact exists (framework extension)
    assert os.path.exists(
        os.path.join(
            cfg.exp_test_dir, "test_mean_wo_update_feature18_nll.bin"
        )
    )
    # per-feature artifacts written
    assert os.path.exists(
        os.path.join(
            cfg.exp_test_dir, "test_mean_wo_update_feature18_mae.bin"
        )
    )

    # every stage appended structured records to the single metrics stream
    # (SURVEY §5.5); eval via the metrics-wired entry point
    from medgp_tpu.parallel.runner import stage_metrics

    eval_cohort(
        cfg.data_dir, cfg.exp_test_dir, "mean_wo_update",
        cfg.feature_list, cfg.pans(), write=False,
        metrics=stage_metrics(cfg),
    )
    mpath = os.path.join(cfg.exp_log_dir, "metrics.jsonl")
    assert os.path.exists(mpath)
    stages = {json.loads(l)["stage"] for l in open(mpath)}
    assert {"train", "test", "eval"} <= stages
    # compile time is recorded separately from execute time per program
    assert {"train_compile", "test_compile"} <= stages
    recs_m = [json.loads(l) for l in open(mpath)]
    tr = next(r for r in recs_m if r["stage"] == "train")
    assert tr["patients_per_sec"] > 0 and "nlml_mean" in tr


@pytest.mark.parametrize("sampler", ["hmc", "nuts", "vi"])
def test_sampler_cohort_stage(synth_experiment, sampler, rng):
    """The posterior-inference stage consumes train artifacts and writes
    posterior-mean + samples files, for HMC, NUTS and mean-field VI."""
    cfg, records, fidx = synth_experiment
    from medgp_tpu.data import formats
    from medgp_tpu.data.cohort import load_cohort
    from medgp_tpu.parallel.runner import hmc_cohort

    recs = load_cohort(cfg.data_dir, cfg.pans(), cfg.feature_list)[:2]
    spec = cfg.spec()
    for rec in recs:
        theta = (rng.normal(size=spec.n_hyp) * 0.05).astype(np.float64)
        theta[: spec.n_lik] = np.log(0.3)
        formats.write_train_result(
            cfg.exp_train_dir, rec.pan, theta, init_theta=theta,
            var_state_flat=None, flag=True, n_obs=rec.n_obs,
        )
    out = hmc_cohort(
        cfg, recs, num_chains=2, num_warmup=20, num_samples=20,
        num_leapfrog=4, max_depth=3, sampler=sampler, seed=1,
    )
    assert len(out) == 2
    prefix = "vi" if sampler == "vi" else "hmc"
    want_chains = 1 if sampler == "vi" else 2
    for rec in recs:
        entry = out[rec.pan]
        assert entry["samples"].shape[:2] == (want_chains, 20)
        assert np.all(np.isfinite(entry["post_mean"]))
        assert os.path.exists(
            os.path.join(
                cfg.exp_train_dir, f"train_{prefix}_mean_{rec.pan}.bin"
            )
        )


def test_fused_run_with_vi_sampler(synth_experiment, capsys):
    """`run --sampler vi` end to end on the 8-device mesh: posterior means
    feed clustering (BASELINE configs[2]'s posterior->clustering path), the
    per-fold ICI noise modes drive every fold's mode kernel, and eval stays
    finite."""
    cfg, records, fidx = synth_experiment
    from medgp_tpu.cli.main import main

    cfg_path = os.path.join(cfg.exp_cfg_dir, "exp_setup.json")
    main([
        "run", "--cfg", cfg_path, "--sampler", "vi",
        "--warmup", "20", "--samples", "4", "--restarts", "8",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    for mode in ("mean_wo_update", "mean_w_update"):
        assert np.isfinite(summary[mode]["mae"])
        assert 0.0 <= summary[mode]["ci_ratio"] <= 100.0

    # posterior artifacts exist for trained patients
    vi_means = [
        f for f in os.listdir(cfg.exp_train_dir)
        if f.startswith("train_vi_mean_")
    ]
    assert vi_means, "no posterior-mean artifacts written"

    # metrics show the sampler stage and per-fold kernclust records
    mpath = os.path.join(cfg.exp_log_dir, "metrics.jsonl")
    recs_m = [json.loads(l) for l in open(mpath)]
    assert any(r["stage"] == "vi" for r in recs_m)
    kc_folds = {
        int(r["fold"]) for r in recs_m if r["stage"] == "kernclust"
    }
    assert {-1, 0, 1} <= kc_folds


def test_sampler_skips_large_patients(synth_experiment, rng, caplog):
    """ADVICE r3 (medium): patients above the large-patient threshold must
    NOT enter the bucketed sampler (it would build an (n, n) gram per chain
    on one device); they are skipped with a warning and keep MAP hypers."""
    import logging

    cfg, records, fidx = synth_experiment
    from medgp_tpu.data import formats
    from medgp_tpu.data.cohort import load_cohort
    from medgp_tpu.parallel.runner import hmc_cohort

    recs = load_cohort(cfg.data_dir, cfg.pans(), cfg.feature_list)[:2]
    spec = cfg.spec()
    for rec in recs:
        theta = (rng.normal(size=spec.n_hyp) * 0.05).astype(np.float64)
        theta[: spec.n_lik] = np.log(0.3)
        formats.write_train_result(
            cfg.exp_train_dir, rec.pan, theta, init_theta=theta,
            var_state_flat=None, flag=True, n_obs=rec.n_obs,
        )
    big = max(recs, key=lambda r: r.n_obs)
    small = min(recs, key=lambda r: r.n_obs)
    thr = big.n_obs - 1
    assert small.n_obs <= thr
    with caplog.at_level(logging.WARNING, logger="medgp_tpu"):
        out = hmc_cohort(
            cfg, recs, num_chains=1, num_warmup=4, num_samples=4,
            num_leapfrog=2, sampler="hmc", seed=1, large_threshold=thr,
        )
    # ADVICE r4 (low): the skip is machine-visible in the returned dict,
    # not just a log line — no samples, explicit flag + reason.
    assert out[big.pan] == {"flag": False, "reason": "large_patient"}
    assert "samples" not in out[big.pan]
    assert small.pan in out and "post_mean" in out[small.pan]
    assert any("large-patient threshold" in m for m in caplog.messages)
