"""Cohort train checkpoint/resume: a second run reuses completed buckets."""

import numpy as np
import pytest

from medgp_tpu.config.experiment import generate_experiment
from medgp_tpu.data.cohort import load_cohort
from medgp_tpu.data.synthetic import sample_cohort, write_reference_format_cohort
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.parallel.runner import train_cohort


def test_train_resume(tmp_path, rng):
    spec = LMCSMSpec(1, 2, 1)
    fidx = [18, 19]
    records = sample_cohort(9, spec, n_patients=5, n_clusters=1,
                            n_obs_range=(20, 40))
    cohort_dir = str(tmp_path / "data" / "synth")
    write_reference_format_cohort(cohort_dir, records, fidx)
    cfg = generate_experiment(
        data_root=str(tmp_path / "data"), exp_root=str(tmp_path / "exp"),
        cohort="synth", feature_list=fidx, kernel="LMC-SM",
        prior="hier-gamma", Q=1, R=1, eta=0.01, beta_lam=0.01,
        cv_fold_num=2,
        opt_config=dict(random_init_num=4, top_iteration_num=2,
                        iteration_num_per_update=6),
    )
    recs = load_cohort(cfg.data_dir, cfg.pans(), cfg.feature_list)
    ck = str(tmp_path / "ckpt")

    out1 = train_cohort(cfg, recs, n_restarts=4, ckpt_dir=ck)
    assert all(r["flag"] for r in out1.values())

    # second run must restore from checkpoint with identical results
    import time
    t0 = time.time()
    out2 = train_cohort(cfg, recs, n_restarts=4, ckpt_dir=ck)
    resume_time = time.time() - t0
    for pan in out1:
        np.testing.assert_array_equal(out1[pan]["theta"], out2[pan]["theta"])
        assert out1[pan]["loss"] == out2[pan]["loss"]
    assert resume_time < 30.0  # no retraining

    # changing the cohort composition invalidates the bucket key
    out3 = train_cohort(cfg, recs[:-1], n_restarts=4, ckpt_dir=ck)
    assert len(out3) == len(recs) - 1
