"""Auxiliary subsystems: ETL, checkpointing, metrics, profiling, printkernel,
visualization, launch helpers."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from medgp_tpu.data import formats
from medgp_tpu.data.mimic_etl import (
    ALL_FEATURE_IDS,
    LAB_ITEMS,
    VITAL_BOUNDS,
    VITAL_ITEMS,
    extract_cohort,
    select_heart_failure_admissions,
)
from medgp_tpu.models.params import LMCSMSpec, SESpec, SMSpec
from medgp_tpu.utils.checkpoints import CohortCheckpointer
from medgp_tpu.utils.metrics import MetricsWriter
from medgp_tpu.utils.profiling import predict_train_cost
from medgp_tpu.visualization.printkernel import kernel_summary, print_kernel_info


def _synthetic_mimic(rng, n_adm=4):
    """Tiny fake MIMIC tables exercising every ETL rule."""
    hadms = list(range(100, 100 + n_adm))
    diagnoses = pd.DataFrame(
        dict(
            HADM_ID=hadms + [999],
            ICD9_CODE=["4280"] * n_adm + ["401"],  # 999 is not heart failure
        )
    )
    admissions = pd.DataFrame(
        dict(
            HADM_ID=hadms + [999],
            ADMITTIME=["2001-01-01 00:00:00"] * (n_adm + 1),
            DISCHARGE_LOCATION=["HOME"] * (n_adm - 1)
            + ["DEAD/EXPIRED", "HOME"],  # last real hadm died -> excluded
            HAS_CHARTEVENTS_DATA=[1] * (n_adm + 1),
        )
    )

    rows = []
    for hadm in hadms[: n_adm - 1]:
        for (idx, name, item), (lb, ub) in zip(VITAL_ITEMS, VITAL_BOUNDS):
            for k in range(8):
                val = (lb if lb else 0.0) + 0.5 * (ub - (lb or 0.0)) + 0.01 * k
                rows.append((hadm, item, f"2001-01-01 {k+1:02d}:00:00", val))
            rows.append((hadm, item, "2001-01-01 10:00:00", ub + 1000.0))  # QC'd out
    chart = pd.DataFrame(
        rows, columns=["HADM_ID", "ITEMID", "CHARTTIME", "VALUENUM"]
    )

    rows = []
    for hadm in hadms[: n_adm - 1]:
        for idx, name, item in LAB_ITEMS:
            for k in range(6):
                rows.append((hadm, item, f"2001-01-01 {k+2:02d}:30:00", 10.0 + k))
            rows.append((hadm, item, "2001-01-01 09:30:00", -5.0))  # QC'd out
    lab = pd.DataFrame(
        rows, columns=["HADM_ID", "ITEMID", "CHARTTIME", "VALUENUM"]
    )
    return diagnoses, admissions, chart, lab, hadms


def test_etl_selection_rules(rng):
    diagnoses, admissions, chart, lab, hadms = _synthetic_mimic(rng)
    sel = select_heart_failure_admissions(diagnoses, admissions)
    assert 999 not in sel           # not ICD-9 428*
    assert hadms[-1] not in sel     # died


def test_etl_end_to_end(tmp_path, rng):
    diagnoses, admissions, chart, lab, hadms = _synthetic_mimic(rng)
    pans = extract_cohort(diagnoses, admissions, chart, lab, str(tmp_path))
    assert pans == [f"hadm_{h}" for h in hadms[:-1]]
    # id list + stats + feature files exist, QC'd values excluded
    ids = open(tmp_path / "cohort_hadm_match.txt").read().split()
    assert ids == pans
    for fidx in ALL_FEATURE_IDS:
        assert os.path.exists(tmp_path / f"feature{fidx}_stat.bin")
    t, v = formats.read_feature_txt(
        str(tmp_path / pans[0] / "feature0.txt")
    )
    assert len(t) == 8  # the out-of-bounds draw was QC'd away
    assert np.all(v <= VITAL_BOUNDS[0][1])
    assert np.all(t > 0)
    # loadable by the standard cohort loader
    from medgp_tpu.data.cohort import load_cohort

    recs = load_cohort(str(tmp_path), pans, ALL_FEATURE_IDS)
    assert all(r.n_obs == 8 * 4 + 6 * 20 for r in recs)


def test_checkpointer_roundtrip(tmp_path, rng):
    ck = CohortCheckpointer(str(tmp_path / "ckpt"))
    state = dict(theta=rng.normal(size=(4, 10)), flag=np.asarray([1, 0, 1, 1]))
    ck.save_bucket(0, state)
    ck.save_bucket(2, state)
    assert ck.completed_buckets() == [0, 2]
    back = ck.load_bucket(0)
    np.testing.assert_allclose(back["theta"], state["theta"])
    assert ck.load_bucket(1) is None


def test_metrics_writer(tmp_path):
    p = str(tmp_path / "metrics.jsonl")
    w = MetricsWriter(p, run_id="test")
    w.write("train", patients_per_sec=3.5, nlml=[1.0, 2.0, 3.0])
    w.write("eval", mae=0.5)
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 2
    assert lines[0]["stage"] == "train"
    assert lines[0]["nlml_mean"] == pytest.approx(2.0)
    assert lines[1]["mae"] == 0.5


def test_cost_model_monotone():
    c1 = predict_train_cost(500, 1000, 1400)
    c2 = predict_train_cost(2000, 1000, 1400)
    assert c2 > 30 * c1  # ~n^3 growth


def test_kernel_summary_all_kernels(rng):
    spec = LMCSMSpec(2, 3, 2)
    rows = kernel_summary(spec, rng.normal(size=spec.n_hyp))
    assert len(rows) == 2 and "period" in rows[0] and "B_max" in rows[0]
    rows = kernel_summary(SMSpec(3), rng.normal(size=SMSpec(3).n_hyp))
    assert len(rows) == 3 and "weight" in rows[0]
    rows = kernel_summary(SESpec(), rng.normal(size=3))
    assert rows[0]["lengthscale"] > 0
    print_kernel_info(spec, rng.normal(size=spec.n_hyp))  # smoke


def test_vizkernel_outputs(tmp_path, rng):
    from medgp_tpu.visualization import vizkernel as vz

    if not vz._HAS_MPL:
        pytest.skip("matplotlib unavailable")
    p = vz.plot_kde_hist(rng.normal(size=100), str(tmp_path), "kde_test")
    assert p and os.path.exists(p)
    p = vz.plot_cluster_scatter(
        rng.uniform(10, 100, 30), rng.uniform(5, 80, 30),
        rng.integers(0, 2, 30), str(tmp_path),
    )
    assert p and os.path.exists(p)
    spec = LMCSMSpec(2, 3, 1)
    paths = vz.plot_lmcsm_kernel(
        spec, rng.normal(size=spec.n_hyp), str(tmp_path)
    )
    assert len(paths) == 2 and all(os.path.exists(x) for x in paths)


def test_launch_helpers(tmp_path):
    from medgp_tpu.parallel.launch import host_shard, write_slurm_launcher

    pans = [f"p{i}" for i in range(10)]
    costs = [(i + 1) ** 3 for i in range(10)]
    got = []
    for pi in range(4):
        got += host_shard(pans, costs, process_index=pi, process_count=4)
    assert sorted(got) == sorted(pans)
    assert host_shard(pans, costs, process_index=0, process_count=1) == pans

    sh = write_slurm_launcher(
        str(tmp_path / "run.sh"), "/x/exp_setup.json", num_hosts=4
    )
    body = open(sh).read()
    assert "#SBATCH -N 4" in body and "medgp_tpu.cli.main run" in body
    assert os.access(sh, os.X_OK)


def test_scheduler_launcher_variants(tmp_path):
    """All three reference scheduler flavors render (hpc.py:4-37): slurm,
    pbs, and a scheduler-less sequential wrapper."""
    import pytest

    from medgp_tpu.parallel.launch import write_scheduler_launcher

    pbs = write_scheduler_launcher(
        str(tmp_path / "run_pbs.sh"), "/x/exp_setup.json", num_hosts=2,
        scheduler="pbs", time_limit="12:00:00",
    )
    body = open(pbs).read()
    assert "#PBS -l select=2" in body and "walltime=12:00:00" in body
    assert "#PBS -V" in body and "medgp_tpu.cli.main run" in body

    seq = write_scheduler_launcher(
        str(tmp_path / "run_seq.sh"), "/x/exp_setup.json", num_hosts=1,
        scheduler="sequential", extra_cmd=["echo done"],
    )
    body = open(seq).read()
    assert "#SBATCH" not in body and "#PBS" not in body
    assert "medgp_tpu.cli.main run" in body and "echo done" in body
    assert os.access(seq, os.X_OK)

    with pytest.raises(NotImplementedError):
        write_scheduler_launcher(
            str(tmp_path / "x.sh"), "/x", 1, scheduler="lsf"
        )


def test_plot_one_kernel_families(tmp_path, rng):
    """The full reference plot set renders per kernel family
    (vizkernel.py:119-365): LMC-SM A/lambda/B heatmaps + SM responses,
    SE and SM 1-D responses, generic 1-D/2-D plotters."""
    from medgp_tpu.visualization import vizkernel as vz

    spec = LMCSMSpec(2, 3, 1)
    theta = rng.normal(size=spec.n_hyp) * 0.3
    paths = vz.plot_one_kernel(
        "LMC-SM", theta, str(tmp_path / "lmcsm"), prefix="mode_",
        Q=spec.Q, D=spec.D, R=spec.R,
    )
    assert len(paths) == 4 * spec.Q  # A, lambda, B, sm_1d per component
    names = {os.path.basename(p) for p in paths}
    assert "mode_a_matrix_0.pdf" in names
    assert "mode_lam_matrix_1.pdf" in names
    assert "mode_b_matrix_0.pdf" in names
    assert "mode_sm_1d_1.pdf" in names
    assert all(os.path.exists(p) for p in paths)

    se = vz.plot_one_kernel("SE", rng.normal(size=3), str(tmp_path / "se"))
    assert len(se) == 1 and se[0].endswith("se_1d.pdf")

    sm = vz.plot_one_kernel(
        "SM", rng.normal(size=1 + 3 * 2), str(tmp_path / "sm"), Q=2
    )
    assert len(sm) == 1 and sm[0].endswith("sm_1d.pdf")

    import pytest

    with pytest.raises(NotImplementedError):
        vz.plot_one_kernel("RBF", theta, str(tmp_path))


def test_metrics_writer_per_process_files(tmp_path, monkeypatch):
    """Multi-host pods write one metrics file per process (concurrent
    appends to one shared path can interleave mid-line on network
    filesystems); process 0 keeps the canonical name."""
    from medgp_tpu.utils import metrics as m

    path = str(tmp_path / "metrics.jsonl")
    w0 = m.MetricsWriter(path, run_id="r")
    assert w0.path == path

    class _FakeJax:
        @staticmethod
        def process_index():
            return 3

    monkeypatch.setitem(__import__("sys").modules, "jax", _FakeJax)
    w3 = m.MetricsWriter(path, run_id="r")
    assert w3.path == str(tmp_path / "metrics.p3.jsonl")
    w3.write("train", seconds=1.0)
    import os
    assert os.path.exists(w3.path) and not os.path.exists(path)


def test_ensure_stable_hash_seed_reexec_argv(monkeypatch):
    """The hash-seed re-exec must reconstruct the exact invocation: `-m
    pkg.mod` when run as a module, plain argv otherwise — and must be a
    no-op once the seed is pinned."""
    import os
    import sys
    import types

    from medgp_tpu.utils import compile_cache as cc

    calls = []
    monkeypatch.setattr(
        os, "execve", lambda exe, argv, env: calls.append((exe, argv, env))
    )

    # pinned -> no-op
    monkeypatch.setenv("PYTHONHASHSEED", "0")
    cc.ensure_stable_hash_seed()
    assert calls == []

    # unpinned, module-style __main__
    monkeypatch.delenv("PYTHONHASHSEED", raising=False)
    fake_main = types.SimpleNamespace(
        __spec__=types.SimpleNamespace(name="medgp_tpu.cli.main")
    )
    monkeypatch.setitem(sys.modules, "__main__", fake_main)
    monkeypatch.setattr(sys, "argv", ["/x/main.py", "train", "--cfg", "c"])
    cc.ensure_stable_hash_seed()
    exe, argv, env = calls[-1]
    assert exe == sys.executable
    assert argv == [sys.executable, "-m", "medgp_tpu.cli.main",
                    "train", "--cfg", "c"]
    assert env["PYTHONHASHSEED"] == "0"

    # unpinned, script-style __main__
    fake_script = types.SimpleNamespace(__spec__=None)
    monkeypatch.setitem(sys.modules, "__main__", fake_script)
    monkeypatch.setattr(sys, "argv", ["/x/medgp-tpu", "eval"])
    cc.ensure_stable_hash_seed()
    exe, argv, env = calls[-1]
    assert argv == [sys.executable, "/x/medgp-tpu", "eval"]


def test_ensure_stable_hash_seed_edge_cases(monkeypatch, capsys):
    """ADVICE r3: a pinned NON-zero integer seed is already deterministic
    (no re-exec), and `python -c`/stdin invocations must never re-exec (the
    first user argument would be executed as code)."""
    import os
    import sys
    import types

    from medgp_tpu.utils import compile_cache as cc

    calls = []
    monkeypatch.setattr(
        os, "execve", lambda exe, argv, env: calls.append((exe, argv, env))
    )

    # any digit-valued seed counts as pinned
    monkeypatch.setenv("PYTHONHASHSEED", "7")
    cc.ensure_stable_hash_seed()
    assert calls == []

    # `python -c '...'` -> warn-and-return, never exec the user argument
    monkeypatch.delenv("PYTHONHASHSEED", raising=False)
    fake_script = types.SimpleNamespace(__spec__=None)
    monkeypatch.setitem(sys.modules, "__main__", fake_script)
    monkeypatch.setattr(sys, "argv", ["-c", "rm -rf nothing"])
    cc.ensure_stable_hash_seed()
    assert calls == []
    assert "cannot pin PYTHONHASHSEED" in capsys.readouterr().err


def test_pack_patients_hbm_envelope_cap():
    """Bucket batches are capped so B * n_max^2 stays within the validated
    64 x 512^2 HBM envelope (B=128 x n=512 full-budget train programs
    compiled to ~16 GB and faulted a 16 GB chip — measured, round 4)."""
    import numpy as np

    from medgp_tpu.data.cohort import PatientRecord, pack_patients

    rng = np.random.default_rng(0)

    def rec(i, n):
        t = np.sort(rng.uniform(0, 100, n))
        return PatientRecord(
            pan=f"p{i}", t=t, y=rng.normal(size=n),
            meta=np.zeros(n, np.int32),
        )

    recs = [rec(i, 400 + (i % 50)) for i in range(200)]  # n_max bucket 512
    batches = pack_patients(recs, max_batch=128)
    for b in batches:
        assert len(b) * b.n_max * b.n_max <= 64 * 512 * 512
    assert sum(len(b) for b in batches) == 200

    small = [rec(i, 100) for i in range(200)]            # n_max bucket 128
    batches = pack_patients(small, max_batch=128)
    assert max(len(b) for b in batches) == 128           # cap not binding
