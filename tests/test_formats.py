"""File formats: round trips and reference layout compatibility."""

import os

import numpy as np
import pytest

from medgp_tpu.data import formats
from medgp_tpu.data.cohort import load_cohort, pack_patients, bucket_edges
from medgp_tpu.data.synthetic import (
    sample_cohort,
    write_reference_format_cohort,
)
from medgp_tpu.models.params import LMCSMSpec


def test_double_bin_roundtrip(tmp_path, rng):
    arr = rng.normal(size=17)
    p = str(tmp_path / "x.bin")
    formats.write_double_bin(p, arr)
    got = formats.read_double_bin(p)
    np.testing.assert_array_equal(got, arr)
    # byte-level: little-endian float64, no header
    assert os.path.getsize(p) == 17 * 8


def test_int_txt_roundtrip(tmp_path):
    p = str(tmp_path / "f.txt")
    formats.write_int_txt(p, [1, 0, 5])
    np.testing.assert_array_equal(formats.read_int_txt(p), [1, 0, 5])
    assert open(p).read() == "1\n0\n5\n"


def test_feature_txt_roundtrip(tmp_path, rng):
    t = np.sort(rng.uniform(0, 100, 9))
    v = rng.normal(size=9)
    p = str(tmp_path / "feature3.txt")
    formats.write_feature_txt(p, t, v)
    t2, v2 = formats.read_feature_txt(p)
    np.testing.assert_allclose(t2, t, atol=1e-6)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    # one value per line, count written as a float — the exact reference
    # layout (jmlr_mimic_heart_failure.py:284-285 savetxt fmt='%6.6f';
    # the C++ reader parses it into `float vec_len`, c_experiment.cpp:260)
    lines = open(p).read().split()
    assert lines[0] == "9.000000"
    assert len(lines) == 1 + 2 * 9


def test_hyp_bounds_roundtrip(tmp_path, rng):
    lb = rng.normal(size=6)
    ub = lb + 1.0
    p = str(tmp_path / "hyp_bound.txt")
    formats.write_hyp_bounds(p, lb, ub)
    lb2, ub2 = formats.read_hyp_bounds(p, 6)
    np.testing.assert_allclose(lb2, lb, atol=1e-6)
    np.testing.assert_allclose(ub2, ub, atol=1e-6)


def test_train_result_roundtrip(tmp_path, rng):
    theta = rng.normal(size=10)
    init = rng.normal(size=10)
    var = rng.normal(size=8)
    formats.write_train_result(
        str(tmp_path), "p1", theta, init, var, flag=True, n_obs=42
    )
    formats.write_train_result(
        str(tmp_path), "p2", theta, init, var, flag=False, n_obs=3
    )
    pans, hyps = formats.read_train_kernels(str(tmp_path), ["p1", "p2", "p3"])
    assert list(pans) == ["p1"]
    np.testing.assert_array_equal(hyps[0], theta)
    assert int(formats.read_int_txt(str(tmp_path / "train_num_p1.txt"))[0]) == 42


def test_test_result_roundtrip(tmp_path, rng):
    formats.write_test_result(
        str(tmp_path), "mean_wo_update", "p7",
        feature_idx=np.asarray([18, 19, 18]),
        pred=rng.normal(size=3), error=rng.normal(size=3),
        ci=np.asarray([1, 0, 1]), etime=np.zeros(3), flag=True,
    )
    flag, res = formats.read_test_result(str(tmp_path), "mean_wo_update", "p7")
    assert flag == 1
    np.testing.assert_array_equal(res["feature"], [18, 19, 18])
    np.testing.assert_array_equal(res["ci"], [1, 0, 1])


def test_mode_kernel_roundtrip(tmp_path, rng):
    theta = rng.normal(size=20)
    formats.write_mode_kernel(str(tmp_path), 3, "gmm", theta, 4)
    got, q = formats.read_mode_kernel(str(tmp_path), 3, "gmm")
    np.testing.assert_array_equal(got, theta)
    assert q == 4
    assert os.path.exists(tmp_path / "fold3" / "gmm_mode_param.bin")


def test_synthetic_cohort_reference_format_roundtrip(tmp_path):
    spec = LMCSMSpec(2, 3, 1)
    recs = sample_cohort(0, spec, n_patients=4, n_obs_range=(20, 40))
    fidx = [5, 9, 11]
    write_reference_format_cohort(str(tmp_path), recs, fidx)

    pans = [r.pan for r in recs]
    loaded = load_cohort(str(tmp_path), pans, fidx)
    for orig, back in zip(recs, loaded):
        assert back.n_obs == orig.n_obs
        # feature-major reload ordering: compare per-feature sets
        for j in range(len(fidx)):
            so, sb = orig.meta == j, back.meta == j
            np.testing.assert_allclose(
                np.sort(orig.t[so]), np.sort(back.t[sb]), atol=1e-5
            )
            np.testing.assert_allclose(
                np.sort(orig.y[so]), np.sort(back.y[sb]), atol=1e-5
            )


def test_bucketing_and_packing():
    spec = LMCSMSpec(1, 2, 1)
    recs = sample_cohort(1, spec, n_patients=20, n_obs_range=(10, 400))
    batches = pack_patients(recs, multiple=64, growth=2.0, max_batch=8)
    assert sum(len(b) for b in batches) == 20
    for b in batches:
        assert b.t.shape == (len(b), b.n_max)
        assert b.n_max % 64 == 0
        counts = b.mask.sum(1).astype(int)
        # every patient fits its bucket and no smaller one
        for i, pan in enumerate(b.pans):
            assert counts[i] <= b.n_max
    edges = bucket_edges([10, 100, 500], multiple=64)
    assert edges[-1] >= 500 and all(e % 64 == 0 for e in edges)


def test_packing_batch_multiple_promotes_remainders():
    """With batch_multiple = mesh size, every non-final bucket's population
    is a device multiple: dummy-patient padding happens at most once (the
    cohort remainder in the longest bucket), not once per length bucket."""
    import numpy as np

    from medgp_tpu.data.cohort import PatientRecord, pack_patients

    rng = np.random.default_rng(3)

    def rec(i, n):
        return PatientRecord(
            pan=f"p{i}", t=np.sort(rng.uniform(0, 72, n)).astype(np.float32),
            y=rng.normal(size=n).astype(np.float32),
            meta=np.zeros(n, np.int32),
        )

    # 10 short + 5 medium + 3 long patients, device count 8
    recs = (
        [rec(i, 50) for i in range(10)]
        + [rec(10 + i, 200) for i in range(5)]
        + [rec(15 + i, 400) for i in range(3)]
    )
    batches = pack_patients(recs, max_batch=8, batch_multiple=8)
    # every patient appears exactly once
    all_pans = [p for b in batches for p in b.pans]
    assert sorted(all_pans) == sorted(r.pan for r in recs)
    # all but the final (longest) bucket are exact device multiples
    sizes = [(b.n_max, len(b)) for b in batches]
    last_n_max = max(n for n, _ in sizes)
    for n_max, B in sizes:
        if n_max != last_n_max:
            assert B % 8 == 0, sizes
    # remainder lives only in the longest bucket
    assert sum(B for n, B in sizes if n == last_n_max) % 8 == len(recs) % 8
