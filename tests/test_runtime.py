"""Native C++ IO runtime vs the pure-Python loader (oracle)."""

import numpy as np
import pytest

from medgp_tpu.data.cohort import load_cohort
from medgp_tpu.data.synthetic import sample_cohort, write_reference_format_cohort
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.runtime import bindings


@pytest.fixture(scope="module")
def cohort_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_cohort")
    spec = LMCSMSpec(2, 3, 1)
    recs = sample_cohort(7, spec, n_patients=6, n_obs_range=(15, 80))
    fidx = [0, 4, 9]
    write_reference_format_cohort(str(d), recs, fidx)
    return str(d), recs, fidx


def test_native_builds():
    assert bindings.native_available(), "g++ build of libmedgp_io.so failed"


def test_native_counts_match_python(cohort_dir):
    d, recs, fidx = cohort_dir
    pans = [r.pan for r in recs]
    counts = bindings.count_cohort_native(d, pans, fidx)
    want = [r.n_obs for r in recs]
    np.testing.assert_array_equal(counts, want)


def test_native_load_matches_python(cohort_dir):
    d, recs, fidx = cohort_dir
    pans = [r.pan for r in recs]
    native = bindings.load_cohort_native(d, pans, fidx)
    python = load_cohort(d, pans, fidx)
    for a, b in zip(native, python):
        assert a.pan == b.pan
        np.testing.assert_allclose(a.t, b.t, rtol=1e-6)
        np.testing.assert_allclose(a.y, b.y, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(a.meta, b.meta)


def test_native_handles_missing_patient(cohort_dir):
    d, recs, fidx = cohort_dir
    counts = bindings.count_cohort_native(d, ["nonexistent"], fidx)
    assert counts[0] == 0
    out = bindings.load_cohort_native(d, ["nonexistent"], fidx)
    assert out[0].n_obs == 0
