"""ctypes bindings for the native IO runtime (libmedgp_io.so).

Builds the shared library on demand (`make` in this directory) and degrades
gracefully to the pure-Python loaders in :mod:`medgp_tpu.data.formats` when a
toolchain is unavailable. Use :func:`native_available` to probe and
:func:`load_cohort_native` / :func:`count_cohort_native` as drop-in
accelerated equivalents of the Python cohort loader.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

log = logging.getLogger("medgp_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmedgp_io.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError) as e:
        log.debug("native IO build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.debug("native IO load failed: %s", e)
        return None

    lib.mgp_load_patient.restype = ctypes.c_long
    lib.mgp_load_patient.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_long,
    ]
    lib.mgp_count_patient.restype = ctypes.c_long
    lib.mgp_count_patient.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.mgp_count_cohort.restype = ctypes.c_int
    lib.mgp_count_cohort.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ]
    lib.mgp_load_cohort.restype = ctypes.c_int
    lib.mgp_load_cohort.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _c_str_array(strs: Sequence[str]):
    arr = (ctypes.c_char_p * len(strs))()
    keep = [s.encode() for s in strs]
    arr[:] = keep
    return arr, keep


def _fid_array(fids: Sequence[int]):
    a = np.asarray(fids, np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def count_cohort_native(
    data_dir: str, pans: Sequence[str], feature_ids: Sequence[int],
    n_threads: int = 0,
) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native IO runtime unavailable"
    n_threads = n_threads or max(os.cpu_count() or 1, 1)
    pan_arr, _keep = _c_str_array([str(p) for p in pans])
    fids, fid_ptr = _fid_array(feature_ids)
    counts = np.zeros(len(pans), np.int64)
    rc = lib.mgp_count_cohort(
        data_dir.encode(), pan_arr, len(pans), fid_ptr, len(fids),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_threads,
    )
    assert rc == 0
    return counts


def load_cohort_native(
    data_dir: str,
    pans: Sequence[str],
    feature_ids: Sequence[int],
    n_threads: int = 0,
):
    """Threaded cohort load; returns a list of PatientRecord (normalized)."""
    from medgp_tpu.data import formats
    from medgp_tpu.data.cohort import PatientRecord

    lib = _load()
    assert lib is not None, "native IO runtime unavailable"
    n_threads = n_threads or max(os.cpu_count() or 1, 1)

    means, stds = [], []
    for fid in feature_ids:
        m, s = formats.read_feature_stat(
            os.path.join(data_dir, f"feature{fid}_stat.bin")
        )
        means.append(m)
        stds.append(s)
    means = np.asarray(means, np.float64)
    stds = np.asarray(stds, np.float64)

    counts = count_cohort_native(data_dir, pans, feature_ids, n_threads)
    offsets = np.zeros(len(pans) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])

    t = np.zeros(total, np.float32)
    y = np.zeros(total, np.float32)
    meta = np.zeros(total, np.int32)
    pan_arr, _keep = _c_str_array([str(p) for p in pans])
    fids, fid_ptr = _fid_array(feature_ids)
    rc = lib.mgp_load_cohort(
        data_dir.encode(), pan_arr, len(pans), fid_ptr,
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        stds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(fids),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads,
    )
    assert rc == 0, "native cohort load failed (slot overflow?)"

    recs = []
    for i, pan in enumerate(pans):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        recs.append(
            PatientRecord(
                pan=str(pan), t=t[lo:hi].copy(), y=y[lo:hi].copy(),
                meta=meta[lo:hi].copy(),
            )
        )
    return recs
