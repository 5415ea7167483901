"""L0 cross-implementation check: run the REFERENCE's MIMIC ETL script
(scripts/jmlr_mimic_heart_failure.py — pure Python, executed in-process
with its 2018-era environment shimmed) on synthetic MIMIC-schema CSVs and
diff every artifact against data/mimic_etl.py on the same input.

The same trick tests/test_reference_parity.py plays for the clustering
and evaluation stages, played for the data layer (round-5 judge item #7).

Environment shims (none touch the ETL math):
  * seaborn/matplotlib plotting stubbed (sns.distplot was removed
    upstream; figures are not under test);
  * DataFrame.to_hdf stubbed (pytables absent; the .h5 dumps are debug
    artifacts);
  * pd.to_datetime pinned to datetime64[ns]: the script's
    `(charttime - ref)/(10**9)` arithmetic assumes ns-resolution pandas
    (2018); modern pandas infers us-resolution, which silently divides
    timestamps by 1000 — restoring ns restores the written semantics.

The fixture exercises the edge rules: duplicate charttimes, out-of-bound
values, NaN values, pre-admission (negative-time) events, a death-flagged
admission, a non-HF admission, and an admission that passes the value-QC
membership pass but fails the timed pass (the qc_remove_hadm branch).
"""

import gzip
import os
import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from medgp_tpu.data import formats
from medgp_tpu.data.mimic_etl import (
    ALL_FEATURE_IDS,
    LAB_ITEMS,
    VITAL_BOUNDS,
    VITAL_ITEMS,
    extract_cohort_from_csvs,
)

REF_SCRIPT = Path("/root/reference/scripts/jmlr_mimic_heart_failure.py")


def _write_gz_csv(df, path):
    with gzip.open(path, "wt") as f:
        df.to_csv(f, index=False)


def _rich_synthetic_mimic(rng, n_adm=5):
    """MIMIC-schema frames exercising every ETL rule (see module doc)."""
    hadms = list(range(100, 100 + n_adm))
    # the V-code keeps ICD9_CODE string-typed through the csv round trip
    # (real MIMIC codes are alphanumeric: V/E prefixes)
    icd_codes = ["4280", "42822", "401", "4019", "V053"]
    icddef = pd.DataFrame(
        dict(
            ICD9_CODE=icd_codes,
            SHORT_TITLE=["hf", "hf", "htn", "htn", "vacc"],
        )
    )
    diagnoses = pd.DataFrame(
        dict(
            HADM_ID=hadms + [999, 999],
            ICD9_CODE=["4280", "42822", "4280", "4280", "4280", "401",
                       "V053"],
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

    chart_rows, lab_rows = [], []
    # hadms[0..2]: clean members. hadm[3]: passes the value-only
    # membership pass but all its events are PRE-admission (negative
    # time) -> dropped by the timed pass (qc_remove_hadm).
    for ai, hadm in enumerate(hadms[: n_adm - 1]):
        neg = ai == 3
        for (idx, name, item), (lb, ub) in zip(VITAL_ITEMS, VITAL_BOUNDS):
            for k in range(8):
                val = lb + 0.5 * (ub - lb) + 0.01 * k + 0.001 * ai
                day = "2000-12-31" if neg else "2001-01-01"
                chart_rows.append(
                    (hadm, item, f"{day} {k + 1:02d}:00:00", val)
                )
            # duplicate charttime (same minute, second value)
            chart_rows.append(
                (hadm, item,
                 "2000-12-31 01:00:00" if neg else "2001-01-01 01:00:00",
                 lb + 0.4 * (ub - lb))
            )
            # out-of-bounds + NaN: QC'd away everywhere
            chart_rows.append((hadm, item, "2001-01-01 10:00:00", ub + 1e3))
            chart_rows.append((hadm, item, "2001-01-01 11:00:00", np.nan))
        for idx, name, item in LAB_ITEMS:
            for k in range(6):
                day = "2000-12-31" if neg else "2001-01-01"
                lab_rows.append(
                    (hadm, item, f"{day} {k + 2:02d}:30:00",
                     10.0 + k + 0.1 * ai)
                )
            lab_rows.append((hadm, item, "2001-01-01 09:30:00", -5.0))
            lab_rows.append((hadm, item, "2001-01-01 12:30:00", np.nan))
    chart = pd.DataFrame(
        chart_rows, columns=["HADM_ID", "ITEMID", "CHARTTIME", "VALUENUM"]
    )
    lab = pd.DataFrame(
        lab_rows, columns=["HADM_ID", "ITEMID", "CHARTTIME", "VALUENUM"]
    )
    return icddef, diagnoses, admissions, chart, lab, hadms


@pytest.fixture()
def mimic_csv_dir(tmp_path, rng):
    d = tmp_path / "mimic"
    d.mkdir()
    icddef, diagnoses, admissions, chart, lab, hadms = _rich_synthetic_mimic(
        rng
    )
    _write_gz_csv(icddef, d / "D_ICD_DIAGNOSES.csv.gz")
    _write_gz_csv(diagnoses, d / "DIAGNOSES_ICD.csv.gz")
    _write_gz_csv(admissions, d / "ADMISSIONS.csv.gz")
    _write_gz_csv(chart, d / "CHARTEVENTS.csv.gz")
    _write_gz_csv(lab, d / "LABEVENTS.csv.gz")
    # defined but never read by the script; present for realism
    _write_gz_csv(pd.DataFrame(dict(ITEMID=[0])), d / "D_LABITEMS.csv.gz")
    _write_gz_csv(pd.DataFrame(dict(ITEMID=[0])), d / "D_ITEMS.csv.gz")
    return str(d)


def _run_reference_script(mimic_dir: str, out_dir: str):
    src = REF_SCRIPT.read_text()
    src = src.replace(
        "mimic_dir = '/data/lifangc/mimic/data/mimic3v1.4/'",
        f"mimic_dir = {mimic_dir + '/'!r}",
    )
    src = src.replace(
        "output_dir = '/data/lifangc/mimic/cohort2/{}'.format(cohort)",
        f"output_dir = {out_dir!r}",
    )
    assert mimic_dir in src and out_dir in src

    sns_stub = types.ModuleType("seaborn")
    sns_stub.distplot = lambda *a, **k: None
    mpl_stub = types.ModuleType("matplotlib")
    mpl_stub.use = lambda *a, **k: None
    mpl_stub.rc = lambda *a, **k: None
    mpl_stub.rcParams = {}
    plt_stub = types.ModuleType("matplotlib.pyplot")
    for fn in ("figure", "title", "savefig", "close"):
        setattr(plt_stub, fn, lambda *a, **k: None)
    mpl_stub.pyplot = plt_stub

    saved = {
        k: sys.modules.get(k)
        for k in ("seaborn", "matplotlib", "matplotlib.pyplot")
    }
    orig_to_datetime = pd.to_datetime
    orig_to_hdf = pd.DataFrame.to_hdf

    def to_datetime_ns(*a, **k):
        r = orig_to_datetime(*a, **k)
        try:
            return r.astype("datetime64[ns]")
        except (TypeError, ValueError):
            return r

    try:
        sys.modules["seaborn"] = sns_stub
        sys.modules["matplotlib"] = mpl_stub
        sys.modules["matplotlib.pyplot"] = plt_stub
        pd.to_datetime = to_datetime_ns
        pd.DataFrame.to_hdf = lambda *a, **k: None
        ns = {"__name__": "__ref_etl__"}
        exec(compile(src, str(REF_SCRIPT), "exec"), ns)
    finally:
        pd.to_datetime = orig_to_datetime
        pd.DataFrame.to_hdf = orig_to_hdf
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.mark.skipif(not REF_SCRIPT.exists(), reason="reference unavailable")
def test_etl_matches_executed_reference_script(mimic_csv_dir, tmp_path):
    ref_out = str(tmp_path / "ref_out")
    my_out = str(tmp_path / "my_out")
    os.makedirs(ref_out, exist_ok=True)
    _run_reference_script(mimic_csv_dir, ref_out)
    pans = extract_cohort_from_csvs(mimic_csv_dir, my_out)

    # 1. cohort id list identical (incl. the qc_remove_hadm exclusion)
    ref_ids = open(os.path.join(ref_out, "cohort_hadm_match.txt")).read().split()
    my_ids = open(os.path.join(my_out, "cohort_hadm_match.txt")).read().split()
    assert ref_ids == my_ids == pans
    assert len(pans) == 3  # 5 HF adms - 1 died - 1 negative-time QC removal

    # 2. population stats identical (f64 bins)
    for fidx in ALL_FEATURE_IDS:
        rm, rs = formats.read_feature_stat(
            os.path.join(ref_out, f"feature{fidx}_stat.bin")
        )
        mm, ms = formats.read_feature_stat(
            os.path.join(my_out, f"feature{fidx}_stat.bin")
        )
        assert mm == pytest.approx(rm, rel=1e-12, abs=1e-12)
        assert ms == pytest.approx(rs, rel=1e-12, abs=1e-12)

    # 3. per-admission feature series identical (text artifacts, %6.6f)
    for pan in ref_ids:
        for fidx in ALL_FEATURE_IDS:
            rt, rv = formats.read_feature_txt(
                os.path.join(ref_out, pan, f"feature{fidx}.txt")
            )
            mt, mv = formats.read_feature_txt(
                os.path.join(my_out, pan, f"feature{fidx}.txt")
            )
            assert len(rt) == len(mt), (pan, fidx)
            np.testing.assert_allclose(mt, rt, rtol=0, atol=1e-6)
            np.testing.assert_allclose(mv, rv, rtol=0, atol=1e-6)

    # 4. the reference also leaves feature files for the QC-removed
    # admission on disk without listing it — we mirror that
    removed = [f"hadm_{h}" for h in (100, 101, 102, 103) if f"hadm_{h}" not in ref_ids]
    for pan in removed:
        assert os.path.isdir(os.path.join(ref_out, pan))
        assert os.path.isdir(os.path.join(my_out, pan))
