"""MIMIC-III heart-failure cohort extraction.

Library-form rebuild of the reference's ETL notebook-script
(scripts/jmlr_mimic_heart_failure.py): select heart-failure admissions
(ICD-9 428*), exclude in-hospital deaths, keep the 24-signal feature set
(4 vitals + 20 labs) with the reference's QC bounds, require >= 5 QC'd
observations per signal, and emit the raw-data directory tree the whole
pipeline consumes: per-admission feature{idx}.txt (hours since admission,
value), cohort feature{idx}_stat.bin (mean, std of QC'd values), and
cohort_hadm_match.txt.

Feature tables and bounds are data constants taken from the reference
(jmlr_mimic_heart_failure.py:102-132); the implementation is vectorized
pandas rather than per-admission dataframe scans.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd

from medgp_tpu.data import formats

# (feature_index, name, MIMIC ITEMID); vitals come from CHARTEVENTS with
# two-sided QC bounds, labs from LABEVENTS with a positive-value filter.
VITAL_ITEMS: List[Tuple[int, str, int]] = [
    (0, "RR", 220210),
    (1, "HR", 220045),
    (3, "SBP", 220179),
    (4, "Temp", 223761),
]
VITAL_BOUNDS: List[Tuple[float, float]] = [
    (0.0, 70.0),
    (0.0, 300.0),
    (0.0, 260.0),
    (90.0, 110.0),
]
LAB_ITEMS: List[Tuple[int, str, int]] = [
    (6, "BUN", 51006), (7, "CO2", 50804), (8, "Calcium", 50893),
    (9, "Chloride", 50902), (10, "Creatinine", 50912), (12, "Glucose", 50931),
    (13, "Hct", 51221), (14, "Hgb", 51222), (15, "MCH", 51248),
    (16, "MCHC", 51249), (17, "MCV", 51250), (18, "INR", 51237),
    (19, "PT", 51274), (20, "PTT", 51275), (21, "Platelet", 51265),
    (22, "Potassium", 50971), (23, "RBC", 51279), (24, "RDW", 51277),
    (25, "Sodium", 50983), (26, "WBC", 51301),
]
SAMPLE_THRESHOLD = 5  # minimum QC'd observations per signal per admission

ALL_FEATURE_IDS = [i for i, _, _ in VITAL_ITEMS] + [
    i for i, _, _ in LAB_ITEMS
]


def select_heart_failure_admissions(
    diagnoses: pd.DataFrame, admissions: pd.DataFrame
) -> np.ndarray:
    """HADM_IDs with any ICD-9 428* diagnosis, surviving to discharge, with
    chart data (jmlr_mimic_heart_failure.py:79-97)."""
    icd = diagnoses["ICD9_CODE"].astype(str)
    hf = diagnoses.loc[icd.str.startswith("428"), "HADM_ID"].unique()
    adm = admissions[admissions["HADM_ID"].isin(hf)]
    adm = adm[
        (adm["DISCHARGE_LOCATION"] != "DEAD/EXPIRED")
        & (adm["HAS_CHARTEVENTS_DATA"] == 1)
    ]
    return np.unique(adm["HADM_ID"].values)


def _qc(values: np.ndarray, times: np.ndarray, lb, ub):
    """NaN removal, positive-time filter, then (lb, ub] value bounds
    (jmlr_mimic_heart_failure.py:17-38 `do_qc`)."""
    keep = ~np.isnan(values)
    values, times = values[keep], times[keep]
    keep = times > 0.0
    values, times = values[keep], times[keep]
    if lb is not None:
        keep = values > lb
        values, times = values[keep], times[keep]
    if ub is not None:
        keep = values <= ub
        values, times = values[keep], times[keep]
    return times, values


def _value_qc(values: np.ndarray, lb, ub):
    """NaN removal + value bounds ONLY (no time filter): the rule the
    reference uses for BOTH the first-pass membership count and the
    population statistics (jmlr_mimic_heart_failure.py:146-162, 181-236)."""
    v = values[~np.isnan(values)]
    if lb is not None:
        v = v[v > lb]
    if ub is not None:
        v = v[v <= ub]
    return v


def extract_cohort(
    diagnoses: pd.DataFrame,
    admissions: pd.DataFrame,
    chartevents: pd.DataFrame,
    labevents: pd.DataFrame,
    out_dir: str,
) -> List[str]:
    """Run the full ETL; returns the final admission id list (hadm_{id}).

    Event frames need columns HADM_ID, ITEMID, CHARTTIME, VALUENUM.

    Faithful to the reference's TWO-pass structure (cross-run-verified
    against the executed jmlr_mimic_heart_failure.py in
    tests/test_etl_crossrun.py):
      pass 1 (membership + stats): value-QC only, NO time filter —
        admissions need >= SAMPLE_THRESHOLD bound-respecting values per
        signal; population mean/std come from these values over the
        pass-1 cohort in float64;
      pass 2 (files): per-admission series in float32 (the reference
        casts before QC), full QC incl. the positive-time filter; any
        admission dropping below the threshold here keeps its feature
        files on disk but is excluded from cohort_hadm_match.txt
        (the reference's qc_remove_hadm, :245-333).
    """
    os.makedirs(out_dir, exist_ok=True)
    hadms = select_heart_failure_admissions(diagnoses, admissions)

    admit_time = (
        admissions.set_index("HADM_ID")["ADMITTIME"].map(pd.to_datetime)
    )

    specs = [
        (idx, name, item, lb, ub, chartevents)
        for (idx, name, item), (lb, ub) in zip(VITAL_ITEMS, VITAL_BOUNDS)
    ] + [(idx, name, item, 0.0, None, labevents) for idx, name, item in LAB_ITEMS]

    # ---- pass 1: membership on value-QC'd counts (no time filter) ----
    raw_values: Dict[int, Dict[int, np.ndarray]] = {}
    for idx, name, item, lb, ub, events in specs:
        df = events[
            events["HADM_ID"].isin(hadms) & (events["ITEMID"] == item)
        ]
        for hadm, g in df.groupby("HADM_ID"):
            raw_values.setdefault(int(hadm), {})[idx] = (
                g["VALUENUM"].values.astype(np.float64)
            )
    first_pass = [
        int(h)
        for h in hadms
        if all(
            len(_value_qc(raw_values.get(int(h), {}).get(idx, np.zeros(0)),
                          lb, ub)) >= SAMPLE_THRESHOLD
            for idx, name, item, lb, ub, events in specs
        )
    ]

    # ---- population stats: value-QC'd values over the pass-1 cohort ----
    fp_set = set(first_pass)
    for idx, name, item, lb, ub, events in specs:
        vals = [
            _value_qc(raw_values[h][idx], lb, ub)
            for h in first_pass
            if idx in raw_values.get(h, {})
        ]
        allv = np.concatenate(vals) if vals else np.zeros(1)
        formats.write_feature_stat(
            os.path.join(out_dir, f"feature{idx}_stat.bin"),
            float(np.nanmean(allv)), float(np.nanstd(allv)),
        )

    # ---- pass 2: per-admission float32 series with the full QC ----
    series: Dict[int, Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
    for idx, name, item, lb, ub, events in specs:
        df = events[
            events["HADM_ID"].isin(fp_set) & (events["ITEMID"] == item)
        ].copy()
        df["CHARTTIME"] = pd.to_datetime(df["CHARTTIME"])
        for hadm, g in df.groupby("HADM_ID"):
            g = g.sort_values("CHARTTIME")
            t0 = admit_time.loc[hadm]
            # integer-second difference then float32 hours — exactly the
            # reference's (charttime - ref)/1e9 -> f32 /3600 chain
            t = (
                ((g["CHARTTIME"] - t0).dt.total_seconds()).values
            ).astype(np.float32) / np.float32(3600.0)
            v = g["VALUENUM"].values.astype(np.float32)
            tq, vq = _qc(v, t, lb, ub)
            series.setdefault(int(hadm), {})[idx] = (tq, vq)

    qc_removed = set()
    for hadm in first_pass:
        per = series.get(hadm, {})
        for idx, *_ in specs:
            if len(per.get(idx, ((), ()))[0]) < SAMPLE_THRESHOLD:
                qc_removed.add(hadm)
                break

    # feature files for EVERY pass-1 admission (reference writes the dirs
    # before deciding qc_remove_hadm); the id list excludes the removed
    pans = []
    for hadm in first_pass:
        pan = f"hadm_{hadm}"
        pdir = os.path.join(out_dir, pan)
        os.makedirs(pdir, exist_ok=True)
        for idx, *_ in specs:
            t, v = series.get(hadm, {}).get(
                idx, (np.zeros(0, np.float32), np.zeros(0, np.float32))
            )
            formats.write_feature_txt(
                os.path.join(pdir, f"feature{idx}.txt"), t, v
            )
        if hadm not in qc_removed:
            pans.append(pan)

    with open(os.path.join(out_dir, "cohort_hadm_match.txt"), "w") as f:
        for pan in pans:
            f.write(pan + "\n")
    return pans


def extract_cohort_from_csvs(mimic_dir: str, out_dir: str) -> List[str]:
    """Convenience wrapper reading the standard MIMIC-III csv.gz files."""
    rd = lambda name, **kw: pd.read_csv(
        os.path.join(mimic_dir, name), compression="infer", **kw
    )
    diagnoses = rd("DIAGNOSES_ICD.csv.gz")
    admissions = rd("ADMISSIONS.csv.gz")
    usecols = ["HADM_ID", "ITEMID", "CHARTTIME", "VALUENUM"]
    chart = rd("CHARTEVENTS.csv.gz", usecols=usecols)
    lab = rd("LABEVENTS.csv.gz", usecols=usecols)
    return extract_cohort(diagnoses, admissions, chart, lab, out_dir)
