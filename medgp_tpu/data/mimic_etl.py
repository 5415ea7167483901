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


def extract_cohort(
    diagnoses: pd.DataFrame,
    admissions: pd.DataFrame,
    chartevents: pd.DataFrame,
    labevents: pd.DataFrame,
    out_dir: str,
) -> List[str]:
    """Run the full ETL; returns the final admission id list (hadm_{id}).

    Event frames need columns HADM_ID, ITEMID, CHARTTIME, VALUENUM.
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

    # per-admission per-feature QC'd series
    series: Dict[int, Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
    stats_values: Dict[int, list] = {idx: [] for idx, *_ in specs}
    for idx, name, item, lb, ub, events in specs:
        df = events[
            events["HADM_ID"].isin(hadms) & (events["ITEMID"] == item)
        ].copy()
        df["CHARTTIME"] = pd.to_datetime(df["CHARTTIME"])
        for hadm, g in df.groupby("HADM_ID"):
            g = g.sort_values("CHARTTIME")
            t0 = admit_time.loc[hadm]
            t = (
                (g["CHARTTIME"] - t0).dt.total_seconds().values / 3600.0
            ).astype(np.float64)
            v = g["VALUENUM"].values.astype(np.float64)
            tq, vq = _qc(v, t, lb, ub)
            series.setdefault(int(hadm), {})[idx] = (tq, vq)
            stats_values[idx].append(vq)

    # admission filter: every signal needs >= SAMPLE_THRESHOLD QC'd points
    final = []
    for hadm in hadms:
        per = series.get(int(hadm), {})
        if all(
            len(per.get(idx, ((), ()))[0]) >= SAMPLE_THRESHOLD
            for idx, *_ in specs
        ):
            final.append(int(hadm))

    # cohort stats over QC'd values of the final cohort
    for idx, name, item, lb, ub, events in specs:
        vals = np.concatenate(
            [series[h][idx][1] for h in final if idx in series.get(h, {})]
        ) if final else np.zeros(1)
        formats.write_feature_stat(
            os.path.join(out_dir, f"feature{idx}_stat.bin"),
            float(np.nanmean(vals)), float(np.nanstd(vals)),
        )

    # per-admission feature files
    pans = []
    for hadm in final:
        pan = f"hadm_{hadm}"
        pans.append(pan)
        pdir = os.path.join(out_dir, pan)
        os.makedirs(pdir, exist_ok=True)
        for idx, *_ in specs:
            t, v = series[hadm][idx]
            formats.write_feature_txt(
                os.path.join(pdir, f"feature{idx}.txt"), t, v
            )

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
