#!/bin/bash
# Canonical experiment generation — the counterpart of the reference's
# scripts/gen_medgpc_example.sh (LMC-SM, hierarchical-gamma prior, Q=5, R=8,
# eta=0.01, beta_lambda=0.01, GMM clustering, 10-fold CV, seed 718).
#
# Expects the cohort produced by the MIMIC-III ETL
# (python -m medgp_tpu.data.mimic_etl or write_reference_format_cohort)
# under $DATA_ROOT/heart_failure.
set -euo pipefail

DATA_ROOT=${DATA_ROOT:-/data/medgp}
EXP_ROOT=${EXP_ROOT:-/exp/medgp}
HERE=$(dirname "$0")

python -m medgp_tpu.cli.main generate \
  --data-root "$DATA_ROOT" --exp-root "$EXP_ROOT" --cohort heart_failure \
  --feature-config "$HERE/feature_all.json" \
  --opt-config "$HERE/opt_prior2.json" \
  --kernel LMC-SM --prior hier-gamma \
  --Q 5 --R 8 --eta 0.01 --beta-lam 0.01 \
  --cv-fold-num 10 --cv-seed 718 --exp-prefix jmlr
