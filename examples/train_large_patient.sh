#!/bin/bash
# Train an outlier-large patient (the reference's 10k-100k-observation Slurm
# tier, scripts/slurm_della.json:51-61) through the row-sharded distributed
# objective. Patients with n_obs > cfg.large_patient_threshold (default
# 8192, override with --large-threshold) bypass bucketing and train via the
# distributed blocked-Cholesky NLML+gradient over every visible device —
# no (n, n) buffer exists on any chip, so patient length scales with the
# mesh, not with one device's HBM.
#
# Measured (SCALE.md §2): n=16,384 trains end-to-end on an 8-device mesh.
set -e
CFG=${1:?usage: train_large_patient.sh <exp_setup.json> [threshold]}
THRESH=${2:-8192}

python -m medgp_tpu.cli.main train --cfg "$CFG" \
  --large-threshold "$THRESH" \
  --restarts 64  # screen budget for large patients (cfg.large_patient_restarts caps it;
                 # 8 was shown basin-insufficient at n=8192, SCALE.md §7)
