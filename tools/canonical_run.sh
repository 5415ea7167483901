#!/usr/bin/env bash
# Canonical-scale flagship run (SCALE.md §2b): 1,024 synthetic 24-feature
# patients at the reference's FULL budgets (opt_prior2.json: 1,000 inits
# seed 718, 40x(100/30) varEM), canonical kernel Q=5 D=24 R=8 (H=1114),
# 10-fold CV, fused run (train -> kernclust -> test both modes -> eval)
# on whatever jax.devices() provides (one v5e in this environment).
#
#   bash tools/canonical_run.sh [WORKDIR] [SEED]
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/canon_r5}"
SEED="${2:-44}"
mkdir -p "$WORK"

python - "$WORK" "$SEED" <<'EOF'
import sys
from medgp_tpu.data.synthetic import (
    sample_cohort, write_reference_format_cohort,
)
from medgp_tpu.models.params import LMCSMSpec

work, seed = sys.argv[1], int(sys.argv[2])
spec = LMCSMSpec(5, 24, 8)
recs = sample_cohort(
    seed, spec, n_patients=1024, n_clusters=4, n_obs_range=(100, 400)
)
import json
feats = json.load(open("examples/feature_all.json"))
idx = [f["index"] for f in feats["feature_list"]]
write_reference_format_cohort(f"{work}/data/synth", recs, idx)
print("staged", len(recs), "patients")
EOF

python -u -m medgp_tpu.cli.main generate \
  --data-root "$WORK/data" --exp-root "$WORK/exp" --cohort synth \
  --feature-config "$ROOT/examples/feature_all.json" \
  --opt-config "$ROOT/examples/opt_prior2.json" \
  --kernel LMC-SM --prior hier-gamma --Q 5 --R 8 --eta 0.01 \
  --beta-lam 0.01 --cv-fold-num 10 --exp-prefix canon
CFG="$WORK/exp/canon_k7_q5_r8_p2_e0.01/config/exp_setup.json"
ls "$CFG"

time python -u -m medgp_tpu.cli.main run --cfg "$CFG" "${@:3}"
