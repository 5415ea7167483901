#!/bin/bash
# Binary-to-binary accuracy gate at FULL reference budgets (SCALE.md §6,
# round-5): train + test the staged PT/INR cohort with the REFERENCE
# executables (built by build.sh) and compare cohort MAE/CI against this
# framework's own full-budget run of the same cohort.
#
# Prerequisites:
#   tools/refbuild/build.sh                       (the binaries)
#   tools/refbudget_run.sh                        (stages the cohort and
#     runs the medgp_tpu arm into /tmp/refbudget/exp/full_*/)
#
# The reference arm reuses the same exp_setup.json with its train/test/
# kernel dirs redirected, so neither arm overwrites the other. Fold mode
# kernels for the reference test driver come from THIS repo's clustering
# over the REFERENCE-trained hypers (the cross-implementation handoff
# tests/test_refbuild.py proves at small budgets).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(cd "$HERE/../.." && pwd)"
SRC_CFG=${1:-/tmp/refbudget/exp/full_k7_q5_r2_p2_e0.01/config/exp_setup.json}
OUT=${2:-/tmp/refbin}

mkdir -p "$OUT"/{train,test,kernel,log}
python - "$SRC_CFG" "$OUT" <<'EOF'
import json, sys
src, out = sys.argv[1], sys.argv[2]
d = json.load(open(src))
for k, sub in [("exp_train_dir","train"),("exp_test_dir","test"),
               ("exp_kernel_dir","kernel"),("exp_log_dir","log")]:
    d[k] = f"{out}/{sub}"
json.dump(d, open(f"{out}/exp_setup.json","w"), indent=4)
EOF
CFG="$OUT/exp_setup.json"
DATA=$(python -c "import json;print(json.load(open('$CFG'))['data_dir'].rstrip('/'))")
LIST=$(python -c "import json;print(json.load(open('$CFG'))['cohort_id_list'])")

echo "[1/3] reference-binary training (full budgets)"
for pan in $(cat "$DATA/$LIST"); do
  [ -f "$OUT/train/train_flag_${pan}.txt" ] && continue
  "$HERE/build/main_one_train" --cfg "$CFG" --pan "$pan" --thread 2 \
    >> "$OUT/train_all.log" 2>&1
done

echo "[2/3] fold clustering over the reference-trained hypers"
cd "$REPO"
MEDGP_PLATFORM=cpu python - "$CFG" "$OUT" <<'EOF'
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from medgp_tpu.config.experiment import ExperimentConfig
from medgp_tpu.cluster.pipeline import kernel_clustering_fold
cfg = ExperimentConfig.from_json(sys.argv[1]); out = sys.argv[2]
for fold in range(-1, cfg.cv_fold_num):
    kernel_clustering_fold(cfg.spec(), f"{out}/train", f"{out}/kernel",
                           cfg.pans(), cfg.cv_assign(), fold,
                           algorithm="gmm", seed=0)
EOF

echo "[3/3] reference-binary testing + this repo's evaluator"
python - "$CFG" <<'EOF' > "$OUT/folds.txt"
import sys
import jax; jax.config.update("jax_platforms", "cpu")
from medgp_tpu.config.experiment import ExperimentConfig
cfg = ExperimentConfig.from_json(sys.argv[1])
for p, f in zip(cfg.pans(), cfg.cv_assign()):
    print(p, f)
EOF
while read pan fold; do
  "$HERE/build/main_one_test" --cfg "$CFG" --pan "$pan" --thread 2 \
    --fold "$fold" --kernclust-alg gmm >> "$OUT/test_all.log" 2>&1
done < "$OUT/folds.txt"
MEDGP_PLATFORM=cpu python -u -m medgp_tpu.cli.main eval --cfg "$CFG" \
  --test-mode mean_w_update
MEDGP_PLATFORM=cpu python -u -m medgp_tpu.cli.main eval --cfg "$CFG" \
  --test-mode mean_wo_update
echo "compare against the medgp_tpu arm's eval of the SAME cohort"
