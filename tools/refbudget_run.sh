#!/bin/bash
# BASELINE configs[0]/[1] at REFERENCE budgets (VERDICT r3 missing #2):
# PT/INR 2-feature cohort, 100 patients, 1000 random inits (seed 718),
# 40 x (100/30) varEM — the budgets of scripts/opt_prior2.json — driven
# through the fused CLI pipeline on the real chip. A second pass at the
# round-3 reduced budgets (16 inits, 2x8) runs on the same cohort for the
# accuracy-delta table in SCALE.md.
set -x
cd /root/repo
ROOT=${1:-/tmp/refbudget}
rm -rf $ROOT && mkdir -p $ROOT
python - <<'EOF'
from medgp_tpu.data.synthetic import sample_cohort, write_reference_format_cohort
from medgp_tpu.models.params import LMCSMSpec
recs = sample_cohort(718, LMCSMSpec(5, 2, 2), n_patients=100, n_clusters=3,
                     n_obs_range=(40, 220))
write_reference_format_cohort("/tmp/refbudget/data/ptinr", recs, [18, 19])
print("staged", len(recs), "patients")
EOF
python -u -m medgp_tpu.cli.main generate --data-root $ROOT/data \
  --exp-root $ROOT/exp --cohort ptinr \
  --feature-config examples/feature_PT_INR.json \
  --opt-config examples/opt_prior2.json --kernel LMC-SM --prior hier-gamma \
  --Q 5 --R 2 --eta 0.01 --beta-lam 0.01 --cv-fold-num 10 --exp-prefix full
CFG=$ROOT/exp/full_k7_q5_r2_p2_e0.01/config/exp_setup.json
python -u -m medgp_tpu.cli.main run --cfg $CFG 2>&1 | tail -40

# reduced-budget control on the SAME cohort
python -u -m medgp_tpu.cli.main generate --data-root $ROOT/data \
  --exp-root $ROOT/exp --cohort ptinr \
  --feature-config examples/feature_PT_INR.json \
  --kernel LMC-SM --prior hier-gamma \
  --Q 5 --R 2 --eta 0.01 --beta-lam 0.01 --cv-fold-num 10 --exp-prefix reduced
CFG2=$ROOT/exp/reduced_k7_q5_r2_p2_e0.01/config/exp_setup.json
python - <<EOF
import json
p = "$CFG2"
d = json.load(open(p))
d["random_init_num"] = 16
d["top_iteration_num"] = 2
d["iteration_num_per_update"] = 8
json.dump(d, open(p, "w"), indent=1)
EOF
python -u -m medgp_tpu.cli.main run --cfg $CFG2 2>&1 | tail -6
echo REFBUDGET_DONE
