#!/bin/bash
# Full pipeline on one host (any number of local TPU chips): the fused
# equivalent of the reference's run_train_all.sh -> run_kernclust_all.sh ->
# run_test_all.sh -> run_eval_all.sh Slurm fan-out.
set -euo pipefail

CFG=${1:?usage: run_pipeline.sh /path/to/exp_setup.json}
python -m medgp_tpu.cli.main run --cfg "$CFG" --alg gmm
