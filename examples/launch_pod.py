"""Multi-host pod launch example.

The reference fans out one Slurm job per patient (run_exp_generator.py:213-263,
train_della.sh); here a pod slice runs the whole cohort in one program:
patients are LPT-balanced across hosts, each host drives its local chips, and
clustering statistics move over ICI/DCN collectives instead of files.

Submit with examples/slurm_pod.sh (emitted below) or run directly on each
host of the slice:

    python examples/launch_pod.py --cfg .../exp_setup.json
"""

import argparse
import os
import sys

try:
    from medgp_tpu.parallel.launch import init_distributed, write_slurm_launcher
except ModuleNotFoundError:  # running from a source checkout without install
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from medgp_tpu.parallel.launch import init_distributed, write_slurm_launcher


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--alg", default="gmm")
    ap.add_argument("--emit-slurm", metavar="PATH",
                    help="write an sbatch script instead of running")
    ap.add_argument("--num-hosts", type=int, default=4)
    args = ap.parse_args()

    if args.emit_slurm:
        path = write_slurm_launcher(
            args.emit_slurm, args.cfg, num_hosts=args.num_hosts, alg=args.alg
        )
        print(path)
        return

    init_distributed()  # no-op on a single host
    from medgp_tpu.cli.main import main as cli_main

    cli_main(["run", "--cfg", args.cfg, "--alg", args.alg])


if __name__ == "__main__":
    main()
