"""Pod-level launch: multi-host initialization + optional scheduler scripts.

The reference's L5 is a Python generator emitting one Slurm/PBS job per
patient (run_exp_generator.py:213-263, hpc.py:4-37). The TPU-native
replacement is a single SPMD program per pod slice:

  * `init_distributed()` wires `jax.distributed.initialize` from standard TPU
    environment variables (or explicit args for CPU multi-process testing);
    every host then sees the global device mesh and runs the same
    `medgp-tpu run` entry point;
  * `host_shard()` splits the cohort across *hosts* for the IO-bound stages
    (each host loads/writes only its patients) while device-level sharding
    inside a host is handled by :mod:`medgp_tpu.parallel.mesh`;
  * `write_slurm_launcher()` still emits a batch script for sites that
    schedule pod jobs through Slurm — but it is ONE job per pod slice, not
    one per patient.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods all arguments come from the
    environment; pass them explicitly for CPU multi-process simulation."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def host_shard(
    pans: Sequence[str],
    costs: Optional[Sequence[float]] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[str]:
    """This host's patients, cost-balanced over hosts (LPT, deterministic)."""
    import jax

    from medgp_tpu.parallel.bucketing import balance_shards

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return list(pans)
    costs = (
        np.ones(len(pans)) if costs is None else np.asarray(costs, float)
    )
    shards = balance_shards(costs, pc)
    return [pans[i] for i in shards[pi]]


def write_slurm_launcher(
    path: str,
    exp_cfg: str,
    num_hosts: int,
    partition: Optional[str] = None,
    time_limit: str = "4:00:00",
    alg: str = "gmm",
) -> str:
    """One sbatch script for the whole pod-slice run (contrast: the reference
    emits thousands of per-patient sbatch lines)."""
    lines = [
        "#!/bin/bash",
        f"#SBATCH -N {num_hosts}",
        "#SBATCH --ntasks-per-node=1",
        f"#SBATCH -t {time_limit}",
    ]
    if partition:
        lines.append(f"#SBATCH -p {partition}")
    lines += [
        "",
        "# one process per host; jax.distributed picks up the pod topology",
        f"srun python -m medgp_tpu.cli.main run --cfg {exp_cfg} --alg {alg}",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    os.chmod(path, 0o775)
    return path
