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


def write_scheduler_launcher(
    path: str,
    exp_cfg: str,
    num_hosts: int,
    scheduler: str = "slurm",
    partition: Optional[str] = None,
    time_limit: str = "4:00:00",
    memory: Optional[str] = None,
    alg: str = "gmm",
    extra_cmd: Optional[Sequence[str]] = None,
) -> str:
    """One scheduler script for the whole pod-slice run, in the reference's
    three flavors — slurm / pbs / sequential (hpc.py:4-37
    `write_scheduler_sh`) — but ONE job per pod slice instead of one per
    patient. `sequential` emits a plain shell wrapper for scheduler-less
    hosts (single-host runs or a bare TPU VM)."""
    run_cmd = f"python -m medgp_tpu.cli.main run --cfg {exp_cfg} --alg {alg}"
    lines = ["#!/bin/bash"]
    if scheduler == "slurm":
        lines += [
            f"#SBATCH -N {num_hosts}",
            "#SBATCH --ntasks-per-node=1",
            f"#SBATCH -t {time_limit}",
        ]
        if memory:
            lines.append(f"#SBATCH --mem={memory}")
        if partition:
            lines.append(f"#SBATCH -p {partition}")
        launch = f"srun {run_cmd}"
    elif scheduler == "pbs":
        lines += [
            f"#PBS -l select={num_hosts}:ncpus=1",
            f"#PBS -l walltime={time_limit}",
            "#PBS -V",
        ]
        launch = run_cmd
    elif scheduler == "sequential":
        launch = run_cmd
    else:
        raise NotImplementedError(
            f"scheduler {scheduler!r} (use slurm | pbs | sequential)"
        )
    lines += [
        "",
        "# one process per host; jax.distributed picks up the pod topology",
        launch,
    ]
    for cc in extra_cmd or ():
        lines.append(str(cc))
    lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    os.chmod(path, 0o775)
    return path


def write_slurm_launcher(
    path: str,
    exp_cfg: str,
    num_hosts: int,
    partition: Optional[str] = None,
    time_limit: str = "4:00:00",
    alg: str = "gmm",
) -> str:
    """Slurm convenience wrapper around :func:`write_scheduler_launcher`."""
    return write_scheduler_launcher(
        path, exp_cfg, num_hosts, scheduler="slurm",
        partition=partition, time_limit=time_limit, alg=alg,
    )
