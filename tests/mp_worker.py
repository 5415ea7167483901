"""Worker process for the executed multi-host test (SURVEY §4e).

Run as: python tests/mp_worker.py <pid> <nprocs> <coordinator> <out.npz>

Each OS process simulates one pod host with 4 virtual CPU devices; the two
processes form one global 8-device mesh via `jax.distributed.initialize`
(Gloo CPU collectives). The worker exercises the REAL pod entry points:
`launch.init_distributed`, `launch.host_shard` (the per-host cohort split
replacing run_exp_generator.py:213-263's Slurm fan-out), the global-mesh
`sharded_train_step`, and a cross-process `population_noise_mode` collective
— then saves its host-local result shard for the pytest parent to check
against single-process training.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

N_PATIENTS, N_OBS = 8, 16
SPEC_ARGS = (1, 2, 1)  # Q, D, R


def build_cohort():
    """Deterministic ground-truth cohort, identical in every process."""
    rng = np.random.default_rng(718)
    ts, ys, metas = [], [], []
    for _ in range(N_PATIENTS):
        t = np.sort(rng.uniform(0, 72, size=N_OBS))
        meta = rng.integers(0, SPEC_ARGS[1], size=N_OBS)
        meta[:4] = [0, 1, 0, 1]
        y = np.sin(0.3 * t) + 0.1 * rng.normal(size=N_OBS)
        ts.append(t)
        ys.append(y)
        metas.append(meta)
    return (
        np.asarray(ts, np.float32),
        np.asarray(ys, np.float32),
        np.asarray(metas, np.int32),
        np.ones((N_PATIENTS, N_OBS), np.float32),
    )


def main(pid, nprocs, coordinator, out_path):
    from medgp_tpu.parallel.launch import host_shard, init_distributed

    init_distributed(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from medgp_tpu.data.inits import default_bounds, random_inits
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.parallel.mesh import (
        cohort_mesh,
        population_noise_mode,
        sharded_train_step,
    )

    spec = LMCSMSpec(*SPEC_ARGS)
    t, y, meta, mask = build_cohort()
    pans = [f"p{i}" for i in range(N_PATIENTS)]

    # per-host cohort split for the IO-bound stages
    mine = host_shard(pans, costs=[float(N_OBS)] * N_PATIENTS)

    # global mesh across both processes; one sharded train step
    mesh = cohort_mesh()
    inits = random_inits(
        jax.random.key(0), spec, default_bounds(spec), 4
    )
    step = sharded_train_step(
        spec, mesh, inits, prior_mode=2, top_iters=2, sub_opt_iter=8
    )

    def to_global(a):
        local = a[pid * (N_PATIENTS // nprocs):(pid + 1) * (N_PATIENTS // nprocs)]
        return multihost_utils.host_local_array_to_global_array(
            local, mesh, P("patients")
        )

    from medgp_tpu.models.gp import PatientData

    batch = PatientData(
        t=to_global(t), y=to_global(y), meta=to_global(meta),
        mask=to_global(mask),
    )
    res = jax.block_until_ready(step(batch))

    # a real cross-process collective: population noise mode over all 8
    # patients' trained hypers (all_gather spans the process boundary)
    noise_fn = population_noise_mode(spec, mesh)
    nm = noise_fn(res.theta, res.flag.astype(jnp.float32))

    local_theta = multihost_utils.global_array_to_host_local_array(
        res.theta, mesh, P("patients")
    )
    local_loss = multihost_utils.global_array_to_host_local_array(
        res.loss, mesh, P("patients")
    )
    local_flag = multihost_utils.global_array_to_host_local_array(
        res.flag, mesh, P("patients")
    )
    np.savez(
        out_path,
        mine=np.asarray(mine, dtype=object).astype(str),
        theta=np.asarray(local_theta),
        loss=np.asarray(local_loss),
        flag=np.asarray(local_flag),
        noise_mode=np.asarray(
            nm.addressable_shards[0].data
            if hasattr(nm, "addressable_shards") else nm
        ),
        process_index=jax.process_index(),
    )
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
