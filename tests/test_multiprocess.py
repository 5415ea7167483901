"""EXECUTED multi-host path (SURVEY §4e): two OS processes with 4 virtual
CPU devices each form one global 8-device mesh via
`jax.distributed.initialize` + Gloo CPU collectives, run `host_shard` and the
global-mesh sharded train step, and the merged results must equal
single-process training. This is the test the reference could never have —
its jobs never communicate (README.md:2: "distributed" = Slurm fan-out)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", coord, outs[i]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, lg in zip(procs, logs):
        if p.returncode != 0:
            pytest.fail(f"worker rc={p.returncode}:\n{lg[-3000:]}")

    w = [np.load(o, allow_pickle=True) for o in outs]

    # host_shard partitions the cohort across the two processes
    mine0, mine1 = set(w[0]["mine"]), set(w[1]["mine"])
    assert mine0 | mine1 == {f"p{i}" for i in range(8)}
    assert not (mine0 & mine1)
    assert len(mine0) == len(mine1) == 4

    # merged device-order results == single-process (8-virtual-device) run
    theta_mp = np.concatenate([w[0]["theta"], w[1]["theta"]])
    loss_mp = np.concatenate([w[0]["loss"], w[1]["loss"]])
    flag_mp = np.concatenate([w[0]["flag"], w[1]["flag"]])
    assert flag_mp.all()

    from medgp_tpu.data.inits import default_bounds, random_inits
    from medgp_tpu.models.gp import PatientData
    from medgp_tpu.models.params import LMCSMSpec
    from medgp_tpu.parallel.mesh import cohort_mesh, sharded_train_step
    from tests.mp_worker import SPEC_ARGS, build_cohort

    spec = LMCSMSpec(*SPEC_ARGS)
    t, y, meta, mask = build_cohort()
    inits = random_inits(jax.random.key(0), spec, default_bounds(spec), 4)
    step = sharded_train_step(
        spec, cohort_mesh(), inits, prior_mode=2, top_iters=2, sub_opt_iter=8
    )
    ref = jax.block_until_ready(
        step(
            PatientData(
                t=jnp.asarray(t), y=jnp.asarray(y),
                meta=jnp.asarray(meta), mask=jnp.asarray(mask),
            )
        )
    )
    np.testing.assert_allclose(
        loss_mp, np.asarray(ref.loss), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        theta_mp, np.asarray(ref.theta), rtol=1e-3, atol=1e-3
    )

    # the cross-process all_gather collective produced identical population
    # noise modes on both hosts, equal to the host-side KDE over ALL patients
    np.testing.assert_allclose(w[0]["noise_mode"], w[1]["noise_mode"],
                               rtol=1e-6)
    from medgp_tpu.cluster.kde import kde_mode

    D = spec.n_lik
    for d in range(D):
        want = kde_mode(
            np.exp(np.asarray(ref.theta)[:, d].astype(np.float64)),
            weighted=True,
        )
        np.testing.assert_allclose(
            w[0]["noise_mode"][d], np.log(want), rtol=2e-3
        )
