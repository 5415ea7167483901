"""Device-mesh sharding: patients over chips, collectives over ICI.

The reference's only distribution axis is patient-level data parallelism via
Slurm job fan-out with filesystem joins (SURVEY §2.4). Here:

  * a 1-D `Mesh` axis "patients" shards the padded patient batch over all
    chips (multi-host: `jax.distributed.initialize` makes the same code span
    hosts; the axis then rides ICI within a host/pod slice and DCN across);
  * the cross-patient aggregation points (population clustering inputs,
    cohort metrics) become in-program collectives (`all_gather` of per-patient
    hyper vectors, `psum` of metric sums) instead of file gathers;
  * restart/chain parallelism can occupy a second mesh axis when chips
    outnumber patients.

Everything uses `shard_map` with explicit PartitionSpecs — no reliance on
auto-spmd for the batch axis — so collective placement is deterministic.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medgp_tpu.data.inits import random_inits
from medgp_tpu.infer.map_train import train_one_patient
from medgp_tpu.models.gp import PatientData
from medgp_tpu.models.params import KernelSpec, LMCSMSpec


def cohort_mesh(devices: Optional[Sequence] = None, axis: str = "patients") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def pad_batch_to(batch: PatientData, b_target: int) -> PatientData:
    """Pad the patient axis with all-masked dummies so it shards evenly."""
    b = batch.t.shape[0]
    if b == b_target:
        return batch
    pad = b_target - b
    z = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    return PatientData(t=z(batch.t), y=z(batch.y), meta=z(batch.meta),
                       mask=z(batch.mask))


def sharded_train_step(
    spec: KernelSpec,
    mesh: Mesh,
    inits: jnp.ndarray,
    prior_mode: int = 2,
    eta: float = 0.01,
    beta_lam: float = 0.01,
    top_iters: int = 2,
    sub_opt_iter: int = 10,
    axis: str = "patients",
):
    """Build the jitted multi-chip training step.

    Input: a padded PatientData batch whose leading axis is divisible by the
    mesh size. Each device trains its local patients (vmap inside shard_map),
    then the per-patient hyper vectors and flags are all_gathered across the
    mesh — the in-program replacement for the train->kernclust file boundary
    (train_hyp_*.bin + train_flag_*.txt, main_one_train.cpp:297-323).
    Returns replicated (thetas (B,H), losses (B,), flags (B,)).
    """

    def local_train(t, y, meta, mask):
        def one(t1, y1, m1, k1):
            r = train_one_patient(
                spec,
                PatientData(t=t1, y=y1, meta=m1, mask=k1),
                inits,
                prior_mode=prior_mode,
                eta=eta,
                beta_lam=beta_lam,
                top_iters=top_iters,
                sub_opt_iter=sub_opt_iter,
            )
            return r.theta, r.loss, r.flag

        theta, loss, flag = jax.vmap(one)(t, y, meta, mask)
        # cross-patient gather over ICI: clustering consumes the full set
        theta_all = jax.lax.all_gather(theta, axis, tiled=True)
        loss_all = jax.lax.all_gather(loss, axis, tiled=True)
        flag_all = jax.lax.all_gather(flag, axis, tiled=True)
        return theta_all, loss_all, flag_all

    # check_vma=False: the varying-manual-axes checker rejects while_loop
    # carries initialized from literals (every SCG/varEM loop does this);
    # treating all values as varying is the pre-checker semantics and is
    # correct here.
    shard = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(batch: PatientData):
        return shard(batch.t, batch.y, batch.meta, batch.mask)

    return step


def clustering_sufficient_stats(mesh: Mesh, axis: str = "patients"):
    """psum-based cross-patient reduction: per-output noise sums and B-matrix
    sums for population summaries, computed in-program instead of a file
    gather (the reference's binaryIO.py:20-35 + mode_estimate.py pipeline
    reads every train_hyp file from disk)."""

    def local_stats(noise_std, B_total, flags):
        w = flags.astype(noise_std.dtype)[:, None]
        s1 = jax.lax.psum(jnp.sum(noise_std * w, 0), axis)
        s2 = jax.lax.psum(
            jnp.sum(B_total * w[..., None], 0), axis
        )
        cnt = jax.lax.psum(jnp.sum(flags.astype(jnp.float32)), axis)
        return s1 / cnt, s2 / cnt, cnt

    return jax.jit(
        jax.shard_map(
            local_stats,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


def large_patient_nlml(spec: LMCSMSpec, mesh: Mesh, axis: str = "patients"):
    """Sharded NLML for one outlier-large patient: observations laid out over
    the mesh axis; the gram is built row-sharded and the Cholesky is handled
    by XLA's distributed factorization under jit (GSPMD). This is the
    'sequence-length scaling' analog of the reference's 100k-observation top
    Slurm tier (slurm_della.json:51-61): the n x n gram no longer has to fit
    one device."""
    from medgp_tpu.models.gp import nlml_fn

    def step(theta, t, y, meta, mask):
        data = PatientData(t=t, y=y, meta=meta, mask=mask)
        value, res = nlml_fn(spec, data)(theta)
        return value, res.ok

    jitted = jax.jit(step)

    def call(theta, t, y, meta, mask):
        sh = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        t, y, meta, mask = (
            jax.device_put(t, sh),
            jax.device_put(y, sh),
            jax.device_put(meta, sh),
            jax.device_put(mask, sh),
        )
        theta = jax.device_put(theta, rep)
        return jitted(theta, t, y, meta, mask)

    return call
