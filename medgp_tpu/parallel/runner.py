"""Cohort-level execution: batched training and testing over padded buckets.

This is the production engine replacing the reference's one-Slurm-job-per-
patient fan-out (run_exp_generator.py:213-263): each padded bucket of
patients runs as ONE jitted, vmapped program; buckets reuse compiled
executables across equal shapes. Whenever more than one device is visible
(one host's chips, or a pod slice under `jax.distributed`), every bucket is
sharded over the device mesh via the shard_map builders in
:mod:`medgp_tpu.parallel.mesh` — patients over chips, results gathered back
to the host in one transfer (the in-memory replacement for the reference's
per-patient result files).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from medgp_tpu.config.experiment import ExperimentConfig
from medgp_tpu.data import formats
from medgp_tpu.data.cohort import PaddedBatch, PatientRecord, pack_patients
from medgp_tpu.data.inits import random_inits
from medgp_tpu.infer.map_train import train_one_patient
from medgp_tpu.infer.online import online_impute, unique_times
from medgp_tpu.models.gp import PatientData
from medgp_tpu.models.params import LMCSMSpec
from medgp_tpu.models.priors import clamp_a_elements, empty_prior

log = logging.getLogger("medgp_tpu")


def stage_metrics(cfg: ExperimentConfig):
    """The run's single aggregated metrics writer (SURVEY §5.5): every stage
    appends typed scalar records to log/metrics.jsonl next to the reference's
    per-job text logs. A config without a log dir gets a no-op writer."""
    import os

    from medgp_tpu.utils.metrics import MetricsWriter

    path = (
        os.path.join(cfg.exp_log_dir, "metrics.jsonl")
        if cfg.exp_log_dir
        else None
    )
    run_id = os.path.basename(cfg.exp_top_dir.rstrip("/")) or "run"
    return MetricsWriter(path, run_id=run_id)


def _batch_data(b: PaddedBatch) -> PatientData:
    return PatientData(
        t=jnp.asarray(b.t),
        y=jnp.asarray(b.y),
        meta=jnp.asarray(b.meta),
        mask=jnp.asarray(b.mask),
    )


def _mesh_or_none(use_mesh: Optional[bool]):
    """The production mesh policy: shard over all visible devices when there
    is more than one (use_mesh=None), or as forced by the caller."""
    from medgp_tpu.parallel.mesh import cohort_mesh

    devices = jax.devices()
    on = use_mesh if use_mesh is not None else len(devices) > 1
    return cohort_mesh(devices) if on else None


def _round_up_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_rows(a: np.ndarray, b_target: int) -> np.ndarray:
    if a.shape[0] == b_target:
        return a
    pad = b_target - a.shape[0]
    return np.concatenate(
        [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )


def _mesh_multiple(B: int, mesh) -> int:
    n_dev = mesh.devices.size
    return -(-B // n_dev) * n_dev


def _pad_batch_pow2(
    B: int, mesh=None, minimum: int = 8, n_max: Optional[int] = None,
    cap_div: int = 1,
) -> int:
    """Canonical padded batch: next power of two (>= minimum), then a mesh
    multiple. Bounds the number of DISTINCT compiled program shapes to
    O(log max_batch) per (stage, n_max) instead of one per raw bucket size
    — a 1,024-patient canonical run compiled 100 test programs for 1,554 s
    against ~200 s of execute before this (round 4); masked dummy rows
    cost at most 2x execute on the padded fraction.

    When `n_max` is given, padding never grows the PER-DEVICE footprint
    beyond the HBM envelope (utils/hbm.py): a bucket that pack_patients
    capped at B=4 for n_max=2048 must not be padded back to 8, which
    would recreate the exact 128*512^2-entry programs that device-fault
    on a 16 GiB v5e. With a mesh the batch is sharded across devices, so
    the envelope applies to Bp / n_dev."""
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    cap = None
    if n_max is not None:
        from medgp_tpu.utils.hbm import bucket_cap

        cap = max(1, bucket_cap(n_max) // max(cap_div, 1)) * n_dev
        minimum = min(minimum, cap)
    Bp = max(1, minimum)
    while Bp < B:
        Bp *= 2
    if cap is not None and Bp > max(B, cap):
        Bp = max(B, cap)
    if mesh is not None:
        Bp = -(-Bp // n_dev) * n_dev
    return Bp


def _run_compiled(jitted, cache, key, args, metrics, stage, **meta):
    """Execute a jitted program via an explicitly compiled executable,
    recording compile time separately from execute time (SURVEY §5.5's
    observability gap; with the persistent cache enabled the compile record
    collapses to near zero on the second identical run)."""
    if key not in cache:
        t0 = time.time()
        cache[key] = jitted.lower(*args).compile()
        dt = time.time() - t0
        log.info("compiled %s program %s in %.1fs", stage, key, dt)
        metrics.write(f"{stage}_compile", seconds=dt, **meta)
    return cache[key](*args)


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def train_cohort(
    cfg: ExperimentConfig,
    records: Sequence[PatientRecord],
    n_restarts: Optional[int] = None,
    write: bool = True,
    max_batch: int = 128,
    ckpt_dir: Optional[str] = None,
    use_mesh: Optional[bool] = None,
    large_threshold: Optional[int] = None,
) -> Dict[str, dict]:
    """Train every patient; returns {pan: result dict} and optionally writes
    the reference train artifacts.

    Patients with n_obs > `large_threshold` (default
    cfg.large_patient_threshold) bypass bucketing entirely and train through
    the row-sharded distributed objective (infer/large_train.py) — over the
    cohort mesh when several devices are visible, or a 1-device mesh on a
    single chip (the blocked objective keeps one n^2 gram resident instead
    of the screen's chunk x n^2) — the product path for the reference's
    10k-100k observation Slurm tier (scripts/slurm_della.json:51-61).

    The restart set is shared by all patients, matching the reference where
    every per-patient process seeds `srand(random_seed)` identically and
    generates the same init sequence (c_experiment.cpp:418-441).

    With more than one visible device (or use_mesh=True) each bucket is
    padded to a mesh multiple and trained through the shard_map path —
    patients over chips; use_mesh=False forces the single-device jit(vmap).

    With `ckpt_dir`, completed buckets are checkpointed and a re-run resumes
    at the first unfinished bucket (the whole-run resumability the
    reference's per-stage file overwrites cannot provide; SURVEY §5.4).
    """
    import hashlib

    from medgp_tpu.utils.checkpoints import CohortCheckpointer

    spec = cfg.spec()
    bounds = cfg.bounds()
    S = n_restarts or cfg.random_init_num
    inits = random_inits(jax.random.key(cfg.random_seed), spec, bounds, S)

    mesh = _mesh_or_none(use_mesh)
    ndev = 1 if mesh is None else int(mesh.devices.size)

    thr = (
        large_threshold if large_threshold is not None
        else cfg.large_patient_threshold
    )
    large_recs = []
    large_mesh = mesh
    if isinstance(spec, LMCSMSpec):
        large_recs = [r for r in records if r.n_obs > thr]
        if large_recs:
            records = [r for r in records if r.n_obs <= thr]
            if large_mesh is None:
                # single chip: the row-blocked objective still beats dense
                # bucketing — the restart screen's chunked vmap would
                # materialize screen_chunk x (n,n) grams (32 x 16384^2 fp32
                # = 32 GB >> HBM), while the blocked path keeps ONE n^2
                # resident (~6 n^2 fp32 peak incl. workspaces; see SCALE.md
                # for the per-chip HBM formula). Run it on a 1-device mesh.
                from medgp_tpu.parallel.mesh import cohort_mesh

                large_mesh = cohort_mesh(jax.devices()[:1])

    batches = pack_patients(
        records, max_batch=_round_up_to(max_batch, ndev),
        batch_multiple=ndev,
    )
    ckpt = CohortCheckpointer(ckpt_dir) if ckpt_dir else None

    def bucket_key(b: PaddedBatch) -> np.ndarray:
        h = hashlib.sha256("|".join(b.pans).encode()).digest()[:8]
        return np.frombuffer(h, np.int64)
    train_kwargs = dict(
        prior_mode=cfg.prior_index,
        eta=cfg.eta,
        beta_lam=cfg.beta_lam,
        top_iters=cfg.top_iteration_num,
        sub_opt_iter=cfg.iteration_num_per_update,
    )

    metrics = stage_metrics(cfg)
    compiled: Dict[tuple, object] = {}
    if mesh is not None:
        from medgp_tpu.parallel.mesh import pad_batch_to, sharded_train_step

        step = sharded_train_step(spec, mesh, inits, **train_kwargs)

        def run_batch(data: PatientData):
            B = data.t.shape[0]
            padded = pad_batch_to(
                data, _pad_batch_pow2(B, mesh, n_max=data.t.shape[1])
            )
            res = _run_compiled(
                step, compiled, padded.t.shape, (padded,), metrics, "train",
                n_max=padded.t.shape[1], batch=padded.t.shape[0],
            )
            return jax.tree.map(lambda a: a[:B], res)
    else:
        @partial(jax.jit, static_argnames=())
        def batch_fn(data: PatientData):
            from medgp_tpu.infer.map_train import adaptive_screen_chunk

            chunk = adaptive_screen_chunk(*data.t.shape)

            def one(t, y, meta, mask):
                return train_one_patient(
                    spec,
                    PatientData(t=t, y=y, meta=meta, mask=mask),
                    inits,
                    screen_chunk=chunk,
                    **train_kwargs,
                )

            return jax.vmap(one)(data.t, data.y, data.meta, data.mask)

        def run_batch(data: PatientData):
            from medgp_tpu.parallel.mesh import pad_batch_to

            B = data.t.shape[0]
            padded = pad_batch_to(
                data, _pad_batch_pow2(B, n_max=data.t.shape[1])
            )
            res = _run_compiled(
                batch_fn, compiled, padded.t.shape, (padded,), metrics,
                "train", n_max=padded.t.shape[1], batch=padded.t.shape[0],
            )
            return jax.tree.map(lambda a: a[:B], res)

    out: Dict[str, dict] = {}
    for bidx, b in enumerate(batches):
        restored = None
        if ckpt is not None:
            saved = ckpt.load_bucket(bidx)
            if saved is not None and np.array_equal(
                saved.get("key"), bucket_key(b)
            ):
                restored = saved
                log.info(
                    "resumed bucket %d (n_max=%d B=%d) from checkpoint",
                    bidx, b.n_max, len(b),
                )
        if restored is not None:
            theta = restored["theta"]
            init_theta = restored["init_theta"]
            flags = restored["flag"].astype(bool)
            losses = restored["loss"]
            nobs = restored["n_obs"]
            var_flat = restored.get("var_flat")
        else:
            t0 = time.time()
            res = jax.block_until_ready(run_batch(_batch_data(b)))
            dt = time.time() - t0
            log.info(
                "trained bucket n_max=%d B=%d on %d device(s) in %.1fs "
                "(%.2f patients/s)",
                b.n_max, len(b), 1 if mesh is None else mesh.devices.size,
                dt, len(b) / dt,
            )
            metrics.write(
                "train", bucket=bidx, n_max=b.n_max, batch=len(b),
                devices=1 if mesh is None else mesh.devices.size,
                seconds=dt, patients_per_sec=len(b) / dt,
                nlml=np.asarray(res.loss, np.float64),
                trained=int(np.asarray(res.flag).sum()),
            )
            theta = np.asarray(res.theta, np.float64)
            init_theta = np.asarray(res.init_theta, np.float64)
            flags = np.asarray(res.flag)
            losses = np.asarray(res.loss, np.float64)
            nobs = np.asarray(res.n_obs)
            var_flat = (
                np.concatenate(
                    [
                        np.asarray(res.var_state.psi).reshape(len(b), -1),
                        np.asarray(res.var_state.delta).reshape(len(b), -1),
                        np.asarray(res.var_state.phi).reshape(len(b), -1),
                        np.asarray(res.var_state.tau).reshape(len(b), -1),
                    ],
                    axis=1,
                ).astype(np.float64)
                if cfg.prior_index == 2
                else None
            )
            if ckpt is not None:
                state = dict(
                    key=bucket_key(b), theta=theta, init_theta=init_theta,
                    flag=flags.astype(np.int8), loss=losses, n_obs=nobs,
                )
                if var_flat is not None:
                    state["var_flat"] = var_flat
                ckpt.save_bucket(bidx, state)
        for i, pan in enumerate(b.pans):
            out[pan] = dict(
                theta=theta[i],
                init_theta=init_theta[i],
                flag=bool(flags[i]),
                loss=float(losses[i]),
                n_obs=int(nobs[i]),
                var_state=None if var_flat is None else var_flat[i],
            )
            if write:
                formats.write_train_result(
                    cfg.exp_train_dir, pan,
                    theta[i], init_theta[i],
                    None if var_flat is None else var_flat[i],
                    bool(flags[i]), int(nobs[i]),
                )

    if large_recs:
        from medgp_tpu.infer.large_train import train_one_large_patient

        ndev_large = int(large_mesh.devices.size)
        S_large = min(S, cfg.large_patient_restarts)
        for rec in large_recs:
            t0 = time.time()
            res = train_one_large_patient(
                spec, rec.t, rec.y, rec.meta, large_mesh, inits[:S_large],
                prior_mode=cfg.prior_index, eta=cfg.eta,
                beta_lam=cfg.beta_lam, top_iters=cfg.top_iteration_num,
                sub_opt_iter=cfg.iteration_num_per_update,
            )
            dt = time.time() - t0
            log.info(
                "trained LARGE patient %s (n=%d, row-sharded over %d "
                "devices) in %.1fs: flag=%s loss=%.3f",
                rec.pan, rec.n_obs, ndev_large, dt, res["flag"],
                res["loss"],
            )
            metrics.write(
                "train_large", pan=rec.pan, n_obs=rec.n_obs,
                devices=ndev_large,
                seconds=dt, nlml=res["loss"], trained=int(res["flag"]),
            )
            out[rec.pan] = res
            if write:
                formats.write_train_result(
                    cfg.exp_train_dir, rec.pan,
                    res["theta"], res["init_theta"], res["var_state"],
                    res["flag"], res["n_obs"],
                )
    return out


# --------------------------------------------------------------------------
# HMC/NUTS posterior sampling
# --------------------------------------------------------------------------

def hmc_cohort(
    cfg: ExperimentConfig,
    records: Sequence[PatientRecord],
    num_chains: int = 4,
    num_warmup: int = 300,
    num_samples: int = 300,
    num_leapfrog: int = 16,
    init_step_size: float = 0.005,
    write: bool = True,
    seed: int = 0,
    sampler: str = "hmc",
    max_depth: int = 6,
    max_batch: int = 32,
    use_mesh: Optional[bool] = None,
    large_threshold: Optional[int] = None,
) -> Dict[str, dict]:
    """Posterior inference for every trained patient (the capability the
    reference lacks). Initializes each patient at its MAP hypers
    (train_hyp_*.bin) and writes posterior artifacts next to them:
    train_{hmc|vi}_mean_{pan}.bin (flat posterior-mean theta, reference
    double-bin format) and train_{hmc|vi}_samples_{pan}.npz (chains x samples
    x H plus diagnostics). `sampler` is "hmc" (jittered trajectories,
    `num_leapfrog`), "nuts" (adaptive trajectories, `max_depth`), or "vi"
    (mean-field ADVI; `num_samples` draws from the fitted q, `num_warmup`
    reused as the number of ADVI optimization steps).

    Patients are bucketed and padded like the train path — each bucket runs
    chains x patients as ONE program (sharded over the mesh when more than
    one device is visible); buckets of equal shape reuse the compiled
    executable instead of re-jitting per distinct n.
    """
    import os

    from medgp_tpu.infer.hmc import hmc_patient
    from medgp_tpu.infer.nuts import nuts_patient
    from medgp_tpu.infer.vi import vi_patient
    from medgp_tpu.models.priors import hier_gamma_prior

    if sampler not in ("hmc", "nuts", "vi"):
        raise ValueError(
            f"unknown sampler {sampler!r} (use 'hmc', 'nuts' or 'vi')"
        )

    spec = cfg.spec()
    prior = (
        hier_gamma_prior(spec, beta_lam=cfg.beta_lam)
        if cfg.prior_index == 2 and isinstance(spec, LMCSMSpec)
        else None
    )
    pans, hyps = formats.read_train_kernels(
        cfg.exp_train_dir, [r.pan for r in records]
    )
    by_pan = {p: h for p, h in zip(pans, hyps)}
    key = jax.random.key(seed)

    common = dict(
        prior=prior, num_chains=num_chains,
        num_warmup=num_warmup, num_samples=num_samples,
        init_step_size=init_step_size,
    )

    def one(theta0, t, y, meta, mask, sub):
        data = PatientData(t=t, y=y, meta=meta, mask=mask)
        if sampler == "nuts":
            return nuts_patient(
                spec, data, theta0, sub, max_depth=max_depth, **common
            )
        if sampler == "vi":
            return vi_patient(
                spec, data, theta0, sub, prior=prior,
                num_steps=num_warmup, num_samples=num_samples,
            )
        return hmc_patient(
            spec, data, theta0, sub, num_leapfrog=num_leapfrog, **common
        )

    metrics = stage_metrics(cfg)
    mesh = _mesh_or_none(use_mesh)
    ndev = 1 if mesh is None else int(mesh.devices.size)
    if mesh is not None:
        from medgp_tpu.parallel.mesh import sharded_sampler_step

        run_bucket = sharded_sampler_step(one, mesh)
    else:
        run_bucket = jax.jit(jax.vmap(one))

    # outlier-large patients (trained via the row-sharded objective) must
    # not enter the bucketed sampler: its padded path materializes a full
    # (n, n) gram per patient per chain on one device, which OOMs at the
    # 10k-100k-observation tier. Skip them explicitly; they keep their MAP
    # hypers downstream.
    thr = (
        large_threshold if large_threshold is not None
        else cfg.large_patient_threshold
    )
    skipped = [r.pan for r in records if r.n_obs > thr]
    if skipped:
        log.warning(
            "%s: skipping %d patient(s) above large-patient threshold "
            "n_obs>%d (%s) — bucketed posterior sampling would build an "
            "(n,n) gram per chain; these patients keep their MAP hypers",
            sampler, len(skipped), thr, ", ".join(skipped[:5]),
        )
        metrics.write(
            "sampler_skip", sampler=sampler, reason="large_patient",
            threshold=thr, pans=",".join(skipped), n_skipped=len(skipped),
        )
    trained = [
        r for r in records
        if r.pan in by_pan and 0 < r.n_obs <= thr
    ]
    # sampler programs materialize ~2 (n, n) gram buffers per CHAIN per
    # patient (leapfrog old/new); scale the HBM-envelope cap accordingly
    # — the 2-chain 512-draw HMC program at the train cap (B=32, n=512)
    # reproducibly device-faults on a 16 GiB v5e (round 5)
    chains = 1 if sampler == "vi" else num_chains
    batches = pack_patients(
        trained, max_batch=_round_up_to(max_batch, ndev),
        batch_multiple=ndev, footprint_mult=2 * chains,
    )

    compiled: Dict[tuple, object] = {}
    out: Dict[str, dict] = {}
    # machine-visible record of the large-patient skips (not just a log
    # line): downstream consumers expecting a sample entry per trained
    # patient can see WHY one is absent.
    for pan in skipped:
        out[pan] = {"flag": False, "reason": "large_patient"}
    for b in batches:
        B = len(b)
        Bp = _pad_batch_pow2(
            B, mesh, n_max=b.n_max, cap_div=2 * chains
        )
        theta0s = _pad_rows(
            np.stack([by_pan[p] for p in b.pans]).astype(np.float32), Bp
        )
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, Bp)
        args = (
            jnp.asarray(theta0s),
            jnp.asarray(_pad_rows(b.t, Bp)),
            jnp.asarray(_pad_rows(b.y, Bp)),
            jnp.asarray(_pad_rows(b.meta, Bp)),
            jnp.asarray(_pad_rows(b.mask, Bp)),
            keys,
        )
        t0 = time.time()
        res = jax.block_until_ready(
            _run_compiled(
                run_bucket, compiled, (Bp, b.n_max), args, metrics, sampler,
                n_max=b.n_max, batch=Bp,
            )
        )
        dt = time.time() - t0
        chains = 1 if sampler == "vi" else num_chains
        log.info(
            "%s bucket B=%d n_max=%d: %d chains x %d samples/patient in "
            "%.1fs (%.1f samples/s)",
            sampler, B, b.n_max, chains, num_samples, dt,
            B * chains * num_samples / dt,
        )
        diag_scalars = (
            dict(elbo=np.asarray(res.elbo)[:B])
            if sampler == "vi"
            else dict(
                accept_rate=np.asarray(res.accept_rate)[:B].ravel(),
                divergences=int(np.asarray(res.divergences)[:B].sum()),
            )
        )
        metrics.write(
            sampler, n_max=b.n_max, batch=B, seconds=dt,
            samples_per_sec=B * chains * num_samples / dt, **diag_scalars,
        )
        if sampler == "vi":
            samples_all = np.asarray(res.samples)[:, None]  # (Bp, 1, S, H)
            diags_all = [
                dict(elbo=np.asarray(res.elbo)[i],
                     converged=np.asarray(res.converged)[i],
                     log_std=np.asarray(res.log_std)[i])
                for i in range(Bp)
            ]
            # the variational mean is the posterior mean, exactly
            means_all = np.asarray(res.mean)
        else:
            from medgp_tpu.infer.diagnostics import summarize_diagnostics

            samples_all = np.asarray(res.samples)        # (Bp, C, S, H)
            diags_all = []
            for i in range(Bp):
                d = dict(
                    accept_rate=np.asarray(res.accept_rate)[i],
                    step_size=np.asarray(res.step_size)[i],
                    divergences=np.asarray(res.divergences)[i],
                )
                # per-patient convergence: rank-normalized split-R-hat +
                # bulk ESS per hyper block (Vehtari et al. 2021) — the
                # instrumentation behind the "within Monte-Carlo error"
                # acceptance gate
                d.update(summarize_diagnostics(samples_all[i], spec))
                diags_all.append(d)
            # posterior mean in the IDENTIFIED parametrization: the raw
            # coordinate mean is degenerate under A's sign/rotation
            # symmetry and cross-chain component label switching
            # (diagnostics.invariant_posterior_mean)
            from medgp_tpu.infer.diagnostics import invariant_posterior_mean

            means_all = np.stack(
                [
                    invariant_posterior_mean(spec, samples_all[i])
                    for i in range(Bp)
                ]
            ).astype(samples_all.dtype)
            for i in range(min(B, len(b.pans))):
                metrics.write(
                    f"{sampler}_diag", pan=b.pans[i],
                    ess_bulk_min=diags_all[i]["ess_bulk_min"],
                    rhat_max=diags_all[i]["rhat_max"],
                )
        prefix = "vi" if sampler == "vi" else "hmc"
        for i, pan in enumerate(b.pans):
            samples = samples_all[i]
            post_mean = means_all[i]
            diag = diags_all[i]
            out[pan] = dict(samples=samples, post_mean=post_mean, **diag)
            if write:
                formats.write_double_bin(
                    os.path.join(
                        cfg.exp_train_dir, f"train_{prefix}_mean_{pan}.bin"
                    ),
                    post_mean,
                )
                np.savez(
                    os.path.join(
                        cfg.exp_train_dir, f"train_{prefix}_samples_{pan}.npz"
                    ),
                    samples=samples, **diag,
                )
    return out


# --------------------------------------------------------------------------
# testing
# --------------------------------------------------------------------------

def _test_prior(spec, mode_theta: np.ndarray):
    """Clamp A-elements that are exactly zero in the mode kernel
    (c_prior.cpp:118-140 `init_test_prior`; LMC-SM only)."""
    prior = empty_prior(spec.n_hyp)
    if isinstance(spec, LMCSMSpec):
        nl = spec.n_lik
        a = mode_theta[nl : nl + spec.Q * spec.D * spec.R]
        prior = clamp_a_elements(prior, spec, jnp.asarray(a == 0.0))
    return prior


def obs_output_order(t: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Flattening order for test outputs: unique timestamps ascending, stable
    original order within a timestamp (matches the reference's tt/jj loops,
    main_one_test.cpp:269-443)."""
    valid = np.nonzero(np.asarray(mask) > 0)[0]
    order = valid[np.argsort(np.asarray(t)[valid], kind="stable")]
    return order


def _test_chunk_size(
    B: int, n: int, budget_bytes: Optional[int] = None
) -> int:
    """Timestamp-map chunk so B * chunk * n^2 fp32 grams stay inside HBM
    (device-scaled; 2 GiB validated on a 16 GiB v5e — utils/hbm.py)."""
    if budget_bytes is None:
        from medgp_tpu.utils.hbm import test_budget_bytes

        budget_bytes = test_budget_bytes()
    c = budget_bytes // max(B * n * n * 4, 1)
    return int(max(1, min(16, c)))


def test_cohort(
    cfg: ExperimentConfig,
    records: Sequence[PatientRecord],
    folds: Optional[np.ndarray] = None,
    kernclust_alg: str = "gmm",
    write: bool = True,
    modes=("mean_wo_update", "mean_w_update"),
    max_batch: int = 32,
    use_mesh: Optional[bool] = None,
) -> Dict[str, dict]:
    """Online imputation for every patient with the fold's mode kernel.

    `folds[i]` selects kernel/fold{f}/ for records[i] (the patient's held-out
    fold, run_exp_generator.py:237-239); None uses fold -1 ("all").

    Patients are bucketed and padded like the train path, and each bucket
    runs as ONE jitted vmapped program per test mode (sharded over the mesh
    when more than one device is visible); unique timestamps are padded to
    the bucket length so compiled shapes are reused across buckets of equal
    n_max (the per-patient variant recompiled for every distinct n).

    The reference records a wall-time per prediction in test_*_etime files
    (main_one_test.cpp:446-472). Batched execution has no per-observation
    clock, so etime carries the honest analog: the bucket wall-time amortized
    per prediction (identical within a bucket+mode).
    """
    feature_list = cfg.feature_list
    out: Dict[str, dict] = {}

    metrics = stage_metrics(cfg)
    mesh = _mesh_or_none(use_mesh)
    ndev = 1 if mesh is None else int(mesh.devices.size)

    folds = (
        np.full(len(records), -1, int) if folds is None else np.asarray(folds)
    )
    # program caches live ACROSS folds: theta/prior are runtime arguments,
    # so the compiled program depends only on (mode, shape, mixture count)
    runners: Dict[tuple, object] = {}
    compiled: Dict[tuple, object] = {}
    for fold in np.unique(folds):
        mode_theta, newQ = formats.read_mode_kernel(
            cfg.exp_kernel_dir, int(fold), kernclust_alg
        )
        spec = cfg.test_spec(newQ)
        prior = _test_prior(spec, mode_theta)
        theta = jnp.asarray(mode_theta, jnp.float32)

        sel = [r for r, f in zip(records, folds) if f == fold]
        empty = [r for r in sel if r.n_obs == 0]
        for rec in empty:
            out[rec.pan] = {m: dict(flag=False) for m in modes}
            if write:
                for m in modes:
                    formats.write_test_result(
                        cfg.exp_test_dir, m, rec.pan,
                        np.zeros(0, int), np.zeros(0), np.zeros(0),
                        np.zeros(0, int), np.zeros(0), flag=False,
                    )

        batches = pack_patients(
            [r for r in sel if r.n_obs > 0],
            max_batch=_round_up_to(max_batch, ndev), batch_multiple=ndev,
        )

        def run_mode(update: bool, chunk: int, spec=None):
            # the fold's mode theta and test prior enter as RUNTIME
            # arguments (not closure constants): every fold with the same
            # mixture count reuses one compiled program per shape — the
            # per-fold caches this replaces recompiled 100 test programs
            # (1,554 s) for a 10-fold canonical run
            def one(th, pr, t, y, meta, mask, ut, uv):
                return online_impute(
                    spec, th,
                    PatientData(t=t, y=y, meta=meta, mask=mask),
                    ut, uv,
                    update=update,
                    prior=pr,
                    learn_rate=cfg.online_learn_rate,
                    momentum=cfg.online_momentum,
                    map_batch_size=chunk,
                )

            if mesh is not None:
                from medgp_tpu.parallel.mesh import sharded_test_step

                return sharded_test_step(one, mesh, n_rep_args=2)
            return jax.jit(
                jax.vmap(one, in_axes=(None, None) + (0,) * 6)
            )

        for b in batches:
            B, n_max = len(b), b.n_max
            Bp = _pad_batch_pow2(B, mesh, n_max=n_max)
            # unique timestamps padded to the bucket length (T <= n always)
            ut = np.zeros((Bp, n_max), np.float32)
            uv = np.zeros((Bp, n_max), bool)
            for i in range(B):
                u, v = unique_times(b.t[i], b.mask[i], pad_to=n_max)
                ut[i], uv[i] = u, v
            data_args = (
                jnp.asarray(_pad_rows(b.t, Bp)),
                jnp.asarray(_pad_rows(b.y, Bp)),
                jnp.asarray(_pad_rows(b.meta, Bp)),
                jnp.asarray(_pad_rows(b.mask, Bp)),
                jnp.asarray(ut), jnp.asarray(uv),
            )
            chunk = _test_chunk_size(Bp, n_max)
            res_by_mode = {}
            etime_by_mode = {}
            total_obs = int(np.sum(b.mask))
            for m in modes:
                rkey = (m, n_max, chunk, newQ)
                if rkey not in runners:
                    runners[rkey] = run_mode(
                        m == "mean_w_update", chunk, spec=spec
                    )
                t0 = time.time()
                res_by_mode[m] = jax.block_until_ready(
                    _run_compiled(
                        runners[rkey], compiled, rkey + (Bp,),
                        (theta, prior) + data_args,
                        metrics, "test", fold=int(fold), mode=m,
                        n_max=n_max, batch=Bp,
                    )
                )
                dt = time.time() - t0
                etime_by_mode[m] = dt / max(total_obs, 1)
                log.info(
                    "tested bucket fold=%s mode=%s n_max=%d B=%d on %d "
                    "device(s) in %.1fs",
                    fold, m, n_max, B,
                    1 if mesh is None else mesh.devices.size, dt,
                )
                metrics.write(
                    "test", fold=int(fold), mode=m, n_max=n_max, batch=B,
                    devices=1 if mesh is None else mesh.devices.size,
                    seconds=dt, predictions=total_obs,
                    sec_per_prediction=etime_by_mode[m],
                )

            for i, pan in enumerate(b.pans):
                rec = next(r for r in sel if r.pan == pan)
                n = rec.n_obs
                order = obs_output_order(b.t[i], b.mask[i])
                entry = {}
                for m, res in res_by_mode.items():
                    pred = np.asarray(res.pred, np.float64)[i][order]
                    err = np.asarray(res.error, np.float64)[i][order]
                    ci = np.asarray(res.ci)[i][order]
                    pvar = np.asarray(res.var, np.float64)[i][order]
                    feat = np.asarray(
                        [feature_list[j] for j in b.meta[i][order]], int
                    )
                    etime = np.full(len(order), etime_by_mode[m])
                    entry[m] = dict(
                        flag=True, pred=pred, error=err, ci=ci, feature=feat,
                        etime=etime, var=pvar,
                    )
                    if write:
                        formats.write_test_result(
                            cfg.exp_test_dir, m, pan,
                            feat, pred, err, ci, etime, flag=True, var=pvar,
                        )
                out[pan] = entry
    return out
