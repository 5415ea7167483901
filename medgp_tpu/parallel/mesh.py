"""Device-mesh sharding: patients over chips, collectives over ICI.

The reference's only distribution axis is patient-level data parallelism via
Slurm job fan-out with filesystem joins (SURVEY §2.4). Here:

  * a 1-D `Mesh` axis "patients" shards the padded patient batch over all
    chips (multi-host: `jax.distributed.initialize` makes the same code span
    hosts; the axis then rides ICI within a host/pod slice and DCN across);
  * the cross-patient aggregation points (population clustering inputs,
    cohort metrics) become in-program collectives (`all_gather` of per-patient
    hyper vectors inside :func:`population_noise_mode`) instead of file
    gathers;
  * restart/chain parallelism can occupy a second mesh axis when chips
    outnumber patients.

Everything uses `shard_map` with explicit PartitionSpecs — no reliance on
auto-spmd for the batch axis — so collective placement is deterministic.
These builders are the production path: :mod:`medgp_tpu.parallel.runner`
routes every bucket through them whenever more than one device is visible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from medgp_tpu.infer.map_train import TrainResult, train_one_patient
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
    mesh size. Each device trains its local patients (vmap inside shard_map)
    and the full per-patient `TrainResult` comes back SHARDED along the mesh
    axis — the host gather (np.asarray) or a downstream collective is the
    in-program replacement for the train->kernclust file boundary
    (train_hyp_*.bin + train_flag_*.txt, main_one_train.cpp:297-323).
    """

    def local_train(t, y, meta, mask):
        from medgp_tpu.infer.map_train import adaptive_screen_chunk

        # per-DEVICE local batch sets the screen memory footprint
        chunk = adaptive_screen_chunk(*t.shape)

        def one(t1, y1, m1, k1):
            return train_one_patient(
                spec,
                PatientData(t=t1, y=y1, meta=m1, mask=k1),
                inits,
                prior_mode=prior_mode,
                eta=eta,
                beta_lam=beta_lam,
                top_iters=top_iters,
                sub_opt_iter=sub_opt_iter,
                screen_chunk=chunk,
            )

        return jax.vmap(one)(t, y, meta, mask)

    # check_vma=False: the varying-manual-axes checker rejects while_loop
    # carries initialized from literals (every SCG/varEM loop does this);
    # treating all values as varying is the pre-checker semantics and is
    # correct here.
    shard = jax.shard_map(
        local_train,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def step(batch: PatientData) -> TrainResult:
        return shard(batch.t, batch.y, batch.meta, batch.mask)

    return step


def sharded_test_step(run_one, mesh: Mesh, axis: str = "patients",
                      n_rep_args: int = 0):
    """Shard a vmappable per-patient test function over the mesh.

    `run_one(*rep_args, t, y, meta, mask, ut, uv)` is the single-patient
    online imputation (e.g. a partial of
    :func:`medgp_tpu.infer.online.online_impute`); the result pytree comes
    back sharded along the patient axis. This is the multi-chip form of the
    reference's one-test-job-per-patient fan-out (main_one_test.cpp:45-117).

    `n_rep_args` leading arguments (e.g. the fold's mode theta + test
    prior) are REPLICATED across the mesh and not vmapped — passing them as
    runtime arguments instead of closure constants lets every CV fold reuse
    one compiled program per (mode, n_max, batch) shape.
    """

    def local(*args):
        rep, arr = args[:n_rep_args], args[n_rep_args:]
        return jax.vmap(
            run_one, in_axes=(None,) * n_rep_args + (0,) * 6
        )(*rep, *arr)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) * n_rep_args + (P(axis),) * 6,
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(shard)


def sharded_sampler_step(run_one, mesh: Mesh, axis: str = "patients"):
    """Shard a vmappable per-patient posterior sampler over the mesh.

    `run_one(theta0, t, y, meta, mask, key)` runs all chains for one patient
    (chains vmapped inside); patients shard over chips. Sampler results come
    back sharded along the patient axis.
    """

    def local(theta0, t, y, meta, mask, keys):
        return jax.vmap(run_one)(theta0, t, y, meta, mask, keys)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(shard)


# --------------------------------------------------------------------------
# cross-patient population statistics over ICI
# --------------------------------------------------------------------------

def _masked_percentile(xs: jnp.ndarray, flags: jnp.ndarray, q: float):
    """Percentile (linear interpolation, numpy default) of the flagged subset
    of `xs`, with fixed shapes: masked-out entries sort to +inf and the
    interpolation rank is computed from the flagged count."""
    big = jnp.asarray(jnp.inf, xs.dtype)
    s = jnp.sort(jnp.where(flags > 0, xs, big))
    n_ok = jnp.sum(flags > 0)
    rank = (q / 100.0) * (n_ok.astype(xs.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, xs.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, xs.shape[0] - 1)
    w = rank - lo.astype(xs.dtype)
    x_lo, x_hi = s[lo], s[hi]
    x_hi = jnp.where(hi < n_ok, x_hi, x_lo)  # rank may land on the last entry
    return x_lo * (1.0 - w) + x_hi * w


def masked_weighted_kde_mode(xs: jnp.ndarray, flags: jnp.ndarray):
    """Density-weighted KDE mode of the flagged subset of `xs` — the exact
    jittable counterpart of :func:`medgp_tpu.cluster.kde.kde_mode`
    (weighted=True, Silverman bandwidth; reference:
    medgpc/clustering/mode_estimate.py:438-450)."""
    dtype = xs.dtype
    f = (flags > 0).astype(dtype)
    n_ok = jnp.sum(f)
    mean = jnp.sum(xs * f) / jnp.maximum(n_ok, 1.0)
    var = jnp.sum(f * (xs - mean) ** 2) / jnp.maximum(n_ok - 1.0, 1.0)
    std = jnp.sqrt(var)
    q75 = _masked_percentile(xs, flags, 75.0)
    q25 = _masked_percentile(xs, flags, 25.0)
    iqr = (q75 - q25) / 1.349
    sigma = jnp.where(iqr > 0, jnp.minimum(std, iqr), std)
    x_first = xs[jnp.argmax(f)]  # first flagged element (degenerate guard)
    sigma = jnp.where(
        sigma > 0, sigma, jnp.maximum(jnp.abs(x_first), 1.0) * 1e-6
    )
    bw = 0.9 * sigma * jnp.maximum(n_ok, 1.0) ** (-0.2)

    z = (xs[:, None] - xs[None, :]) / bw
    dens = jnp.sum(
        jnp.exp(-0.5 * z * z) * f[None, :], axis=1
    ) / (jnp.maximum(n_ok, 1.0) * bw * jnp.sqrt(2.0 * jnp.asarray(np.pi, dtype)))
    wsum = jnp.sum(f * dens)
    mode = jnp.where(
        wsum > 0, jnp.sum(f * xs * dens) / wsum,
        jnp.sum(f * xs) / jnp.maximum(n_ok, 1.0),
    )
    mode = jnp.where(n_ok == 1, x_first, mode)
    # zero flagged patients: fail loudly with NaN instead of silently
    # returning 0 (which downstream log() would turn into -inf noise modes)
    return jnp.where(n_ok == 0, jnp.asarray(jnp.nan, dtype), mode)


def population_noise_mode(
    spec: LMCSMSpec, mesh: Mesh, axis: str = "patients"
):
    """In-program cross-patient noise-mode estimation over ICI.

    Computes the noise block of the population mode kernel — per output d,
    the density-weighted KDE mode over trained patients' exp(theta_d)
    (mode_estimate.py:267-279) — directly from the SHARDED training results:
    each device contributes its local patients' noise hypers and flags, an
    `all_gather` assembles the population on every device, and the KDE mode
    is evaluated in-program. This replaces the reference's file gather
    (binaryIO.py:20-35 reads every train_hyp_*.bin from disk) for the fused
    pipeline; :func:`medgp_tpu.cluster.mode.mode_kernel_lmcsm` computes the
    same numbers host-side for the staged/reference-compatible path.

    Returns a jitted fn (theta_shard (B,H) sharded, flags (B,) sharded) ->
    (D,) log noise modes, replicated.
    """
    D = spec.n_lik

    def local(thetas, flags):
        noise = jnp.exp(thetas[:, :D])  # (b_local, D)
        noise_all = jax.lax.all_gather(noise, axis, tiled=True)    # (B, D)
        flags_all = jax.lax.all_gather(
            flags.astype(jnp.float32), axis, tiled=True
        )
        modes = jax.vmap(masked_weighted_kde_mode, in_axes=(1, None))(
            noise_all, flags_all
        )
        return jnp.log(modes)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(shard)


def population_noise_modes_by_fold(
    spec: LMCSMSpec, mesh: Mesh, n_folds: int, axis: str = "patients"
):
    """Per-CV-fold noise modes over ICI, one collective for ALL folds.

    Fold f's mode kernel uses training-fold patients only (cv_assign != f,
    kernclust.py:22-24); fold -1 uses everyone. One `all_gather` assembles
    the population (noise hypers, flags, cv assignment) on every device and
    the masked KDE mode is evaluated in-program for every fold — the ICI
    replacement for the reference's per-fold file gather, now covering EVERY
    fold (round 2 only computed fold -1 in-program).

    Returns a jitted fn (theta (B,H) sharded, flags (B,) sharded, cv (B,)
    sharded) -> (n_folds + 1, D) log noise modes, replicated; row f is fold
    f, the last row is fold -1. Numerics note: the in-program KDE runs in
    fp32 vs the staged host path's float64 (cluster/kde.py) — agreement is
    rtol ~2e-3 (pinned in tests/test_mesh.py), documented in PARITY.md.
    """
    D = spec.n_lik

    def local(thetas, flags, cv):
        noise = jnp.exp(thetas[:, :D])
        noise_all = jax.lax.all_gather(noise, axis, tiled=True)     # (B, D)
        flags_all = jax.lax.all_gather(
            flags.astype(jnp.float32), axis, tiled=True
        )
        cv_all = jax.lax.all_gather(
            cv.astype(jnp.int32), axis, tiled=True
        )

        fold_ids = jnp.arange(n_folds + 1, dtype=jnp.int32)

        def one_fold(f):
            keep = jnp.where(f < n_folds, (cv_all != f), True)
            fl = flags_all * keep.astype(jnp.float32)
            modes = jax.vmap(masked_weighted_kde_mode, in_axes=(1, None))(
                noise_all, fl
            )
            return jnp.log(modes)

        return jax.vmap(one_fold)(fold_ids)                 # (F+1, D)

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(shard)


def large_patient_nlml_diff(
    spec: LMCSMSpec,
    mesh: Mesh,
    axis: str = "patients",
    max_retries: int = 10,
):
    """DIFFERENTIABLE row-sharded NLML for one outlier-large patient.

    Same distributed blocked Cholesky as :func:`large_patient_nlml`, plus a
    custom VJP so the patient is *trainable* (the reference's top Slurm tier
    trains n < 100,000 patients, scripts/slurm_della.json:51-61; value-only
    evaluation cannot). Neither the forward nor the backward program
    materializes an (n, n) buffer on any device (asserted against compiled
    HLO in tests/test_large_train.py):

      forward:  blocked factorization (see large_patient_nlml) storing the
                clean local L row-block (b, n), the replicated forward-
                substitution result z, and a replicated alpha = K^{-1}y via a
                blocked backward substitution (O(n^2) VPU work).
      backward: the reference's Q-matrix identity dNLML/dK =
                1/2 (K^{-1} - alpha alpha^T) (c_inference_exact.cpp:168-172),
                computed ROW-BLOCKWISE: each device solves K Z = E_l for the
                identity columns of its own rows with two distributed
                triangular solves against the stored L (per step, one
                psum-broadcast L row-block / one all_gather L column-block;
                per-device work O(n^3/ndev), memory O(n b)). The local theta
                cotangent is one reverse-mode pass through the local gram
                rows, psum-reduced over the mesh.

    Returns a jitted `call(theta, t, y, meta, mask) -> (nlml, ok)`,
    differentiable in theta, t and y (mask's cotangent is pinned to zero by
    declaration — it is a {0,1} validity indicator, not a real input; meta
    is integer-typed and gets float0); layout as in large_patient_nlml.
    """
    from jax.scipy.linalg import solve_triangular

    from medgp_tpu.models.gp import noise_variance
    from medgp_tpu.models.params import REF_PI
    from medgp_tpu.ops.gram import cross_gram_lmcsm

    ndev = int(mesh.devices.size)

    def gram_rows(theta, mult, t_l, meta_l, mask_l, t_all, meta_all,
                  mask_all, g_l):
        """Local gram row-block incl. the noise + identity-padding diagonal
        at jitter multiplier `mult`; differentiable wrt theta."""
        dtype = t_l.dtype
        b = t_l.shape[0]
        p = spec.unpack(theta)
        nv_l = noise_variance(spec, theta, meta_l) * mask_l
        K = cross_gram_lmcsm(
            spec, t_l, meta_l, t_all, meta_all,
            p["A"], p["mu"], p["v"], p["kappa"],
        ).astype(dtype)
        K = K * (mask_l[:, None] * mask_all[None, :])
        diag_add = mult.astype(dtype) * nv_l + (1.0 - mask_l)
        return K.at[jnp.arange(b), g_l].add(diag_add)

    def factorize(K0, y_l, d, gidx):
        """Blocked right-looking Cholesky + forward substitution. Returns
        (L_l clean local rows (b, n), z replicated (n,), zsq, logdet, ok).
        Every column block is overwritten exactly once with its final L
        values (zeros above the diagonal), so the scanned K_l IS the clean
        row-block of L at the end."""
        b = y_l.shape[0]
        n = b * ndev
        dtype = y_l.dtype
        # mirror _nlml_core's mixed-precision regime (ops/nlml.py): the
        # logdet / ||z||^2 reductions accumulate in double under x64 —
        # at n up to 100k summed log terms the fp32 accumulation error is
        # largest exactly on this path
        acc = jnp.float64 if jax.config.jax_enable_x64 else dtype

        def step(carry, k):
            K_l, yres_l, z, zsq, logdet = carry
            C_l = lax.dynamic_slice(K_l, (0, k * b), (b, b))
            C = lax.all_gather(C_l, axis, tiled=True)          # (n, b)
            Akk = lax.dynamic_slice(C, (k * b, 0), (b, b))
            Lkk = jnp.linalg.cholesky(Akk)
            S = solve_triangular(Lkk, C.T, lower=True).T       # (n, b)
            below = (gidx >= (k + 1) * b).astype(dtype)
            Lcol = S * below[:, None]
            Lcol = lax.dynamic_update_slice(Lcol, Lkk, (k * b, 0))
            Lcol_l = lax.dynamic_slice(Lcol, (d * b, 0), (b, b))
            K_l = K_l - Lcol_l @ (Lcol * below[:, None]).T
            K_l = lax.dynamic_update_slice(K_l, Lcol_l, (0, k * b))
            yk = lax.psum(
                jnp.where(d == k, yres_l, jnp.zeros_like(yres_l)), axis
            )
            zk = solve_triangular(Lkk, yk, lower=True)
            yres_l = yres_l - Lcol_l @ zk
            z = lax.dynamic_update_slice(z, zk, (k * b,))
            zsq = zsq + jnp.sum(zk.astype(acc) * zk.astype(acc))
            logdet = logdet + jnp.sum(
                jnp.log(jnp.diagonal(Lkk)).astype(acc)
            )
            return (K_l, yres_l, z, zsq, logdet), None

        zero = jnp.asarray(0.0, acc)
        (L_l, _, z, zsq, logdet), _ = lax.scan(
            step, (K0, y_l, jnp.zeros(n, dtype), zero, zero),
            jnp.arange(ndev),
        )
        zsq = zsq.astype(dtype)
        logdet = logdet.astype(dtype)
        ok = jnp.isfinite(zsq) & jnp.isfinite(logdet)
        return L_l, z, zsq, logdet, ok

    def local_fwd(theta, t_l, y_l, meta_l, mask_l):
        dtype = t_l.dtype
        b = t_l.shape[0]
        n = b * ndev
        mask_l = mask_l.astype(dtype)
        d = lax.axis_index(axis)
        g_l = d * b + jnp.arange(b)
        gidx = jnp.arange(n)
        t_all = lax.all_gather(t_l, axis, tiled=True)
        meta_all = lax.all_gather(meta_l, axis, tiled=True)
        mask_all = lax.all_gather(mask_l, axis, tiled=True)
        y_l = y_l * mask_l

        def fact_at(mult):
            K0 = gram_rows(
                theta, mult, t_l, meta_l, mask_l, t_all, meta_all,
                mask_all, g_l,
            )
            return factorize(K0, y_l, d, gidx)

        mult0 = jnp.asarray(1, jnp.int32)
        st0 = fact_at(mult0)

        def cond(st):
            mult = st[0]
            ok = st[5]
            return jnp.logical_and(~ok, mult <= max_retries)

        def body(st):
            mult = st[0] + 1
            return (mult,) + fact_at(mult)

        mult, L_l, z, zsq, logdet, ok = lax.while_loop(
            cond, body, (mult0,) + st0
        )

        # blocked backward substitution L^T alpha = z, replicated (O(n^2))
        def alpha_step(alpha, k):
            Lcol = lax.all_gather(
                lax.dynamic_slice(L_l, (0, k * b), (b, b)), axis, tiled=True
            )                                                   # (n, b)
            Lkk = lax.dynamic_slice(Lcol, (k * b, 0), (b, b))
            zk = lax.dynamic_slice(z, (k * b,), (b,))
            # alpha rows <= this block are still zero, so the full matvec
            # sums exactly sum_{j>k} L_jk^T alpha_j
            w = Lcol.T @ alpha
            ak = solve_triangular(Lkk.T, zk - w, lower=False)
            return lax.dynamic_update_slice(alpha, ak, (k * b,)), None

        alpha, _ = lax.scan(
            alpha_step, jnp.zeros(n, dtype), jnp.arange(ndev - 1, -1, -1)
        )

        n_eff = jnp.sum(mask_all)
        nlml = (
            0.5 * zsq + logdet
            + 0.5 * n_eff * jnp.log(jnp.asarray(2.0 * REF_PI, dtype))
        )
        nlml = jnp.where(ok, nlml, jnp.asarray(jnp.inf, dtype))
        return nlml, ok, mult, L_l, alpha

    def local_bwd(gbar, theta, mult, L_l, alpha, t_l, y_l, meta_l, mask_l,
                  ok):
        dtype = t_l.dtype
        b = t_l.shape[0]
        n = b * ndev
        mask_l = mask_l.astype(dtype)
        d = lax.axis_index(axis)
        g_l = d * b + jnp.arange(b)
        gidx = jnp.arange(n)
        t_all = lax.all_gather(t_l, axis, tiled=True)
        meta_all = lax.all_gather(meta_l, axis, tiled=True)
        mask_all = lax.all_gather(mask_l, axis, tiled=True)
        eye_b = jnp.eye(b, dtype=dtype)

        # K Z = E_l for my rows' identity columns: forward solve L W = E_l
        # (each device carries its own (n, b) RHS; only L moves over ICI)
        def fwd_step(W, k):
            Lrow = lax.psum(
                jnp.where(d == k, L_l, jnp.zeros_like(L_l)), axis
            )                                                   # (b, n)
            Lkk = lax.dynamic_slice(Lrow, (0, k * b), (b, b))
            Ek = jnp.where(d == k, eye_b, jnp.zeros_like(eye_b))
            rhs = Ek - (
                Lrow * (gidx < k * b).astype(dtype)[None, :]
            ) @ W
            Wk = solve_triangular(Lkk, rhs, lower=True)
            return lax.dynamic_update_slice(W, Wk, (k * b, 0)), None

        W, _ = lax.scan(fwd_step, jnp.zeros((n, b), dtype), jnp.arange(ndev))

        # then backward solve L^T Z = W
        def bwd_step(Z, k):
            Lcol = lax.all_gather(
                lax.dynamic_slice(L_l, (0, k * b), (b, b)), axis, tiled=True
            )                                                   # (n, b)
            Lkk = lax.dynamic_slice(Lcol, (k * b, 0), (b, b))
            Wk = lax.dynamic_slice(W, (k * b, 0), (b, b))
            rhs = Wk - (
                Lcol * (gidx >= (k + 1) * b).astype(dtype)[:, None]
            ).T @ Z
            Zk = solve_triangular(Lkk.T, rhs, lower=False)
            return lax.dynamic_update_slice(Z, Zk, (k * b, 0)), None

        Z, _ = lax.scan(
            bwd_step, jnp.zeros((n, b), dtype), jnp.arange(ndev - 1, -1, -1)
        )

        alpha_l = lax.dynamic_slice(alpha, (d * b,), (b,))
        # rows of the Q matrix: (K^{-1})_l = Z^T by symmetry
        Qbar = (0.5 * gbar) * (Z.T - jnp.outer(alpha_l, alpha))  # (b, n)

        def k_of(th, tl_, tall_):
            return gram_rows(
                th, mult, tl_, meta_l, mask_l, tall_, meta_all,
                mask_all, g_l,
            )

        _, vjp = jax.vjp(k_of, theta, t_l, t_all)
        th_bar, tl_bar, tall_bar = vjp(Qbar)
        th_bar = lax.psum(th_bar, axis)
        # exact timestamp cotangent: the row-local part plus every device's
        # contribution through the gathered column copy of t
        t_bar_l = tl_bar + lax.dynamic_slice(
            lax.psum(tall_bar, axis), (d * b,), (b,)
        )
        y_bar_l = gbar * alpha_l * mask_l
        th_bar = jnp.where(ok, th_bar, jnp.zeros_like(th_bar))
        t_bar_l = jnp.where(ok, t_bar_l, jnp.zeros_like(t_bar_l))
        y_bar_l = jnp.where(ok, y_bar_l, jnp.zeros_like(y_bar_l))
        return th_bar, y_bar_l, t_bar_l

    shard_fwd = jax.shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(axis), P()),
        check_vma=False,
    )
    shard_bwd = jax.shard_map(
        local_bwd,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(axis), P(), P(axis), P(axis), P(axis),
            P(axis), P(),
        ),
        out_specs=(P(), P(axis), P(axis)),
        check_vma=False,
    )

    @jax.custom_vjp
    def nlml(theta, t, y, meta, mask):
        v, ok, _, _, _ = shard_fwd(theta, t, y, meta, mask)
        return v, ok

    def nlml_fwd(theta, t, y, meta, mask):
        v, ok, mult, L, alpha = shard_fwd(theta, t, y, meta, mask)
        return (v, ok), (theta, mult, L, alpha, t, y, meta, mask, ok)

    def nlml_bwd(res, cts):
        theta, mult, L, alpha, t, y, meta, mask, ok = res
        gbar = cts[0]
        th_bar, y_bar, t_bar = shard_bwd(
            gbar, theta, mult, L, alpha, t, y, meta, mask, ok
        )
        meta_bar = np.zeros(meta.shape, dtype=jax.dtypes.float0)
        # mask is a {0,1} validity indicator: non-differentiable BY
        # DECLARATION (its cotangent is pinned to zero; meta is integer and
        # gets float0). theta, t and y carry exact cotangents.
        return th_bar, t_bar, y_bar, meta_bar, jnp.zeros_like(mask)

    nlml.defvjp(nlml_fwd, nlml_bwd)
    return jax.jit(nlml)


def large_patient_objective(
    spec: LMCSMSpec,
    mesh: Mesh,
    t: jnp.ndarray,
    y: jnp.ndarray,
    meta: jnp.ndarray,
    mask: jnp.ndarray,
    prior=None,
    axis: str = "patients",
    max_retries: int = 10,
    base=None,
):
    """`f(theta) -> (value, grad, ok)` over one row-sharded patient — the
    distributed counterpart of :func:`medgp_tpu.models.gp.objective_and_grad`,
    directly consumable by `scg_minimize`/`varem_train`. MAP value is
    NLML - log prior; clamped hypers' gradients are zeroed via the prior's
    grad mask (c_inference_prior.cpp:59-151 semantics). `base` optionally
    reuses an already-built :func:`large_patient_nlml_diff` callable (the
    varEM objective factory passes it so each M-step round shares one)."""
    from medgp_tpu.models.priors import log_prior

    if base is None:
        base = large_patient_nlml_diff(spec, mesh, axis, max_retries)
    grad_mask = None if prior is None else prior.grad_mask()

    def f(theta):
        def loss(th):
            v, ok = base(th, t, y, meta, mask)
            if prior is not None:
                v = v - log_prior(prior, th)
            return v, ok

        (v, ok), g = jax.value_and_grad(loss, has_aux=True)(theta)
        if grad_mask is not None:
            g = g * grad_mask.astype(g.dtype)
        ok = ok & (jnp.sum(mask) > 2) & jnp.all(jnp.isfinite(g))
        g = jnp.where(ok, g, jnp.zeros_like(g))
        v = jnp.where(ok, v, jnp.asarray(jnp.inf, v.dtype))
        return v, g, ok

    return f


def large_patient_nlml(
    spec: LMCSMSpec,
    mesh: Mesh,
    axis: str = "patients",
    max_retries: int = 10,
):
    """Sharded NLML for one outlier-large patient: a shard_map-tiled gram +
    distributed blocked Cholesky, with the gram row-sharded END TO END.

    This is the 'sequence-length scaling' analog of the reference's
    100k-observation top Slurm tier (slurm_della.json:51-61): the n x n gram
    never exists on any single device. Per-device memory is
    O(n^2/ndev + n*b) by construction — the body only ever materializes the
    local row block (b, n) and one replicated block column (n, b); no (n, n)
    buffer appears anywhere in the program (asserted against the compiled
    HLO in tests/test_mesh.py). An earlier version jitted
    `jnp.linalg.cholesky` over GSPMD-sharded inputs, which let XLA gather
    the full gram onto every device — correct but not memory-scaling.

    Algorithm (right-looking blocked Cholesky, 1 block row per device,
    forward substitution fused into the same pass):
      for k in 0..ndev-1:
        all_gather block column k (n, b) over ICI;
        factor the diagonal block L_kk (replicated, b^3);
        panel solve S = C L_kk^{-T} (replicated, n*b^2 on the MXU);
        local trailing update K_l -= S_l @ S[trailing]^T (b*b*n MXU matmul);
        z_k = L_kk^{-1} y_k (psum-broadcast residual), accumulate ||z||^2
        and log det from diag(L_kk).
      NLML = 0.5 ||z||^2 + sum log L_ii + n_eff/2 log(2 pi)
    which is exactly c_inference_exact.cpp:87-152's quantities. The jitter
    retry escalates mult = 1..1+max_retries like jittered_cholesky
    (c_inference_exact.cpp:99-111). Padded observations enter as identity
    rows with y=0, contributing nothing (masking identical to
    ops/nlml.py:masked_nlml).

    Returns call(theta, t, y, meta, mask) -> (nlml, ok); inputs are laid out
    over the mesh axis (n must be a multiple of the mesh size — pad with
    mask=0).
    """
    from jax.scipy.linalg import solve_triangular

    from medgp_tpu.models.gp import noise_variance
    from medgp_tpu.models.params import REF_PI
    from medgp_tpu.ops.gram import cross_gram_lmcsm

    ndev = int(mesh.devices.size)

    def local(theta, t_l, y_l, meta_l, mask_l):
        b = t_l.shape[0]
        n = b * ndev
        dtype = t_l.dtype
        mask_l = mask_l.astype(dtype)
        d = lax.axis_index(axis)
        g_l = d * b + jnp.arange(b)          # global row ids of my rows
        gidx = jnp.arange(n)

        p = spec.unpack(theta)
        nv_l = noise_variance(spec, theta, meta_l) * mask_l

        t_all = lax.all_gather(t_l, axis, tiled=True)
        meta_all = lax.all_gather(meta_l, axis, tiled=True)
        mask_all = lax.all_gather(mask_l, axis, tiled=True)

        # local gram rows, masked: padded rows/cols zero, identity diagonal
        K_rows = cross_gram_lmcsm(
            spec, t_l, meta_l, t_all, meta_all,
            p["A"], p["mu"], p["v"], p["kappa"],
        ).astype(dtype)
        K_rows = K_rows * (mask_l[:, None] * mask_all[None, :])
        y_l = y_l * mask_l

        def factorize(mult):
            """One full blocked factorization + forward substitution at
            jitter multiplier `mult`; returns (zsq, logdet, ok)."""
            diag_add = mult.astype(dtype) * nv_l + (1.0 - mask_l)
            K0 = K_rows.at[jnp.arange(b), g_l].add(diag_add)
            # double accumulation of the scalar reductions under x64,
            # mirroring _nlml_core (ops/nlml.py) on the dense path
            acc = jnp.float64 if jax.config.jax_enable_x64 else dtype

            def step(carry, k):
                K_l, yres_l, zsq, logdet = carry
                C_l = lax.dynamic_slice(K_l, (0, k * b), (b, b))
                C = lax.all_gather(C_l, axis, tiled=True)      # (n, b)
                Akk = lax.dynamic_slice(C, (k * b, 0), (b, b))
                Lkk = jnp.linalg.cholesky(Akk)
                # full block column of L: zeros above, Lkk in block k,
                # panel solve below
                S = solve_triangular(Lkk, C.T, lower=True).T   # (n, b)
                below = (gidx >= (k + 1) * b).astype(dtype)
                Lcol = S * below[:, None]
                Lcol = lax.dynamic_update_slice(Lcol, Lkk, (k * b, 0))
                Lcol_l = lax.dynamic_slice(
                    Lcol, (d * b, 0), (b, b)
                )  # my rows of the block column
                # trailing update (columns >= (k+1)*b only)
                K_l = K_l - Lcol_l @ (Lcol * below[:, None]).T
                K_l = lax.dynamic_update_slice(K_l, Lcol_l, (0, k * b))
                # forward substitution L z = y, block k
                yk = lax.psum(
                    jnp.where(d == k, yres_l, jnp.zeros_like(yres_l)), axis
                )
                zk = solve_triangular(Lkk, yk, lower=True)
                yres_l = yres_l - Lcol_l @ zk
                zsq = zsq + jnp.sum(zk.astype(acc) * zk.astype(acc))
                logdet = logdet + jnp.sum(
                    jnp.log(jnp.diagonal(Lkk)).astype(acc)
                )
                return (K_l, yres_l, zsq, logdet), None

            (Kf, _, zsq, logdet), _ = lax.scan(
                step,
                (K0, y_l, jnp.asarray(0.0, acc), jnp.asarray(0.0, acc)),
                jnp.arange(ndev),
            )
            zsq = zsq.astype(dtype)
            logdet = logdet.astype(dtype)
            ok = jnp.isfinite(zsq) & jnp.isfinite(logdet)
            return zsq, logdet, ok

        def cond(st):
            mult, _, _, ok = st
            return jnp.logical_and(~ok, mult <= max_retries)

        def body(st):
            mult = st[0] + 1
            zsq, logdet, ok = factorize(mult)
            return mult, zsq, logdet, ok

        mult0 = jnp.asarray(1, jnp.int32)
        zsq0, logdet0, ok0 = factorize(mult0)
        _, zsq, logdet, ok = lax.while_loop(
            cond, body, (mult0, zsq0, logdet0, ok0)
        )

        n_eff = jnp.sum(mask_all)
        nlml = (
            0.5 * zsq + logdet
            + 0.5 * n_eff * jnp.log(jnp.asarray(2.0 * REF_PI, dtype))
        )
        nlml = jnp.where(ok, nlml, jnp.asarray(jnp.inf, dtype))
        return nlml, ok

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)


def large_patient_screen(
    spec: LMCSMSpec,
    mesh: Mesh,
    axis: str = "patients",
    max_retries: int = 10,
):
    """ONE-program restart screen over the distributed NLML.

    Evaluates every init in `thetas` (S, H) through the row-sharded blocked
    factorization inside a single jitted program (`lax.map`, sequential so
    only one factorization's workspace is ever live) instead of S host-
    synced dispatches — the round-3 screen paid an S x host-roundtrip +
    dispatch latency tax (large_train.py history). Returns
    `screen(thetas, t, y, meta, mask) -> (values (S,), oks (S,))`; failed
    factorizations report +inf.
    """
    base = large_patient_nlml(spec, mesh, axis, max_retries)

    @jax.jit
    def screen(thetas, t, y, meta, mask):
        def one(th):
            v, ok = base(th, t, y, meta, mask)
            v = jnp.where(ok & jnp.isfinite(v), v, jnp.inf)
            return v, ok

        return jax.lax.map(one, thetas)

    return screen
