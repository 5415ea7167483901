"""Pallas TPU kernels for fused LMC-SM gram construction (fwd + bwd).

The gram build is the framework's hottest non-factorization op: for every
pair (i, j) it needs sum_q B_q[meta_i, meta_j] * cos(2 pi mu_q d_ij) *
exp(-2 (pi v_q)^2 d_ij^2). The XLA path
(:func:`medgp_tpu.ops.gram.gram_lmcsm`) materializes (n, n) rsq and Q
gathered coefficient maps per accumulation step; these kernels fuse
everything into one pass with no HBM intermediates.

TPU-native structure (round-4 roofline findings, tools/profile*.py):

1. One-hot MXU gather: B_q[meta_i, meta_j] = onehot(meta_i) @ B_q @
   onehot(meta_j)^T — coregional gathers become systolic-array matmuls.
   The {0,1} side is bf16-exact, so an f32x2 split of the VALUE operand
   gives ~2^-16 accuracy at 2 bf16 passes (Mosaic's DEFAULT f32 dot is
   1-pass bf16, which would round B by ~0.4%; HIGHEST costs 6 passes).

2. Rank-2 trig separation: cos is even, so
       cos(2 pi mu (t_i - t_j)) = c_i c_j + s_i s_j,
   with c = cos(2 pi mu t), s = sin(2 pi mu t) — O(n) sincos plus VPU
   multiplies; only exp(-2 (pi v)^2 rsq) stays O(n^2) per component. The
   same identity gives the backward d/dmu term: sin(2 pi mu d) =
   s_i c_j - c_i s_j. (Transcendentals themselves are nearly free on the
   VPU — measured ~600G exp/s — the identity mainly removes the sqrt and
   one map.) fp32 note: the large-phase arguments carry the same
   ~|phase|*2^-24 rounding the reference's own fp32 cos of 2 pi mu r has
   (c_kernel_LMC_SM.cpp:374-378); timestamps are shifted by t_min first.

3. BATCH TILING: one grid step processes BT patients (like the
   factorization kernels in pallas_chol.py) — a per-sample kernel lifted
   by vmap runs one grid step per patient, and per-step fixed overhead
   (window DMA + pipeline) dominated the arithmetic by ~3x. The
   `jax.custom_batching.custom_vmap` wrappers collapse any vmap stack
   into the kernel batch axis.

The backward kernel computes (dB_q, dmu_q, dv_q) from the output cotangent
in ONE pass (the reference instead builds ~Q(DR+2+D) per-hyper n^2 maps,
c_kernel_LMC_SM.cpp:198-327); the chain into (A, kappa) through
B = A A^T + diag(kappa) is left to XLA autodiff (O(Q D^2 R) — negligible).

On non-TPU backends the kernels run in interpreter mode (tests); the public
entry point falls back to the XLA builder for unsupported shapes.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl

try:  # pallas TPU backend params are only importable with a TPU plugin
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from medgp_tpu.models.params import REF_PI, LMCSMSpec

_MAX_N = 1024   # single-tile (BT, n, n) kernels; larger n falls back to XLA


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


_fallback_logged: set = set()


def pallas_supported(n: int) -> bool:
    ok = n > 0 and n % 128 == 0 and n <= _MAX_N
    if not ok and n > _MAX_N and n % 128 == 0 and n not in _fallback_logged:
        # announced (once per shape) so the mid-size XLA-builder fallback —
        # which materializes (n,n) rsq plus Q gathered coefficient maps —
        # is visible as a perf regression rather than silent.
        _fallback_logged.add(n)
        logging.getLogger(__name__).warning(
            "gram n=%d exceeds the single-tile Pallas cap (%d); falling "
            "back to the XLA builder for this bucket", n, _MAX_N,
        )
    return ok


def _gbt(n: int, Q: int) -> int:
    """Gram batch tile: keep ~Q+4 live (BT, n, n) f32 temporaries plus the
    double-buffered output window inside the 64 MB scoped-VMEM cap."""
    env = os.environ.get("MEDGP_GRAM_BT")
    if env:
        return max(1, int(env))
    return max(1, min(8, (4 * 1024 * 1024) // (n * n * 4)))


def _vmem_params(interpret):
    if _HAS_PLTPU and not interpret:
        limit = int(
            os.environ.get("MEDGP_GRAM_VMEM", str(64 * 1024 * 1024))
        )
        return dict(
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit)
        )
    return {}


def _sincos(phase):
    return jnp.sin(phase), jnp.cos(phase)


_DN_B = (((2,), (1,)), ((0,), (0,)))   # (BT,m,k) @ (BT,k,p)


def _bdot_oh(a, b):
    """Batched values @ one-hot: f32x2 split on the value (first) operand."""
    f32 = jnp.float32
    d = jax.lax.Precision.DEFAULT
    a_hi = a.astype(jnp.bfloat16).astype(f32)
    a_lo = a - a_hi
    kw = dict(preferred_element_type=f32, precision=d)
    return (
        jax.lax.dot_general(a_hi, b, _DN_B, **kw)
        + jax.lax.dot_general(a_lo, b, _DN_B, **kw)
    )


def _bdot_ohb(a, b):
    """Batched one-hot @ values: f32x2 split on the value (second) operand."""
    f32 = jnp.float32
    d = jax.lax.Precision.DEFAULT
    b_hi = b.astype(jnp.bfloat16).astype(f32)
    b_lo = b - b_hi
    kw = dict(preferred_element_type=f32, precision=d)
    return (
        jax.lax.dot_general(a, b_hi, _DN_B, **kw)
        + jax.lax.dot_general(a, b_lo, _DN_B, **kw)
    )


def _onehots(m_ref, n, D, BT):
    """(BT, n, D) one-hot and its (BT, D, n) native-layout transpose."""
    m_row = m_ref[:, 0:1, :]                              # (BT, 1, n)
    ids_r = jax.lax.broadcasted_iota(jnp.int32, (BT, n, D), 2)
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (BT, D, n), 1)
    m_col = jnp.transpose(m_row, (0, 2, 1))               # (BT, n, 1)
    oh = (m_col == ids_r).astype(jnp.float32)
    ohT = (m_row == ids_c).astype(jnp.float32)
    return oh, ohT


def _gram_fwd_kernel(Q, D, masked, t_ref, m_ref, B_ref, muv_ref, *rest):
    if masked:
        k_ref, out_ref = rest
    else:
        (out_ref,) = rest
    BT = t_ref.shape[0]
    n = t_ref.shape[2]
    t_row = t_ref[:, 0:1, :]                              # (BT, 1, n)
    t_col = jnp.transpose(t_row, (0, 2, 1))               # (BT, n, 1)
    diff = t_col - t_row                                  # (BT, n, n)
    rsq = diff * diff
    oh, ohT = _onehots(m_ref, n, D, BT)

    acc = jnp.zeros_like(rsq)
    for q in range(Q):                                    # static unroll
        Bq = B_ref[:, q]                                  # (BT, D, D)
        left = _bdot_ohb(oh, Bq)                          # (BT, n, D)
        coef = _bdot_oh(left, ohT)                        # (BT, n, n)
        mu = muv_ref[:, 0:1, q:q + 1]                     # (BT, 1, 1)
        # lane-expand per-batch scalars first: Mosaic cannot broadcast
        # (BT,1,1) into both sublanes and lanes in one op
        v_row = muv_ref[:, 1:2, q:q + 1] * jnp.ones_like(t_row)
        ph_row = 2.0 * REF_PI * mu * t_row
        s_row, c_row = _sincos(ph_row)
        s_col = jnp.transpose(s_row, (0, 2, 1))
        c_col = jnp.transpose(c_row, (0, 2, 1))
        ccss = c_col * c_row + s_col * s_row
        E = jnp.exp(-2.0 * (REF_PI * v_row) ** 2 * rsq)
        acc = acc + coef * (ccss * E)
    if masked:
        # fused mask_gram epilogue (round-5 glue-gap closure): zero padded
        # rows/cols and put 1 on their diagonal, HERE, instead of a
        # separate O(n^2) XLA pass over the HBM-resident gram
        # (ops/nlml.py:mask_gram was ~1 full extra read+write of the
        # batch's grams per objective evaluation).
        mk_row = k_ref[:, 0:1, :]                         # (BT, 1, n)
        mk_col = jnp.transpose(mk_row, (0, 2, 1))         # (BT, n, 1)
        ids_r = jax.lax.broadcasted_iota(jnp.int32, (BT, n, n), 1)
        ids_c = jax.lax.broadcasted_iota(jnp.int32, (BT, n, n), 2)
        eyef = (ids_r == ids_c).astype(acc.dtype)
        # (1 - m_i) on the diagonal via an outer product with ones (Mosaic
        # cannot lane-broadcast a (BT, n, 1) directly into (BT, n, n))
        diag_fill = eyef * ((1.0 - mk_col) * jnp.ones_like(t_row))
        acc = acc * (mk_col * mk_row) + diag_fill
    out_ref[:, :, :] = acc


def _gram_fwd_batched(t, meta, B, mu, v, mask=None):
    """(Bb, n) t/meta, (Bb, Q, D, D) B, (Bb, Q) mu/v [, (Bb, n) mask]
    -> (Bb, n, n); with mask the mask_gram epilogue is fused in."""
    Bb, n = t.shape
    Q, D = B.shape[1], B.shape[2]
    BT = _gbt(n, Q)
    Bp = -(-Bb // BT) * BT
    masked = mask is not None
    muv = jnp.stack([mu, v], axis=1).astype(jnp.float32)  # (Bb, 2, Q)
    if Bp != Bb:
        pad = Bp - Bb
        t = jnp.concatenate([t, jnp.zeros((pad, n), t.dtype)])
        meta = jnp.concatenate([meta, jnp.zeros((pad, n), meta.dtype)])
        B = jnp.concatenate([B, jnp.zeros((pad, Q, D, D), B.dtype)])
        muv = jnp.concatenate([muv, jnp.ones((pad, 2, Q), muv.dtype)])
        if masked:
            mask = jnp.concatenate([mask, jnp.zeros((pad, n), mask.dtype)])
    kernel = functools.partial(_gram_fwd_kernel, Q, D, masked)
    interp = _use_interpret()
    vec_spec = pl.BlockSpec((BT, 1, n), lambda i: (i, 0, 0))
    in_specs = [
        vec_spec,
        vec_spec,
        pl.BlockSpec((BT, Q, D, D), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((BT, 2, Q), lambda i: (i, 0, 0)),
    ]
    args = [
        t.astype(jnp.float32)[:, None, :],
        meta.astype(jnp.int32)[:, None, :],
        B.astype(jnp.float32),
        muv,
    ]
    if masked:
        in_specs.append(vec_spec)
        args.append(mask.astype(jnp.float32)[:, None, :])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
        grid=(Bp // BT,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
        interpret=interp,
        **_vmem_params(interp),
    )(*args)
    return out[:Bb]


def _gram_bwd_kernel(Q, D, masked, dK_ref, t_ref, m_ref, B_ref, muv_ref,
                     *rest):
    """Batched fused VJP: dB_q = O^T (dK * k_q) O;
    dmu_q = sum dK * coef_q * (-2 pi d sin(2 pi mu d) E_q);
    dv_q  = sum dK * coef_q * (-4 pi^2 v_q rsq k_q).
    With `masked` the cotangent is first scaled by the mask outer product
    (the fused epilogue's only hyper-dependent factor; the diag fill is
    hyper-free)."""
    if masked:
        k_ref, dB_ref, dmuv_ref = rest
    else:
        dB_ref, dmuv_ref = rest
    BT = t_ref.shape[0]
    n = t_ref.shape[2]
    t_row = t_ref[:, 0:1, :]
    t_col = jnp.transpose(t_row, (0, 2, 1))
    diff = t_col - t_row
    rsq = diff * diff
    oh, ohT = _onehots(m_ref, n, D, BT)
    w = dK_ref[:, :, :]
    if masked:
        mk_row = k_ref[:, 0:1, :]
        mk_col = jnp.transpose(mk_row, (0, 2, 1))
        w = w * (mk_col * mk_row)

    def _red(x):  # (BT, n, n) -> (BT, 1, 1), one axis at a time
        return jnp.sum(
            jnp.sum(x, axis=2, keepdims=True), axis=1, keepdims=True
        )

    for q in range(Q):
        Bq = B_ref[:, q]
        mu = muv_ref[:, 0:1, q:q + 1]
        v_row = muv_ref[:, 1:2, q:q + 1] * jnp.ones_like(t_row)
        s_row, c_row = _sincos(2.0 * REF_PI * mu * t_row)
        s_col = jnp.transpose(s_row, (0, 2, 1))
        c_col = jnp.transpose(c_row, (0, 2, 1))
        ccss = c_col * c_row + s_col * s_row
        ssin = s_col * c_row - c_col * s_row
        E = jnp.exp(-2.0 * (REF_PI * v_row) ** 2 * rsq)
        kq = ccss * E
        wk = w * kq
        tmp = _bdot_oh(wk, oh)                            # (BT, n, D)
        dB_ref[:, q] = _bdot_ohb(ohT, tmp)                # (BT, D, D)
        left = _bdot_ohb(oh, Bq)
        coef = _bdot_oh(left, ohT)
        wc = w * coef
        dmuv_ref[:, 0:1, q:q + 1] = _red(
            wc * (-2.0 * REF_PI * diff * ssin * E)
        )
        dmuv_ref[:, 1:2, q:q + 1] = _red(
            wc * (-4.0 * REF_PI**2 * v_row * rsq * kq)
        )


def _gram_bwd_batched(dK, t, meta, B, mu, v, mask=None):
    Bb, n = t.shape
    Q, D = B.shape[1], B.shape[2]
    BT = _gbt(n, Q)
    Bp = -(-Bb // BT) * BT
    masked = mask is not None
    muv = jnp.stack([mu, v], axis=1).astype(jnp.float32)
    if Bp != Bb:
        pad = Bp - Bb
        dK = jnp.concatenate([dK, jnp.zeros((pad, n, n), dK.dtype)])
        t = jnp.concatenate([t, jnp.zeros((pad, n), t.dtype)])
        meta = jnp.concatenate([meta, jnp.zeros((pad, n), meta.dtype)])
        B = jnp.concatenate([B, jnp.zeros((pad, Q, D, D), B.dtype)])
        muv = jnp.concatenate([muv, jnp.ones((pad, 2, Q), muv.dtype)])
        if masked:
            mask = jnp.concatenate([mask, jnp.zeros((pad, n), mask.dtype)])
    kernel = functools.partial(_gram_bwd_kernel, Q, D, masked)
    interp = _use_interpret()
    vec_spec = pl.BlockSpec((BT, 1, n), lambda i: (i, 0, 0))
    in_specs = [
        pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
        vec_spec,
        vec_spec,
        pl.BlockSpec((BT, Q, D, D), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((BT, 2, Q), lambda i: (i, 0, 0)),
    ]
    args = [
        dK.astype(jnp.float32),
        t.astype(jnp.float32)[:, None, :],
        meta.astype(jnp.int32)[:, None, :],
        B.astype(jnp.float32),
        muv,
    ]
    if masked:
        in_specs.append(vec_spec)
        args.append(mask.astype(jnp.float32)[:, None, :])
    dB, dmuv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Q, D, D), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 2, Q), jnp.float32),
        ),
        grid=(Bp // BT,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((BT, Q, D, D), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((BT, 2, Q), lambda i: (i, 0, 0)),
        ),
        interpret=interp,
        **_vmem_params(interp),
    )(*args)
    return dB[:Bb], dmuv[:Bb, 0], dmuv[:Bb, 1]


def _collapsing(batched_impl):
    """Collapse any vmap stack into the kernel batch axis (see
    pallas_chol._collapsing)."""

    @custom_vmap
    def f(*args):
        return batched_impl(*args)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = []
        for a, b in zip(args, in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            full.append(a.reshape((-1,) + a.shape[2:]))
        outs = f(*full)
        outs = jax.tree.map(
            lambda o: o.reshape((axis_size, -1) + o.shape[1:]), outs
        )
        return outs, jax.tree.map(lambda _: True, outs)

    return f


_gram_fwd_vm = _collapsing(_gram_fwd_batched)
_gram_bwd_vm = _collapsing(_gram_bwd_batched)
_gram_fwdm_vm = _collapsing(
    lambda t, meta, B, mu, v, mask: _gram_fwd_batched(
        t, meta, B, mu, v, mask
    )
)
_gram_bwdm_vm = _collapsing(
    lambda dK, t, meta, B, mu, v, mask: _gram_bwd_batched(
        dK, t, meta, B, mu, v, mask
    )
)


@jax.custom_vjp
def _gram_pallas(t, meta, B, mu, v):
    t = t - jnp.min(t)  # smaller phases; differences are unchanged
    return _gram_fwd_vm(
        t[None], meta[None], B[None], mu[None], v[None]
    )[0]


def _gram_pallas_fwd(t, meta, B, mu, v):
    return _gram_pallas(t, meta, B, mu, v), (t, meta, B, mu, v)


def _gram_pallas_bwd(res, dK):
    """Hyper cotangents in one fused kernel pass (t and meta are
    observation data: no gradient flows to them; meta is integer-typed ->
    float0 cotangent)."""
    t, meta, B, mu, v = res
    ts = t - jnp.min(t)
    dBs, dmus, dvs = _gram_bwd_vm(
        dK[None], ts[None], meta[None], B[None], mu[None], v[None]
    )
    import numpy as _np

    dt = jnp.zeros_like(t)
    dmeta = _np.zeros(meta.shape, dtype=jax.dtypes.float0)
    return dt, dmeta, dBs[0], dmus[0], dvs[0]


_gram_pallas.defvjp(_gram_pallas_fwd, _gram_pallas_bwd)


@jax.custom_vjp
def _gram_pallas_masked(t, meta, B, mu, v, mask):
    t = t - jnp.min(t)
    return _gram_fwdm_vm(
        t[None], meta[None], B[None], mu[None], v[None], mask[None]
    )[0]


def _gram_pallas_masked_fwd(t, meta, B, mu, v, mask):
    return (
        _gram_pallas_masked(t, meta, B, mu, v, mask),
        (t, meta, B, mu, v, mask),
    )


def _gram_pallas_masked_bwd(res, dK):
    t, meta, B, mu, v, mask = res
    ts = t - jnp.min(t)
    dBs, dmus, dvs = _gram_bwdm_vm(
        dK[None], ts[None], meta[None], B[None], mu[None], v[None],
        mask[None],
    )
    import numpy as _np

    dt = jnp.zeros_like(t)
    dmeta = _np.zeros(meta.shape, dtype=jax.dtypes.float0)
    dmask = jnp.zeros_like(mask)
    return dt, dmeta, dBs[0], dmus[0], dvs[0], dmask


_gram_pallas_masked.defvjp(_gram_pallas_masked_fwd, _gram_pallas_masked_bwd)


def gram_lmcsm_fused(
    spec: LMCSMSpec,
    t: jnp.ndarray,
    meta: jnp.ndarray,
    A: jnp.ndarray,
    mu: jnp.ndarray,
    v: jnp.ndarray,
    kappa: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for gram_lmcsm using the fused Pallas kernels
    when the shape allows, the XLA builder otherwise. With `mask` the
    mask_gram epilogue (zero padded rows/cols, unit diagonal) is fused
    into the same kernel pass — no separate O(n^2) masking op."""
    n = t.shape[-1]
    B = spec.coregional_B(A, kappa)
    if pallas_supported(n):
        if mask is not None:
            return _gram_pallas_masked(t, meta, B, mu, v, mask)
        return _gram_pallas(t, meta, B, mu, v)
    from medgp_tpu.ops.gram import gram_lmcsm

    K = gram_lmcsm(spec, t, meta, A, mu, v, kappa)
    if mask is not None:
        from medgp_tpu.ops.nlml import mask_gram

        K = mask_gram(K, mask.astype(K.dtype))
    return K
