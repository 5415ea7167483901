"""Pallas TPU kernels for fused LMC-SM gram construction (fwd + bwd).

The gram build is the framework's hottest non-factorization op: for every
pair (i, j) it needs sum_q B_q[meta_i, meta_j] * cos(2 pi mu_q d_ij) *
exp(-2 (pi v_q)^2 d_ij^2). The XLA path
(:func:`medgp_tpu.ops.gram.gram_lmcsm`) materializes (n, n) rsq and Q
gathered coefficient maps per accumulation step; these kernels fuse
everything into one pass with no HBM intermediates.

Two TPU-native tricks:

1. One-hot MXU gather: B_q[meta_i, meta_j] = onehot(meta_i) @ B_q @
   onehot(meta_j)^T — coregional gathers become systolic-array matmuls.

2. Rank-2 trig separation (round-4 roofline fix): cos is even, so
       cos(2 pi mu (t_i - t_j)) = c_i c_j + s_i s_j,
       c = cos(2 pi mu t), s = sin(2 pi mu t),
   turning the per-pair O(n^2) sqrt+cos maps into O(n) sincos plus VPU
   multiplies — only the exp(-2 (pi v)^2 rsq) map stays O(n^2) per
   component. Measured on a v5e (B=64, n=512, Q=5): the old direct kernel
   spent ~5.3 ms/batch forward, transcendental-bound. The same identity
   gives the backward d/dmu term: sin(2 pi mu d) = s_i c_j - c_i s_j.
   fp32 note: the large-phase arguments (2 pi mu t ~ 1e3 rad) carry the
   same ~|phase|*2^-24 rounding the reference's own fp32 cos of
   2 pi mu r has (c_kernel_LMC_SM.cpp:374-378); timestamps are shifted by
   t_min before phase computation to keep phases as small as the data
   allows.

The backward kernel computes (dB_q, dmu_q, dv_q) from the output cotangent
in ONE pass (the reference instead builds ~Q(DR+2+D) per-hyper n^2 maps,
c_kernel_LMC_SM.cpp:198-327); the chain into (A, kappa) through
B = A A^T + diag(kappa) is left to XLA autodiff (O(Q D^2 R) — negligible).

On non-TPU backends the kernels run in interpreter mode (tests); the public
entry point falls back to the XLA builder for unsupported shapes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend params are only importable with a TPU plugin
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from medgp_tpu.models.params import REF_PI, LMCSMSpec

_TILE = 512        # forward tile cap (one (512, 512) f32 tile = 1 MB VMEM)
_BWD_MAX_N = 512   # backward kernel runs the whole matrix as one tile


def _sincos(phase):
    return jnp.sin(phase), jnp.cos(phase)


def _dot_oh(a, b):
    """values @ one-hot (split the FIRST operand): Mosaic's DEFAULT f32 dot
    multiplies in bf16, rounding the value operand by ~2^-8; the {0,1} side
    is bf16-exact, so splitting the value operand into hi+lo recovers
    ~2^-16 relative accuracy at 2 bf16 passes (HIGHEST costs 6)."""
    f32 = jnp.float32
    d = jax.lax.Precision.DEFAULT
    a_hi = a.astype(jnp.bfloat16).astype(f32)
    a_lo = a - a_hi
    return (
        jnp.dot(a_hi, b, preferred_element_type=f32, precision=d)
        + jnp.dot(a_lo, b, preferred_element_type=f32, precision=d)
    )


def _dot_ohb(a, b):
    """one-hot @ values (split the SECOND operand); see _dot_oh. Keeping
    the split on the value side avoids Mosaic relayout-heavy transposes
    (measured: the transposed formulation cost the gram kernels ~3x their
    arithmetic floor)."""
    f32 = jnp.float32
    d = jax.lax.Precision.DEFAULT
    b_hi = b.astype(jnp.bfloat16).astype(f32)
    b_lo = b - b_hi
    return (
        jnp.dot(a, b_hi, preferred_element_type=f32, precision=d)
        + jnp.dot(a, b_lo, preferred_element_type=f32, precision=d)
    )


def _gram_tile_kernel(Q, D, t_ref, tj_ref, mi_ref, mj_ref, B_ref, muv_ref,
                      out_ref):
    ti = t_ref[:, 0:1]                       # (TM, 1), already t - t_min
    tj = tj_ref[:, 0:1]                      # (TN, 1)
    diff = ti - tj.T                         # (TM, TN)
    rsq = diff * diff

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    ohi = (mi_ref[:, 0:1] == ids).astype(jnp.float32)   # (TM, D)
    TN = tj.shape[0]
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (D, TN), 0)
    ohjT = (mj_ref[:, 0:1].T == ids_c).astype(jnp.float32)  # (D, TN)

    acc = jnp.zeros_like(rsq)
    for q in range(Q):  # Q is small and static: unrolled
        Bq = B_ref[q]                        # (D, D)
        left = _dot_ohb(ohi, Bq)             # (TM, D), exact-ish gather
        coef = _dot_oh(left, ohjT)
        mu = muv_ref[0, q]
        v = muv_ref[1, q]
        si, ci = _sincos(2.0 * REF_PI * mu * ti)
        sj, cj = _sincos(2.0 * REF_PI * mu * tj)
        ccss = ci * cj.T + si * sj.T         # cos(2 pi mu (t_i - t_j))
        E = jnp.exp(-2.0 * (REF_PI * v) ** 2 * rsq)
        acc = acc + coef * (ccss * E)
    out_ref[:, :] = acc


def _pallas_gram_raw(t2d, meta2d, B, mu, v, *, interpret: bool):
    n = t2d.shape[0]
    Q, D, _ = B.shape
    muv = jnp.stack([mu, v]).astype(jnp.float32)  # (2, Q)
    tile = min(_TILE, n)
    grid = (n // tile, n // tile)
    kernel = functools.partial(_gram_tile_kernel, Q, D)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((Q, D, D), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((2, Q), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
        interpret=interpret,
    )(t2d, t2d, meta2d, meta2d, B.astype(jnp.float32), muv)


def _gram_bwd_kernel(Q, D, dK_ref, t_ref, mi_ref, B_ref, muv_ref,
                     dB_ref, dmuv_ref):
    """Single-tile fused VJP: dB_q = O^T (dK * k_q) O;
    dmu_q = sum dK * coef_q * (-2 pi d sin(2 pi mu d) E_q);
    dv_q  = sum dK * coef_q * (-4 pi^2 v_q rsq k_q)."""
    t = t_ref[:, 0:1]                        # (n, 1)
    diff = t - t.T
    rsq = diff * diff
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    oh = (mi_ref[:, 0:1] == ids).astype(jnp.float32)    # (n, D)
    n_ = oh.shape[0]
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (D, n_), 0)
    ohT = (mi_ref[:, 0:1].T == ids_c).astype(jnp.float32)  # (D, n)
    w = dK_ref[:, :]

    for q in range(Q):
        Bq = B_ref[q]
        mu = muv_ref[0, q]
        v = muv_ref[1, q]
        s1, c1 = _sincos(2.0 * REF_PI * mu * t)
        ccss = c1 * c1.T + s1 * s1.T          # cos(2 pi mu d)
        ssin = s1 * c1.T - c1 * s1.T          # sin(2 pi mu d)
        E = jnp.exp(-2.0 * (REF_PI * v) ** 2 * rsq)
        kq = ccss * E
        wk = w * kq
        tmp = _dot_oh(wk, oh)                                      # (n, D)
        dB_ref[q] = _dot_ohb(ohT, tmp)
        left = _dot_ohb(oh, Bq)
        coef = _dot_oh(left, ohT)
        wc = w * coef
        dmuv_ref[0, q] = jnp.sum(
            wc * (-2.0 * REF_PI * diff * ssin * E)
        )
        dmuv_ref[1, q] = jnp.sum(
            wc * (-4.0 * REF_PI**2 * v * rsq * kq)
        )


def _pallas_gram_bwd_raw(dK, t2d, meta2d, B, mu, v, *, interpret: bool):
    n = t2d.shape[0]
    Q, D, _ = B.shape
    muv = jnp.stack([mu, v]).astype(jnp.float32)
    kernel = functools.partial(_gram_bwd_kernel, Q, D)
    # the (2, Q) scalar accumulators live in SMEM (Mosaic cannot store
    # scalars to VMEM); dB is a vector store and stays in VMEM
    dmuv_space = (
        dict(memory_space=pltpu.SMEM) if _HAS_PLTPU and not interpret
        else {}
    )
    dB, dmuv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Q, D, D), jnp.float32),
            jax.ShapeDtypeStruct((2, Q), jnp.float32),
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((Q, D, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, Q), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((Q, D, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, Q), lambda i: (0, 0), **dmuv_space),
        ),
        interpret=interpret,
    )(dK.astype(jnp.float32), t2d, meta2d, B.astype(jnp.float32), muv)
    return dB, dmuv[0], dmuv[1]


_E_MAX_N = 512   # E-residual caching: (Q, n, n) per patient must fit VMEM


def _gram_fwd_e_raw(t2d, meta2d, B, mu, v, *, interpret: bool):
    """Forward that ALSO emits the per-component exp maps E_q as grad
    residuals, so the backward does ZERO per-pair transcendentals (the
    exp maps were ~half the gram VJP cost). Used only by the custom-VJP
    forward rule — value-only callers (restart screens, NLML-only) take
    the E-free kernel."""
    n = t2d.shape[0]
    Q, D, _ = B.shape
    muv = jnp.stack([mu, v]).astype(jnp.float32)

    def kernel(t_ref, mi_ref, B_ref, muv_ref, out_ref, e_ref):
        ti = t_ref[:, 0:1]
        diff = ti - ti.T
        rsq = diff * diff
        ids = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
        oh = (mi_ref[:, 0:1] == ids).astype(jnp.float32)
        n_ = oh.shape[0]
        ids_c = jax.lax.broadcasted_iota(jnp.int32, (D, n_), 0)
        ohT = (mi_ref[:, 0:1].T == ids_c).astype(jnp.float32)
        acc = jnp.zeros_like(rsq)
        for q in range(Q):
            Bq = B_ref[q]
            left = _dot_ohb(oh, Bq)
            coef = _dot_oh(left, ohT)
            mu_q = muv_ref[0, q]
            v_q = muv_ref[1, q]
            si, ci = _sincos(2.0 * REF_PI * mu_q * ti)
            ccss = ci * ci.T + si * si.T
            E = jnp.exp(-2.0 * (REF_PI * v_q) ** 2 * rsq)
            e_ref[q] = E
            acc = acc + coef * (ccss * E)
        out_ref[:, :] = acc

    params = {}
    if _HAS_PLTPU and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((Q, n, n), jnp.float32),
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((Q, D, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, Q), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((Q, n, n), lambda i: (0, 0, 0)),
        ),
        interpret=interpret,
        **params,
    )(t2d, meta2d, B.astype(jnp.float32), muv)


def _gram_bwd_e_kernel(Q, D, dK_ref, t_ref, mi_ref, B_ref, muv_ref, e_ref,
                       dB_ref, dmuv_ref):
    """E-residual backward: kq = (ci cj + si sj) * E with E read back from
    the forward — only O(n) sincos, no O(n^2) transcendentals."""
    t = t_ref[:, 0:1]
    diff = t - t.T
    rsq = diff * diff
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    oh = (mi_ref[:, 0:1] == ids).astype(jnp.float32)
    n_ = oh.shape[0]
    ids_c = jax.lax.broadcasted_iota(jnp.int32, (D, n_), 0)
    ohT = (mi_ref[:, 0:1].T == ids_c).astype(jnp.float32)
    w = dK_ref[:, :]

    for q in range(Q):
        Bq = B_ref[q]
        mu = muv_ref[0, q]
        v = muv_ref[1, q]
        s1, c1 = _sincos(2.0 * REF_PI * mu * t)
        E = e_ref[q]
        kq = (c1 * c1.T + s1 * s1.T) * E
        ssin = s1 * c1.T - c1 * s1.T
        wk = w * kq
        tmp = _dot_oh(wk, oh)
        dB_ref[q] = _dot_ohb(ohT, tmp)
        left = _dot_ohb(oh, Bq)
        coef = _dot_oh(left, ohT)
        wc = w * coef
        dmuv_ref[0, q] = jnp.sum(wc * (-2.0 * REF_PI * diff * ssin * E))
        dmuv_ref[1, q] = jnp.sum(wc * (-4.0 * REF_PI**2 * v * rsq * kq))


def _pallas_gram_bwd_e_raw(dK, t2d, meta2d, B, mu, v, E, *,
                           interpret: bool):
    n = t2d.shape[0]
    Q, D, _ = B.shape
    muv = jnp.stack([mu, v]).astype(jnp.float32)
    kernel = functools.partial(_gram_bwd_e_kernel, Q, D)
    dmuv_space = (
        dict(memory_space=pltpu.SMEM) if _HAS_PLTPU and not interpret
        else {}
    )
    params = {}
    if _HAS_PLTPU and not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        )
    dB, dmuv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Q, D, D), jnp.float32),
            jax.ShapeDtypeStruct((2, Q), jnp.float32),
        ),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n, n), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((n, 1), lambda i: (0, 0)),
            pl.BlockSpec((Q, D, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, Q), lambda i: (0, 0)),
            pl.BlockSpec((Q, n, n), lambda i: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((Q, D, D), lambda i: (0, 0, 0)),
            pl.BlockSpec((2, Q), lambda i: (0, 0), **dmuv_space),
        ),
        interpret=interpret,
        **params,
    )(dK.astype(jnp.float32), t2d, meta2d, B.astype(jnp.float32), muv, E)
    return dB, dmuv[0], dmuv[1]


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


@jax.custom_vjp
def _gram_pallas(t, meta, B, mu, v):
    t2d = t.astype(jnp.float32)[:, None]
    t2d = t2d - jnp.min(t2d)  # smaller phases; differences are unchanged
    meta2d = meta.astype(jnp.int32)[:, None]
    return _pallas_gram_raw(
        t2d, meta2d, B, mu, v, interpret=_use_interpret()
    )


def _use_e_residuals(n: int) -> bool:
    env = os.environ.get("MEDGP_GRAM_E")
    if env is not None:
        return env not in ("0", "false", "False") and n <= _E_MAX_N
    return n <= _E_MAX_N


def _gram_pallas_fwd(t, meta, B, mu, v):
    n = t.shape[0]
    if _use_e_residuals(n):
        t2d = t.astype(jnp.float32)[:, None]
        t2d = t2d - jnp.min(t2d)
        meta2d = meta.astype(jnp.int32)[:, None]
        K, E = _gram_fwd_e_raw(
            t2d, meta2d, B, mu, v, interpret=_use_interpret()
        )
        return K, (t, meta, B, mu, v, E)
    return _gram_pallas(t, meta, B, mu, v), (t, meta, B, mu, v, None)


def _gram_pallas_bwd(res, dK):
    """Hyper cotangents in one fused kernel pass (t and meta are
    observation data: no gradient flows to them; meta is integer-typed ->
    float0 cotangent)."""
    t, meta, B, mu, v, E = res
    n = t.shape[0]
    t2d = t.astype(jnp.float32)[:, None]
    t2d = t2d - jnp.min(t2d)
    meta2d = meta.astype(jnp.int32)[:, None]
    if E is not None:
        dBs, dmus, dvs = _pallas_gram_bwd_e_raw(
            dK, t2d, meta2d, B, mu, v, E, interpret=_use_interpret()
        )
    elif n <= _BWD_MAX_N:
        dBs, dmus, dvs = _pallas_gram_bwd_raw(
            dK, t2d, meta2d, B, mu, v, interpret=_use_interpret()
        )
    else:  # XLA fallback for outlier tiles (kept identical in math)
        rsq = (t[:, None] - t[None, :]) ** 2
        r = jnp.sqrt(rsq)
        O = jax.nn.one_hot(meta, B.shape[1], dtype=dK.dtype)

        def per_q(q):
            e = jnp.exp(-2.0 * (REF_PI * v[q]) ** 2 * rsq)
            c = jnp.cos(2.0 * REF_PI * r * mu[q])
            kq = c * e
            dB = O.T @ (dK * kq) @ O
            coef = O @ B[q] @ O.T
            dmu = jnp.sum(
                dK * coef
                * (-2.0 * REF_PI * r
                   * jnp.sin(2.0 * REF_PI * r * mu[q]) * e)
            )
            dv = jnp.sum(dK * coef * (-4.0 * REF_PI**2 * v[q] * rsq * kq))
            return dB, dmu, dv

        dBs, dmus, dvs = jax.vmap(per_q)(jnp.arange(B.shape[0]))
    import numpy as _np

    dt = jnp.zeros_like(t)
    dmeta = _np.zeros(meta.shape, dtype=jax.dtypes.float0)
    return dt, dmeta, dBs, dmus, dvs


_gram_pallas.defvjp(_gram_pallas_fwd, _gram_pallas_bwd)


def pallas_supported(n: int) -> bool:
    # n must be positive and tile exactly: the kernel uses
    # tile = min(_TILE, n) and a (n // tile)^2 grid, so n must be a multiple
    # of the tile (n=0 would divide by zero).
    return n > 0 and n % 128 == 0 and (n <= _TILE or n % _TILE == 0)


def gram_lmcsm_fused(
    spec: LMCSMSpec,
    t: jnp.ndarray,
    meta: jnp.ndarray,
    A: jnp.ndarray,
    mu: jnp.ndarray,
    v: jnp.ndarray,
    kappa: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-in replacement for gram_lmcsm using the fused Pallas kernel when
    the shape allows, the XLA builder otherwise."""
    n = t.shape[-1]
    B = spec.coregional_B(A, kappa)
    if pallas_supported(n):
        return _gram_pallas(t, meta, B, mu, v)
    from medgp_tpu.ops.gram import gram_lmcsm

    return gram_lmcsm(spec, t, meta, A, mu, v, kappa)
