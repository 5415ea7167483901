"""Pallas TPU kernel for fused LMC-SM gram construction.

The gram build is the framework's hottest non-Cholesky op: for every pair
(i, j) it needs rsq = (t_i - t_j)^2 and sum_q B_q[meta_i, meta_j] *
cos(2 pi r mu_q) * exp(-2 (pi v_q)^2 rsq). The XLA path
(:func:`medgp_tpu.ops.gram.gram_lmcsm`) materializes a (n, n) rsq buffer and
Q gathered (n, n) coefficient maps per accumulation step; this kernel fuses
everything into one pass over (TM, TN) output tiles with no HBM
intermediates.

TPU-native trick: the per-pair coregional coefficient gather
B_q[meta_i, meta_j] is expressed as two small matmuls with one-hot encodings,
    coef = onehot(meta_i) @ B_q @ onehot(meta_j)^T,
which runs on the MXU instead of producing a scatter/gather — gathers by
table lookup are exactly what the systolic array cannot do and one-hot
contractions are exactly what it can.

The backward pass reuses the same structure as XLA matmuls (dB_q =
O_i^T (dK * k_q) O_j, etc.) via custom_vjp; hyperparameter gradients only
(t, meta are observation data).

On non-TPU backends the kernel runs in interpreter mode (tests); the public
entry point `gram_lmcsm_fused` falls back to the XLA builder for shapes the
kernel does not support (n not a multiple of the tile).
"""

from __future__ import annotations

import functools

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

_TILE = 256


def _gram_tile_kernel(Q, D, t_ref, tj_ref, mi_ref, mj_ref, B_ref, muv_ref,
                      out_ref):
    ti = t_ref[:, 0:1]                       # (TM, 1)
    tj = tj_ref[:, 0:1]                      # (TN, 1)
    diff = ti - tj.T                         # (TM, TN)
    rsq = diff * diff
    r = jnp.sqrt(rsq)

    ids = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    ohi = (mi_ref[:, 0:1] == ids).astype(jnp.float32)   # (TM, D)
    ohj = (mj_ref[:, 0:1] == ids).astype(jnp.float32)   # (TN, D)

    acc = jnp.zeros_like(rsq)
    for q in range(Q):  # Q is small and static: unrolled
        Bq = B_ref[q]                        # (D, D)
        left = jnp.dot(ohi, Bq, preferred_element_type=jnp.float32)
        coef = jnp.dot(left, ohj.T, preferred_element_type=jnp.float32)
        mu = muv_ref[0, q]
        v = muv_ref[1, q]
        k = jnp.cos(2.0 * REF_PI * r * mu) * jnp.exp(
            -2.0 * (REF_PI * v) ** 2 * rsq
        )
        acc = acc + coef * k
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


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


@jax.custom_vjp
def _gram_pallas(t, meta, B, mu, v):
    t2d = t.astype(jnp.float32)[:, None]
    meta2d = meta.astype(jnp.int32)[:, None]
    return _pallas_gram_raw(
        t2d, meta2d, B, mu, v, interpret=_use_interpret()
    )


def _gram_pallas_fwd(t, meta, B, mu, v):
    return _gram_pallas(t, meta, B, mu, v), (t, meta, B, mu, v)


def _gram_pallas_bwd(res, dK):
    """Hyper gradients with MXU-shaped contractions (XLA):
        dB_q  = O^T (dK * k_q) O
        dmu_q = sum dK * coef_q * (-2 pi r sin(2 pi r mu_q) e_q)
        dv_q  = sum dK * coef_q * (-4 pi^2 v_q rsq * k_q)
    """
    t, meta, B, mu, v = res
    Q, D, _ = B.shape
    rsq = (t[:, None] - t[None, :]) ** 2
    r = jnp.sqrt(rsq)
    O = jax.nn.one_hot(meta, D, dtype=dK.dtype)  # (n, D)

    def per_q(q):
        e = jnp.exp(-2.0 * (REF_PI * v[q]) ** 2 * rsq)
        c = jnp.cos(2.0 * REF_PI * r * mu[q])
        kq = c * e
        dB = O.T @ (dK * kq) @ O
        coef = O @ B[q] @ O.T
        dmu = jnp.sum(
            dK * coef * (-2.0 * REF_PI * r * jnp.sin(2.0 * REF_PI * r * mu[q]) * e)
        )
        dv = jnp.sum(
            dK * coef * (-4.0 * REF_PI**2 * v[q] * rsq * kq)
        )
        return dB, dmu, dv

    dBs, dmus, dvs = jax.vmap(per_q)(jnp.arange(Q))
    # t and meta are observation data: no hyper gradient flows to them
    # (meta is integer-typed -> float0 cotangent)
    import numpy as _np

    dt = jnp.zeros_like(t)
    dmeta = _np.zeros(meta.shape, dtype=jax.dtypes.float0)
    return dt, dmeta, dBs, dmus, dvs


_gram_pallas.defvjp(_gram_pallas_fwd, _gram_pallas_bwd)


def pallas_supported(n: int) -> bool:
    # n must be positive and tile exactly: the kernel uses
    # tile = min(_TILE, n) and a (n // tile)^2 grid, so n must be a multiple
    # of the tile (384 would pass an n % 128 check but leave out-of-grid
    # tiles unwritten; n=0 would divide by zero).
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
