"""Pallas TPU kernels for the batched Cholesky chain.

Why these exist (measured on a v5e chip, B=64 patients, n=512, fp32 —
tools/profile_hot.py round 4): XLA's decompositions of the factorization
chain dominate the canonical objective+grad evaluation:

    jnp.linalg.cholesky           8.9 ms   (0.32 TFLOP/s)
    cho_solve (ONE rhs)           5.8 ms   (serial trsm expansion)
    solve_triangular(L, I)        5.7 ms

XLA expands these into While loops whose per-iteration cost is full-op
dispatch (~17 us x 512 sequential columns). These kernels run a TWO-LEVEL
blocked right-looking algorithm *inside* one Pallas program:

  * 32-wide column blocks are factored by a fori_loop whose steps are a
    handful of masked VPU ops on (BT, 32, 32) tiles (Mosaic has no
    value-level dynamic_slice, so columns are selected by iota masks);
    the block inverse rides along (row j of L is final at step j);
  * four 32-blocks aggregate into a 128-superblock whose inverse is
    assembled by substitution, so the PANEL SOLVE and TRAILING UPDATE —
    where the O(n^3) lives — run as rank-128 MXU `dot_general`s
    (a first single-level rank-32 version starved the MXU: contraction
    dim 32 x HIGHEST-precision 6-pass left chol_solve at ~8 ms);
  * the jittered noise diagonal is folded in on load, and the forward +
    backward substitutions for alpha = K^{-1} y ride along at superblock
    granularity (replacing XLA's pathological one-rhs trsm);
  * the 128-diagonal-block inverses are RETURNED (`linvd`) and reused by
    the backward kernel `tri_inv` (Q-matrix identity needs L^{-1}), which
    is then pure MXU substitution.

Reference algorithm being replaced: LAPACKE_spotrf + spotrs + strtri
(medgpc/src/inference/c_inference_exact.cpp:97-152).

Layout: the batch is tiled BT matrices per grid step so each sequential
column step vectorizes across the batch tile. Exposed through
`jax.custom_batching.custom_vmap` wrappers whose rules collapse arbitrary
leading vmap axes into the kernel's batch axis, so `vmap(masked_nlml)`
lands in ONE kernel launch.

Precision: 32-level dots run at HIGHEST (6-pass, fp32-faithful); the wide
rank-128 panels default to HIGH (3-pass) — Mosaic's DEFAULT f32 matmul
multiplies in bf16 (measured ~3e-3 relative error on L — unacceptable
inside a factorization). MEDGP_CHOL_PREC=highest forces 6-pass everywhere.

Failure semantics match jnp.linalg.cholesky: a non-SPD pivot produces NaN
that propagates through the remaining columns; `ops.nlml._chol_ok` detects
it and the jitter-escalation loop retries (c_inference_exact.cpp:99-111).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors pallas_gram
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_BS = 32          # inner column block (VPU factor loop)
_SB = 128         # superblock (MXU panel/trailing granularity)
# Crossover bound, MEASURED (tools/chol_n2048_check.py, v5e): at n=2048
# the 100 MB VMEM cap admits only BT=1, the serial 32-column factor loop
# loses its batch amortization, and the kernel runs 2.3x SLOWER than
# XLA's blocked cholesky (1,297 vs 558 ms per 4-batch; bit-correct,
# rel err ~4e-7). XLA's While expansion is only pathological at small n
# where per-step dispatch dominates — so the kernel path stays capped at
# 1024 on purpose, not for VMEM reasons.
_MAX_N = 1024


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)


def use_pallas_chol() -> bool:
    """Pallas factorization chain on TPU; override MEDGP_PALLAS_CHOL=0/1."""
    env = os.environ.get("MEDGP_PALLAS_CHOL")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "tpu"


def pallas_chol_supported(n: int) -> bool:
    # 128-lane / superblock alignment, plus the VMEM bound at BT=1:
    # double-buffered K-in/L-out windows (4 n^2 f32) with headroom for
    # the qmat kernel's extra scratch window (6 n^2 f32 total).
    return (
        n >= _SB
        and n % _SB == 0
        and n <= _MAX_N
        and 6 * n * n * 4 <= _vmem_limit()
    )


def _vmem_limit() -> int:
    """Scoped-VMEM cap for the kernels (bytes); MEDGP_CHOL_VMEM overrides.

    100 MB (of the 128 MiB physical VMEM on v4/v5e/v5p) — raised from the
    64 MB Mosaic default in round 5 to admit BT=16 at n=512, measured
    stable and fastest on the v5e (tools/chol_bt_sweep.py)."""
    return int(os.environ.get("MEDGP_CHOL_VMEM", str(100 * 1024 * 1024)))


def _batch_tile(n: int) -> int:
    # (BT, n, n) K-in and L-out windows double-buffer across grid steps:
    # 4 x BT x n^2 x 4B must fit the scoped-VMEM cap. MEDGP_CHOL_BT
    # overrides for tuning. Round-5 sweep at n=512 on the v5e
    # (tools/chol_bt_sweep.py): BT=16 @ 100 MB VMEM beats BT=8 @ 64 MB by
    # 5% standalone and 6.7% in the composed objective+grad chain — the
    # serial 32-column factor steps amortize over the batch tile.
    env = os.environ.get("MEDGP_CHOL_BT")
    if env:
        return max(1, int(env))
    return max(1, min(16, (16 * 1024 * 1024) // (n * n * 4)))


def _tile_for(n: int, B: int) -> int:
    """Batch tile clipped to the pow-2 roundup of the actual batch, so a
    small batch (sampler buckets, tests) is never padded past its own
    rounded size just to fill a 16-wide tile."""
    b2 = 1
    while b2 < B:
        b2 *= 2
    return max(1, min(_batch_tile(n), b2))


def _bdot(a, b, tb=False, prec=None):
    """Batched matmul on the MXU: (BT, m, k) @ (BT, k, p) (tb: contract b's
    last dim instead of its middle one)."""
    dn = (((2,), (2 if tb else 1,)), ((0,), (0,)))
    return jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32,
        precision=prec or jax.lax.Precision.HIGHEST,
    )


def _bdot_f32x3(a, b, tb=False):
    """fp32-faithful batched matmul from THREE bf16 MXU passes (Mosaic's
    dot lowering supports only DEFAULT=1-pass-bf16 and HIGHEST=6-pass; the
    classic a_hi*b_hi + a_hi*b_lo + a_lo*b_hi split recovers ~fp32 accuracy
    at twice HIGHEST's throughput — the wide rank-128 panels are where the
    O(n^3) lives). MEDGP_CHOL_PREC=highest falls back to the 6-pass path."""
    if os.environ.get("MEDGP_CHOL_PREC") == "highest":
        return _bdot(a, b, tb=tb)
    f32 = jnp.float32
    d = jax.lax.Precision.DEFAULT
    a_hi = a.astype(jnp.bfloat16).astype(f32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(f32)
    b_lo = b - b_hi
    return (
        _bdot(a_hi, b_hi, tb=tb, prec=d)
        + _bdot(a_hi, b_lo, tb=tb, prec=d)
        + _bdot(a_lo, b_hi, tb=tb, prec=d)
    )


def _diag_block_factor(A0, BT):
    """Factor one (BT, 32, 32) SPD tile: returns (Lt, M = Lt^{-1}).

    fori over columns; each step is a few masked VPU ops on 32x32 tiles.
    The inverse rows ride along (row j of Lt is final at step j).
    """
    f32 = A0.dtype
    ri3 = jax.lax.broadcasted_iota(jnp.int32, (BT, _BS, _BS), 1)
    ci3 = jax.lax.broadcasted_iota(jnp.int32, (BT, _BS, _BS), 2)
    rowidx = jax.lax.broadcasted_iota(jnp.int32, (BT, _BS), 1)
    eye = (ri3 == ci3).astype(f32)

    def body(j, carry):
        A, Lt, M = carry
        # reductions one axis at a time, everything >= 2-D (multi-axis
        # reduces and rank-1 values trip Mosaic layout)
        d = jnp.sum(
            jnp.sum(
                jnp.where((ri3 == j) & (ci3 == j), A, 0.0),
                axis=2, keepdims=True,
            ),
            axis=1,
        )                                                   # (BT, 1)
        s = jnp.sqrt(d)                                     # NaN on failure
        col = jnp.sum(jnp.where(ci3 == j, A, 0.0), axis=2)  # (BT, BS)
        colL = jnp.where(rowidx > j, col / s, 0.0)
        colL = colL + jnp.where(rowidx == j, s, 0.0)
        A = A - colL[:, :, None] * colL[:, None, :]
        Lt = jnp.where(ci3 == j, colL[:, :, None], Lt)
        # inverse row j: (e_j - L[j, :j] @ M[:j]) / s
        Lrow = jnp.sum(jnp.where(ri3 == j, Lt, 0.0), axis=1)
        Lrow = jnp.where(rowidx < j, Lrow, 0.0)
        acc = jnp.sum(Lrow[:, :, None] * M, axis=1)
        Mrow = ((rowidx == j).astype(f32) - acc) / s
        M = jnp.where(ri3 == j, Mrow[:, None, :], M)
        return A, Lt, M

    _, Lt, M = jax.lax.fori_loop(0, _BS, body, (A0, jnp.zeros_like(A0), eye))
    return Lt, M


def _combine_inverse(Msubs, Lblk):
    """(BT, 128, 128) inverse of a lower-tri superblock from its four
    32-diag inverses + sub-panels (substitution; ~10 small HIGHEST dots).

    Lblk: the finished (BT, 128, 128) lower superblock (value)."""
    R = _SB // _BS
    sub = [[None] * R for _ in range(R)]
    for i in range(R):
        sub[i][i] = Msubs[i]
    for i in range(1, R):
        for j in range(i - 1, -1, -1):
            S = None
            for k in range(j, i):
                Lik = Lblk[:, i * _BS:(i + 1) * _BS, k * _BS:(k + 1) * _BS]
                term = _bdot(Lik, sub[k][j])
                S = term if S is None else S + term
            sub[i][j] = -_bdot(Msubs[i], S)
    rows = []
    for i in range(R):
        row = [
            sub[i][j] if j <= i else jnp.zeros_like(sub[i][i])
            for j in range(R)
        ]
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def _chol_solve_kernel(n, K_ref, nz_ref, y_ref, L_ref, alpha_ref,
                       linvd_ref):
    BT = K_ref.shape[0]
    NB = n // _SB
    f32 = jnp.float32

    # load + fold in the (already jitter-scaled) noise diagonal
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eyemask = (ri == ci).astype(f32)
    L_ref[:, :, :] = (
        K_ref[:, :, :] + eyemask[None] * nz_ref[:, 0, :][:, None, :]
    )

    y = y_ref[:, 0, :]                                     # (BT, n)
    zs = [None] * NB
    M128s = [None] * NB
    for kb in range(NB):
        lo = kb * _SB
        # ---- factor the 128-superblock via four 32-blocks ----
        Msubs = []
        for sb in range(_SB // _BS):
            o = lo + sb * _BS
            A0 = L_ref[:, o:o + _BS, o:o + _BS]
            Lt, M32 = _diag_block_factor(A0, BT)
            L_ref[:, o:o + _BS, o:o + _BS] = Lt
            Msubs.append(M32)
            if o + _BS < lo + _SB:
                below = L_ref[:, o + _BS:lo + _SB, o:o + _BS]
                P = _bdot(below, M32, tb=True)
                L_ref[:, o + _BS:lo + _SB, o:o + _BS] = P
                T = L_ref[:, o + _BS:lo + _SB, o + _BS:lo + _SB]
                L_ref[:, o + _BS:lo + _SB, o + _BS:lo + _SB] = (
                    T - _bdot(P, P, tb=True)
                )
        Lblk = L_ref[:, lo:lo + _SB, lo:lo + _SB]
        M128 = _combine_inverse(Msubs, Lblk)
        M128s[kb] = M128
        linvd_ref[:, kb] = M128

        # ---- forward substitution (z), superblock granularity ----
        ykb = y[:, lo:lo + _SB]
        zkb = jnp.sum(M128 * ykb[:, None, :], axis=2)
        zs[kb] = zkb

        # ---- wide rank-128 panel + trailing update (the O(n^3)) ----
        if kb < NB - 1:
            below = L_ref[:, lo + _SB:, lo:lo + _SB]       # (BT, m, 128)
            P = _bdot_f32x3(below, M128, tb=True)          # A21 @ M^T
            L_ref[:, lo + _SB:, lo:lo + _SB] = P
            T = L_ref[:, lo + _SB:, lo + _SB:]
            L_ref[:, lo + _SB:, lo + _SB:] = (
                T - _bdot_f32x3(P, P, tb=True)
            )
            ybelow = y[:, lo + _SB:] - jnp.sum(
                P * zkb[:, None, :], axis=2
            )
            y = jnp.concatenate([y[:, :lo + _SB], ybelow], axis=1)

    # ---- backward substitution: L^T alpha = z ----
    alphas = [None] * NB
    for kb in reversed(range(NB)):
        lo = kb * _SB
        rhs = zs[kb]
        if kb < NB - 1:
            panel = L_ref[:, lo + _SB:, lo:lo + _SB]       # (BT, m, 128)
            below_alpha = jnp.concatenate(alphas[kb + 1:], axis=1)
            rhs = rhs - jnp.sum(panel * below_alpha[:, :, None], axis=1)
        alphas[kb] = jnp.sum(M128s[kb] * rhs[:, :, None], axis=1)
    alpha_ref[:, 0, :] = jnp.concatenate(alphas, axis=1)

    # zero the Schur garbage above the diagonal so L is a clean lower factor
    L_ref[:, :, :] = L_ref[:, :, :] * (ri >= ci).astype(f32)[None]


def _chol_solve_batched(K, noise_scaled, y):
    """(B, n, n), (B, n), (B, n) -> (L, alpha, linvd).

    Factors K + diag(noise_scaled) and solves for alpha in one kernel.
    linvd: (B, n/128, 128, 128) diagonal-superblock inverses of L (consumed
    by tri_inv on the backward pass)."""
    B, n, _ = K.shape
    BT = _tile_for(n, B)
    Bp = -(-B // BT) * BT
    if Bp != B:
        pad = Bp - B
        K = jnp.concatenate(
            [K, jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), (pad, n, n))]
        )
        noise_scaled = jnp.concatenate(
            [noise_scaled, jnp.zeros((pad, n), noise_scaled.dtype)]
        )
        y = jnp.concatenate([y, jnp.zeros((pad, n), y.dtype)])
    NB = n // _SB
    kernel = functools.partial(_chol_solve_kernel, n)
    params = {}
    if _HAS_PLTPU and not _use_interpret():
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()
        )
    # vectors ride as (B, 1, n): TPU block shapes need the last two dims
    # 8/128-aligned or equal to the array dims
    L, alpha, linvd = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((Bp, NB, _SB, _SB), jnp.float32),
        ),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, 1, n), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, NB, _SB, _SB), lambda i: (i, 0, 0, 0)),
        ),
        interpret=_use_interpret(),
        **params,
    )(
        K.astype(jnp.float32),
        noise_scaled.astype(jnp.float32)[:, None, :],
        y.astype(jnp.float32)[:, None, :],
    )
    return L[:B], alpha[:B, 0], linvd[:B]


def _tri_inv_kernel(n, L_ref, linvd_ref, X_ref):
    """Lower-triangular inverse from L + its diagonal-superblock inverses:
    row-block forward substitution, all-MXU. Linv is lower-triangular, so
    X's columns right of the row block are zero except the diagonal slot,
    which is M128 itself."""
    BT = L_ref.shape[0]
    NB = n // _SB
    f32 = jnp.float32

    X_ref[:, :, :] = jnp.zeros((BT, n, n), f32)
    X_ref[:, 0:_SB, 0:_SB] = linvd_ref[:, 0]
    for ib in range(1, NB):
        o = ib * _SB
        Lrow = L_ref[:, o:o + _SB, 0:o]                    # (BT, 128, o)
        Xprev = X_ref[:, 0:o, 0:o]                         # (BT, o, o)
        S = _bdot_f32x3(Lrow, Xprev)                       # (BT, 128, o)
        X_ref[:, o:o + _SB, 0:o] = -_bdot_f32x3(linvd_ref[:, ib], S)
        X_ref[:, o:o + _SB, o:o + _SB] = linvd_ref[:, ib]


def _tri_inv_batched(L, linvd):
    B, n, _ = L.shape
    BT = _tile_for(n, B)
    Bp = -(-B // BT) * BT
    NB = n // _SB
    if Bp != B:
        pad = Bp - B
        L = jnp.concatenate(
            [L, jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), (pad, n, n))]
        )
        linvd = jnp.concatenate(
            [
                linvd,
                jnp.broadcast_to(
                    jnp.eye(_SB, dtype=linvd.dtype),
                    (pad, NB, _SB, _SB),
                ),
            ]
        )
    kernel = functools.partial(_tri_inv_kernel, n)
    params = {}
    if _HAS_PLTPU and not _use_interpret():
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()
        )
    X = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, NB, _SB, _SB), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
        interpret=_use_interpret(),
        **params,
    )(L.astype(jnp.float32), linvd.astype(jnp.float32))
    return X[:B]


def _collapsing(batched_impl):
    """Wrap a (B, ...) implementation so ANY stack of vmaps collapses into
    the kernel batch axis (instead of lifting pallas grids per axis, which
    would serialize one matrix per grid step). The rule calls the wrapped
    function again, so nested vmaps collapse recursively."""

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


_chol_solve_vm = _collapsing(_chol_solve_batched)
_tri_inv_vm = _collapsing(_tri_inv_batched)


def chol_solve(Kj: jnp.ndarray, noise_scaled: jnp.ndarray, y: jnp.ndarray):
    """Batched-collapsing fused factorization chain:
    L = chol(Kj + diag(noise_scaled)), alpha = (..)^{-1} y, plus the
    diagonal-superblock inverses `linvd` for the backward pass.

    Call with (B, n, n)/(B, n)/(B, n) or under any vmap stack;
    single-sample (n, n)/(n,)/(n,) also works.
    """
    if Kj.ndim == 2:
        L, a, d = _chol_solve_vm(
            Kj[None], noise_scaled[None], y[None]
        )
        return L[0], a[0], d[0]
    return _chol_solve_vm(Kj, noise_scaled, y)


def tri_inv(L: jnp.ndarray, linvd: jnp.ndarray) -> jnp.ndarray:
    """Batched-collapsing lower-triangular inverse (consumes chol_solve's
    linvd; pure MXU substitution)."""
    if L.ndim == 2:
        return _tri_inv_vm(L[None], linvd[None])[0]
    return _tri_inv_vm(L, linvd)


def _qmat_kernel(n, L_ref, linvd_ref, a_ref, c_ref, out_ref, X_ref):
    """out = c * (L^{-T} L^{-1} - alpha alpha^T): the reference's Q-matrix
    (c_inference_exact.cpp:168-172) in one kernel — Linv by row-block
    substitution into VMEM scratch (never touching HBM), then a single
    3-pass syrk + rank-1 correction (the XLA einsum for the same syrk
    measured 2.9-3.2 ms at every precision; here it is ~one MXU pass)."""
    BT = L_ref.shape[0]
    NB = n // _SB
    f32 = jnp.float32

    X_ref[:, :, :] = jnp.zeros((BT, n, n), f32)
    X_ref[:, 0:_SB, 0:_SB] = linvd_ref[:, 0]
    for ib in range(1, NB):
        o = ib * _SB
        Lrow = L_ref[:, o:o + _SB, 0:o]
        Xprev = X_ref[:, 0:o, 0:o]
        S = _bdot_f32x3(Lrow, Xprev)
        X_ref[:, o:o + _SB, 0:o] = -_bdot_f32x3(linvd_ref[:, ib], S)
        X_ref[:, o:o + _SB, o:o + _SB] = linvd_ref[:, ib]

    # Kinv = X^T X (contract the row dim of both operands)
    X = X_ref[:, :, :]
    Xh = X.astype(jnp.bfloat16).astype(f32)
    Xl = X - Xh
    dn = (((1,), (1,)), ((0,), (0,)))
    d = jax.lax.Precision.DEFAULT
    kwargs = dict(preferred_element_type=f32, precision=d)
    kinv = (
        jax.lax.dot_general(Xh, Xh, dn, **kwargs)
        + jax.lax.dot_general(Xh, Xl, dn, **kwargs)
        + jax.lax.dot_general(Xl, Xh, dn, **kwargs)
    )
    a = a_ref[:, 0, :]                                     # (BT, n)
    c = c_ref[:, 0, :]                                     # (BT, 1)
    out_ref[:, :, :] = c[:, :, None] * (
        kinv - a[:, :, None] * a[:, None, :]
    )


def _qmat_batched(L, linvd, alpha, coef):
    B, n, _ = L.shape
    BT = max(1, _tile_for(n, B) // 2)  # X scratch adds a third (BT,n,n)
    Bp = -(-B // BT) * BT
    NB = n // _SB
    if Bp != B:
        pad = Bp - B
        L = jnp.concatenate(
            [L, jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), (pad, n, n))]
        )
        linvd = jnp.concatenate(
            [
                linvd,
                jnp.broadcast_to(
                    jnp.eye(_SB, dtype=linvd.dtype), (pad, NB, _SB, _SB)
                ),
            ]
        )
        alpha = jnp.concatenate([alpha, jnp.zeros((pad, n), alpha.dtype)])
        coef = jnp.concatenate([coef, jnp.zeros((pad, 1), coef.dtype)])
    kernel = functools.partial(_qmat_kernel, n)
    params = {}
    if _HAS_PLTPU and not _use_interpret():
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit()
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, NB, _SB, _SB), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((BT, 1, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((BT, 1, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BT, n, n), lambda i: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((BT, n, n), jnp.float32)],
        interpret=_use_interpret(),
        **params,
    )(
        L.astype(jnp.float32),
        linvd.astype(jnp.float32),
        alpha.astype(jnp.float32)[:, None, :],
        coef.astype(jnp.float32)[:, None, :],
    )
    return out[:B]


_qmat_vm = _collapsing(_qmat_batched)


def qmat(L, linvd, alpha, coef):
    """Batched-collapsing Q-matrix: coef * (K^{-1} - alpha alpha^T), with
    K^{-1} = L^{-T}L^{-1} built from chol_solve's residuals. Pass alpha=0,
    coef=1 to get the bare inverse."""
    if L.ndim == 2:
        return _qmat_vm(
            L[None], linvd[None], alpha[None], coef[None]
        )[0]
    return _qmat_vm(L, linvd, alpha, coef)
