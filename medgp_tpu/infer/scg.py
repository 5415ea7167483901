"""Scaled conjugate gradients with Wolfe-Powell line search, in pure JAX.

A functional re-expression of the reference SCG optimizer
(medgpc/src/util/c_optimizer_scg.cpp:25-284, itself a faithful port of
Rasmussen's minimize.m): cubic extrapolation, cubic/quadratic interpolation,
Polak-Ribiere direction updates, slope-ratio step-length guessing, restart to
steepest descent on line-search failure.

Differences from the reference, by design:
  * Only the function-evaluation-budget mode is implemented (the reference's
    `max_iteration < 0` path). Its `max_iteration > 0` "count line searches"
    mode never increments the counter in the C++ (signbit gates every
    increment, c_optimizer_scg.cpp:73,88,114,234) and is never exercised by
    the drivers, which always negate the budget (main_one_train.cpp:273,284).
  * Control flow is `lax.while_loop`-based, so a single compiled program
    minimizes an entire (patients x restarts) batch under `vmap` — the TPU
    replacement for one process per patient.
  * A failed objective (Cholesky failure, non-finite value or gradient)
    reports f = +inf, which triggers the same step-halving the reference
    applies (c_optimizer_scg.cpp:125-128).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Line-search constants (c_optimizer_scg.cpp:37-42).
_INT = 0.1   # don't reevaluate within this fraction of the current bracket
_EXT = 3.0   # maximum extrapolation factor
_MAX = 20    # max function evaluations per line search
_RATIO = 10.0  # maximum allowed slope ratio
_SIG = 0.1
_RHO = _SIG / 2.0
_EPS = 2.0 ** -52


class SCGResult(NamedTuple):
    x: jnp.ndarray        # (H,) optimized parameters
    fx: jnp.ndarray       # () final objective value
    n_evals: jnp.ndarray  # () int32 objective evaluations consumed
    ok: jnp.ndarray       # () bool: at least the initial evaluation succeeded


def _dot(a, b):
    return jnp.dot(a, b)


def _masked_while(cond, body, init):
    """`lax.while_loop` whose body freezes once the element's own predicate
    is false.

    JAX batches a while_loop with a batched predicate by running the body for
    *every* element until the predicate is false for *all* of them — without
    masking the carry. A finished element would therefore keep evolving
    (e.g. its line-search budget M decrementing past 0), which both corrupts
    per-element semantics and can resurrect its predicate, livelocking the
    batch. Re-applying the element's own predicate as a select makes the body
    idempotent after termination, so `vmap(scg_minimize)` is exact and always
    terminates.
    """

    def body2(st):
        new = body(st)
        pred = cond(st)
        return jax.tree.map(lambda a, b: jnp.where(pred, a, b), new, st)

    return lax.while_loop(cond, body2, init)


class _Outer(NamedTuple):
    i: jnp.ndarray
    X: jnp.ndarray
    fX: jnp.ndarray
    df0: jnp.ndarray
    s: jnp.ndarray
    d0: jnp.ndarray
    x3: jnp.ndarray
    obj_flag: jnp.ndarray
    ls_failed: jnp.ndarray


def scg_minimize(
    f: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    x0: jnp.ndarray,
    max_evals: int,
) -> SCGResult:
    """Minimize `f` from `x0` within a budget of `max_evals` evaluations.

    `f(x) -> (value, grad, ok)` must be pure; `ok=False` or a non-finite
    value marks a failed evaluation. `max_evals` is static (compiled in).
    """
    dtype = x0.dtype
    max_evals_a = jnp.asarray(max_evals, jnp.int32)

    def evaluate(x):
        v, g, ok = f(x)
        bad = ~ok | ~jnp.isfinite(v)
        v = jnp.where(bad, jnp.asarray(jnp.inf, dtype), v)
        return v, g, ~bad

    f0, df0, ok0 = evaluate(x0)
    i0 = jnp.asarray(1, jnp.int32)  # the initial evaluation counts

    s = -df0
    d0 = -_dot(s, s)
    x3 = 1.0 / (1.0 - d0)

    def outer_cond(st: _Outer):
        return st.i < max_evals_a

    def outer_body(st: _Outer):
        i = st.i + 1  # outer-iteration tick (c_optimizer_scg.cpp:88)
        X, fX, df0, s, d0, x3 = st.X, st.fX, st.df0, st.s, st.d0, st.x3
        X0, F0, dF0 = X, fX, df0
        M = jnp.minimum(jnp.asarray(_MAX, jnp.int32), max_evals_a - i)

        # ---- extrapolation: bracket a minimum along s ----
        class _Ex(NamedTuple):
            x1: jnp.ndarray; f1: jnp.ndarray; d1: jnp.ndarray
            x2: jnp.ndarray; f2: jnp.ndarray; d2: jnp.ndarray
            x3: jnp.ndarray; f3: jnp.ndarray; d3: jnp.ndarray
            df3: jnp.ndarray
            M: jnp.ndarray; i: jnp.ndarray
            X0: jnp.ndarray; F0: jnp.ndarray; dF0: jnp.ndarray
            obj_flag: jnp.ndarray
            done: jnp.ndarray

        z = jnp.asarray(0.0, dtype)
        ex0 = _Ex(
            x1=z, f1=fX, d1=d0,
            x2=z, f2=fX, d2=d0,
            x3=x3, f3=fX, d3=d0,
            df3=df0, M=M, i=i,
            X0=X0, F0=F0, dF0=dF0,
            obj_flag=st.obj_flag, done=jnp.asarray(False),
        )

        def ex_cond(ex: _Ex):
            return ~ex.done

        def ex_body(ex: _Ex):
            # inner "keep halving until the objective evaluates" loop
            class _Ev(NamedTuple):
                x3: jnp.ndarray; f3: jnp.ndarray; df3: jnp.ndarray
                M: jnp.ndarray; i: jnp.ndarray
                obj_flag: jnp.ndarray; success: jnp.ndarray

            def ev_cond(ev: _Ev):
                return (~ev.success) & (ev.M > 0)

            def ev_body(ev: _Ev):
                M = ev.M - 1
                i = ev.i + 1
                f3, df3, okk = evaluate(X + ev.x3 * s)
                okk = okk & jnp.all(jnp.isfinite(df3))
                x3n = jnp.where(okk, ev.x3, (ex.x2 + ev.x3) / 2.0)
                return _Ev(
                    x3=x3n, f3=f3, df3=df3, M=M, i=i,
                    obj_flag=okk, success=okk,
                )

            ev = _masked_while(
                ev_cond,
                ev_body,
                _Ev(
                    x3=ex.x3, f3=ex.f3, df3=ex.df3, M=ex.M, i=ex.i,
                    obj_flag=ex.obj_flag, success=jnp.asarray(False),
                ),
            )
            x3, f3, df3, M, i, obj_flag = ev.x3, ev.f3, ev.df3, ev.M, ev.i, ev.obj_flag

            better = f3 < ex.F0
            X0 = jnp.where(better, X + x3 * s, ex.X0)
            F0 = jnp.where(better, f3, ex.F0)
            dF0 = jnp.where(better, df3, ex.dF0)
            d3 = _dot(df3, s)

            done = (d3 > _SIG * d0) | (f3 > fX + x3 * _RHO * d0) | (M <= 0)

            # cubic extrapolation for the next trial point
            x1, f1, d1 = ex.x2, ex.f2, ex.d2
            x2, f2, d2 = x3, f3, d3
            A = 6.0 * (f1 - f2) + 3.0 * (d2 + d1) * (x2 - x1)
            B = 3.0 * (f2 - f1) - (2.0 * d1 + d2) * (x2 - x1)
            temp = B * B - A * d1 * (x2 - x1)
            sq = jnp.sqrt(jnp.maximum(temp, 0.0))
            x3_cand = x1 - d1 * (x2 - x1) ** 2 / (B + sq)
            bad = (
                (temp < 0)
                | jnp.isnan(x3_cand)
                | jnp.isinf(x3_cand)
                | (x3_cand < 0)
            )
            x3n = jnp.where(bad, x2 * _EXT, x3_cand)
            x3n = jnp.minimum(x3n, x2 * _EXT)
            x3n = jnp.maximum(x3n, x2 + _INT * (x2 - x1))

            return _Ex(
                x1=jnp.where(done, ex.x1, x1),
                f1=jnp.where(done, ex.f1, f1),
                d1=jnp.where(done, ex.d1, d1),
                x2=jnp.where(done, ex.x2, x2),
                f2=jnp.where(done, ex.f2, f2),
                d2=jnp.where(done, ex.d2, d2),
                x3=jnp.where(done, x3, x3n),
                f3=f3, d3=d3, df3=df3, M=M, i=i,
                X0=X0, F0=F0, dF0=dF0, obj_flag=obj_flag, done=done,
            )

        # d3 must survive the loop; _Ex carries it from iteration to iteration
        ex0 = ex0._replace(d3=d0)
        ex = _masked_while(ex_cond, ex_body, ex0)

        # ---- interpolation: refine inside the bracket ----
        class _In(NamedTuple):
            x2: jnp.ndarray; f2: jnp.ndarray; d2: jnp.ndarray
            x3: jnp.ndarray; f3: jnp.ndarray; d3: jnp.ndarray
            x4: jnp.ndarray; f4: jnp.ndarray; d4: jnp.ndarray
            df3: jnp.ndarray
            M: jnp.ndarray; i: jnp.ndarray
            X0: jnp.ndarray; F0: jnp.ndarray; dF0: jnp.ndarray
            obj_flag: jnp.ndarray

        in0 = _In(
            x2=ex.x2, f2=ex.f2, d2=ex.d2,
            x3=ex.x3, f3=ex.f3, d3=ex.d3,
            x4=ex.x3, f4=ex.f3, d4=ex.d3,
            df3=ex.df3, M=ex.M, i=ex.i,
            X0=ex.X0, F0=ex.F0, dF0=ex.dF0, obj_flag=ex.obj_flag,
        )

        def in_cond(ins: _In):
            not_conv = (jnp.abs(ins.d3) > -_SIG * d0) | (
                ins.f3 > fX + ins.x3 * _RHO * d0
            )
            return not_conv & (ins.M > 0)

        def in_body(ins: _In):
            upper = (ins.d3 > 0) | (ins.f3 > fX + ins.x3 * _RHO * d0)
            x4 = jnp.where(upper, ins.x3, ins.x4)
            f4 = jnp.where(upper, ins.f3, ins.f4)
            d4 = jnp.where(upper, ins.d3, ins.d4)
            x2 = jnp.where(upper, ins.x2, ins.x3)
            f2 = jnp.where(upper, ins.f2, ins.f3)
            d2 = jnp.where(upper, ins.d2, ins.d3)

            # quadratic (f4 > fX) or cubic interpolation
            denom_q = f4 - f2 - d2 * (x4 - x2)
            x3_quad = x2 - (0.5 * d2 * (x4 - x2) ** 2) / denom_q
            A = 6.0 * (f2 - f4) / (x4 - x2) + 3.0 * (d4 + d2)
            B = 3.0 * (f4 - f2) - (2.0 * d2 + d4) * (x4 - x2)
            disc = B * B - A * d2 * (x4 - x2) ** 2
            x3_cub = x2 + (jnp.sqrt(jnp.maximum(disc, 0.0)) - B) / A
            x3_cub = jnp.where(disc < 0, (x2 + x4) / 2.0, x3_cub)

            x3n = jnp.where(f4 > fX, x3_quad, x3_cub)
            x3n = jnp.where(
                jnp.isnan(x3n) | jnp.isinf(x3n), (x2 + x4) / 2.0, x3n
            )
            x3n = jnp.maximum(
                jnp.minimum(x3n, x4 - _INT * (x4 - x2)),
                x2 + _INT * (x4 - x2),
            )

            f3, df3, okk = evaluate(X + x3n * s)
            okk = okk & jnp.all(jnp.isfinite(df3))
            better = okk & (f3 < ins.F0)
            X0 = jnp.where(better, X + x3n * s, ins.X0)
            F0 = jnp.where(better, f3, ins.F0)
            dF0 = jnp.where(better, df3, ins.dF0)
            d3 = _dot(df3, s)

            return _In(
                x2=x2, f2=f2, d2=d2,
                x3=x3n, f3=f3, d3=d3,
                x4=x4, f4=f4, d4=d4,
                df3=df3, M=ins.M - 1, i=ins.i + 1,
                X0=X0, F0=F0, dF0=dF0, obj_flag=okk,
            )

        ins = _masked_while(in_cond, in_body, in0)

        # ---- accept / reject the line search ----
        accept = (
            ins.obj_flag
            & (jnp.abs(ins.d3) < -_SIG * d0)
            & (ins.f3 < fX + ins.x3 * _RHO * d0)
        )

        # accepted branch: Polak-Ribiere direction update
        X_a = X + ins.x3 * s
        fX_a = ins.f3
        df3 = ins.df3
        df3_df3 = _dot(df3, df3)
        df3_df0 = _dot(df3, df0)
        df0_df0 = _dot(df0, df0)
        s_a = ((df3_df3 - df3_df0) / df0_df0) * s - df3
        d0_a = _dot(df3, s_a)
        grad_asc = d0_a > 0
        s_a = jnp.where(grad_asc, -df3, s_a)
        d0_a = jnp.where(grad_asc, -_dot(s_a, s_a), d0_a)
        x3_a = ins.x3 * jnp.minimum(
            jnp.asarray(_RATIO, dtype), d0 / (d0_a - _EPS)
        )

        # rejected branch: restart from the best point, steepest descent
        s_r = -ins.dF0
        d0_r = -_dot(s_r, s_r)
        x3_r = 1.0 / (1.0 - d0_r)

        return _Outer(
            i=ins.i,
            X=jnp.where(accept, X_a, ins.X0),
            fX=jnp.where(accept, fX_a, ins.F0),
            df0=jnp.where(accept, df3, ins.dF0),
            s=jnp.where(accept, s_a, s_r),
            d0=jnp.where(accept, d0_a, d0_r),
            x3=jnp.where(accept, x3_a, x3_r),
            obj_flag=ins.obj_flag,
            ls_failed=~accept,
        )

    st0 = _Outer(
        i=i0, X=x0, fX=f0, df0=df0, s=s, d0=d0, x3=x3,
        obj_flag=ok0, ls_failed=jnp.asarray(False),
    )
    # If the very first evaluation failed, the reference still enters the
    # loop; f0 = inf makes any successful step an improvement.
    st = _masked_while(outer_cond, outer_body, st0)
    return SCGResult(x=st.X, fx=st.fX, n_evals=st.i, ok=ok0 | jnp.isfinite(st.fX))
