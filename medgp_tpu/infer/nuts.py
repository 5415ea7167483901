"""No-U-Turn Sampler with fixed-shape iterative tree building.

The reference is MAP-only; :mod:`medgp_tpu.infer.hmc` adds jittered-trajectory
HMC. This module adds full NUTS — the self-tuning trajectory-length sampler —
in the TPU-friendly *iterative* formulation (Phan & Pradhan's numpyro scheme;
Hoffman & Gelman 2014 Algorithm 6 semantics with multinomial leaf sampling):

  * the recursive tree is replaced by a doubling `lax.while_loop` whose inner
    subtree builder is a second `lax.while_loop` over at most 2^depth leaves —
    every array in the carry has a static shape;
  * sub-subtree U-turn checks use an O(max_depth) checkpoint stack of momenta
    and cumulative momentum sums. A leaf with in-subtree index n stores a
    checkpoint at stack slot popcount(n) when n is even; when n is odd it
    checks the spans [n - 2^k + 1, n] for k = 1..trailing_ones(n) against the
    top trailing_ones(n) live checkpoints — exactly the set of binary subtrees
    that leaf n completes;
  * multinomial progressive sampling: each leaf is proposed with probability
    exp(-dH - logsumexp) within its subtree, and a finished subtree's proposal
    replaces the tree proposal with probability min(1, w_subtree / w_tree)
    (biased progressive sampling, Betancourt 2017);
  * divergences (energy error > threshold) discard the offending subtree and
    stop doubling, never crash the batch;
  * warmup = dual-averaging step size + diagonal mass estimation, shared with
    :func:`medgp_tpu.infer.hmc.hmc_sample`;
  * clamped hypers (prior type 0, c_prior.h:50-53 semantics) carry zero
    momentum and zero drift, so sparsity-clamped A-elements stay exactly
    fixed while sampling (same contract as the HMC path).

Everything vmaps over chains x patients.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from medgp_tpu.infer.hmc import make_potential, two_phase_warmup


class NUTSResult(NamedTuple):
    samples: jnp.ndarray       # (S, H) posterior draws
    potential: jnp.ndarray     # (S,) U(theta) at each draw
    accept_prob: jnp.ndarray   # (S,) mean leaf acceptance statistic per draw
    accept_rate: jnp.ndarray   # () mean over sampling phase
    step_size: jnp.ndarray     # () adapted step size
    inv_mass: jnp.ndarray      # (H,) adapted diagonal inverse mass
    divergences: jnp.ndarray   # () int32 count during sampling
    tree_depth: jnp.ndarray    # (S,) int32 depth reached per draw
    n_leapfrog: jnp.ndarray    # (S,) int32 gradient evals per draw


# -------------------------------------------------------------------------
# bit helpers (static bit width = max tree depth; all shapes fixed)
# -------------------------------------------------------------------------

def popcount(n: jnp.ndarray, nbits: int) -> jnp.ndarray:
    bits = (n[..., None] >> jnp.arange(nbits, dtype=n.dtype)) & 1
    return jnp.sum(bits, axis=-1)


def trailing_ones(n: jnp.ndarray, nbits: int) -> jnp.ndarray:
    bits = (n[..., None] >> jnp.arange(nbits, dtype=n.dtype)) & 1
    return jnp.sum(jnp.cumprod(bits, axis=-1), axis=-1)


def is_turning(r_left, r_right, rho, inv_mass) -> jnp.ndarray:
    """Generalized U-turn criterion (Betancourt): trajectory momentum sum
    `rho` makes negative progress along either endpoint velocity."""
    v_left = inv_mass * r_left
    v_right = inv_mass * r_right
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def ckpt_update_and_check(
    n: jnp.ndarray,
    r: jnp.ndarray,
    rho_sub: jnp.ndarray,
    r_ckpts: jnp.ndarray,
    rho_ckpts: jnp.ndarray,
    inv_mass: jnp.ndarray,
    max_depth: int,
):
    """One leaf's checkpoint bookkeeping inside a subtree.

    `rho_sub` is the cumulative momentum sum *inclusive of leaf n*. Returns
    (r_ckpts, rho_ckpts, turning): even leaves store, odd leaves check every
    binary subtree they complete. Pure so it can be unit-tested against a
    brute-force reference over all spans.
    """
    pc = popcount(n, max_depth)
    even = (n & 1) == 0
    slot = jnp.minimum(pc, max_depth - 1)
    r_ckpts = jnp.where(even, r_ckpts.at[slot].set(r), r_ckpts)
    rho_ckpts = jnp.where(even, rho_ckpts.at[slot].set(rho_sub), rho_ckpts)

    t_ones = trailing_ones(n, max_depth)

    def check(k, turning):
        idx = jnp.maximum(pc - k, 0)
        active = (~even) & (k <= t_ones)
        rho_span = rho_sub - rho_ckpts[idx] + r_ckpts[idx]
        turn_k = is_turning(r_ckpts[idx], r, rho_span, inv_mass)
        return turning | (active & turn_k)

    turning = lax.fori_loop(1, max_depth + 1, check, jnp.asarray(False))
    return r_ckpts, rho_ckpts, turning


# -------------------------------------------------------------------------
# the transition kernel
# -------------------------------------------------------------------------

class _Subtree(NamedTuple):
    theta: jnp.ndarray      # far endpoint position
    r: jnp.ndarray          # far endpoint momentum
    g: jnp.ndarray          # far endpoint gradient
    z_prop: jnp.ndarray     # multinomial proposal within the subtree
    u_prop: jnp.ndarray     # potential at the proposal
    g_prop: jnp.ndarray     # gradient at the proposal
    log_w: jnp.ndarray      # logsumexp of -dH over leaves
    rho: jnp.ndarray        # momentum sum over leaves
    turning: jnp.ndarray
    diverging: jnp.ndarray
    acc_sum: jnp.ndarray    # sum of min(1, exp(-dH))
    n_leaf: jnp.ndarray     # leaves actually evaluated


def _nuts_transition(
    potential_grad: Callable,
    theta0: jnp.ndarray,
    u0: jnp.ndarray,
    g0: jnp.ndarray,
    key: jax.Array,
    eps: jnp.ndarray,
    inv_mass: jnp.ndarray,
    gmask: jnp.ndarray,
    max_depth: int,
    divergence_threshold: float,
    depth_cap: Optional[jnp.ndarray] = None,
):
    """One NUTS draw. Returns (theta', u', g', accept_stat, divergent,
    depth, n_leapfrog).

    `depth_cap` is an optional DYNAMIC doubling bound <= the static
    `max_depth` (which fixes every array shape). Under vmap the while
    loops run in lockstep across the whole batch — one member building a
    2^max_depth-leaf trajectory makes everyone pay for it — so capping
    at the depth the warmup actually used converts tail trajectories
    from a batch-wide tax into a truncation of rare outliers (truncated
    NUTS remains a valid transition)."""
    dtype = theta0.dtype
    H = theta0.shape[-1]
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def kinetic(r):
        return 0.5 * jnp.sum(inv_mass * r * r)

    def leapfrog(theta, r, g, eps_signed):
        r_half = r - 0.5 * eps_signed * g
        theta1 = theta + eps_signed * inv_mass * r_half * gmask
        u1, g1 = potential_grad(theta1)
        g1 = g1 * gmask
        r1 = r_half - 0.5 * eps_signed * g1
        return theta1, r1, g1, u1

    k_mom, k_tree = jax.random.split(key)
    r0 = jax.random.normal(k_mom, (H,), dtype) / jnp.sqrt(inv_mass)
    r0 = r0 * gmask
    h0 = u0 + kinetic(r0)

    def build_subtree(start, eps_signed, n_leaves, key):
        """Iteratively integrate `n_leaves` leapfrog leaves from `start`."""
        theta_s, r_s, g_s = start

        def cond(st):
            sub, _, n = st
            return (n < n_leaves) & ~sub.turning & ~sub.diverging

        def body(st):
            sub, ckpts, n = st
            r_ck, rho_ck, key = ckpts
            key, k_u = jax.random.split(key)
            theta1, r1, g1, u1 = leapfrog(sub.theta, sub.r, sub.g, eps_signed)
            dh = (u1 + kinetic(r1)) - h0
            dh = jnp.where(jnp.isfinite(dh), dh, jnp.inf)
            diverging = dh > divergence_threshold
            log_w_leaf = -dh
            log_w_new = jnp.logaddexp(sub.log_w, log_w_leaf)
            take = (
                jnp.log(jax.random.uniform(k_u, (), dtype))
                < log_w_leaf - log_w_new
            )
            z_prop = jnp.where(take & ~diverging, theta1, sub.z_prop)
            u_prop = jnp.where(take & ~diverging, u1, sub.u_prop)
            g_prop = jnp.where(take & ~diverging, g1, sub.g_prop)
            rho_new = sub.rho + r1
            r_ck, rho_ck, turning = ckpt_update_and_check(
                n, r1, rho_new, r_ck, rho_ck, inv_mass, max_depth
            )
            acc = sub.acc_sum + jnp.minimum(1.0, jnp.exp(-dh))
            new = _Subtree(
                theta=theta1, r=r1, g=g1,
                z_prop=z_prop, u_prop=u_prop, g_prop=g_prop,
                log_w=log_w_new, rho=rho_new,
                turning=turning, diverging=diverging,
                acc_sum=acc, n_leaf=sub.n_leaf + 1,
            )
            return new, (r_ck, rho_ck, key), n + 1

        init = _Subtree(
            theta=theta_s, r=r_s, g=g_s,
            z_prop=theta_s, u_prop=jnp.asarray(jnp.inf, dtype),
            g_prop=g_s,
            log_w=neg_inf, rho=jnp.zeros(H, dtype),
            turning=jnp.asarray(False), diverging=jnp.asarray(False),
            acc_sum=jnp.asarray(0.0, dtype),
            n_leaf=jnp.asarray(0, jnp.int32),
        )
        ckpts0 = (
            jnp.zeros((max_depth, H), dtype),
            jnp.zeros((max_depth, H), dtype),
            key,
        )
        sub, _, _ = lax.while_loop(
            cond, body, (init, ckpts0, jnp.asarray(0, jnp.int32))
        )
        return sub

    class _Tree(NamedTuple):
        z_minus: jnp.ndarray
        r_minus: jnp.ndarray
        g_minus: jnp.ndarray
        z_plus: jnp.ndarray
        r_plus: jnp.ndarray
        g_plus: jnp.ndarray
        z_prop: jnp.ndarray
        u_prop: jnp.ndarray
        g_prop: jnp.ndarray
        log_w: jnp.ndarray
        rho: jnp.ndarray
        depth: jnp.ndarray
        turning: jnp.ndarray
        diverging: jnp.ndarray
        acc_sum: jnp.ndarray
        n_leaf: jnp.ndarray
        key: jax.Array

    cap = (
        jnp.asarray(max_depth, jnp.int32)
        if depth_cap is None
        else jnp.minimum(depth_cap.astype(jnp.int32), max_depth)
    )

    def tree_cond(tr: _Tree):
        return (tr.depth < cap) & ~tr.turning & ~tr.diverging

    def tree_body(tr: _Tree):
        key, k_dir, k_sub, k_acc = jax.random.split(tr.key, 4)
        going_right = jax.random.bernoulli(k_dir)
        eps_signed = jnp.where(going_right, eps, -eps).astype(dtype)
        start = (
            jnp.where(going_right, tr.z_plus, tr.z_minus),
            jnp.where(going_right, tr.r_plus, tr.r_minus),
            jnp.where(going_right, tr.g_plus, tr.g_minus),
        )
        n_leaves = (jnp.asarray(1, jnp.int32) << tr.depth)
        sub = build_subtree(start, eps_signed, n_leaves, k_sub)
        sub_ok = ~sub.turning & ~sub.diverging

        # biased progressive sampling across the doubling
        log_accept = jnp.minimum(0.0, sub.log_w - tr.log_w)
        take = sub_ok & (
            jnp.log(jax.random.uniform(k_acc, (), dtype)) < log_accept
        )
        z_prop = jnp.where(take, sub.z_prop, tr.z_prop)
        u_prop = jnp.where(take, sub.u_prop, tr.u_prop)
        g_prop = jnp.where(take, sub.g_prop, tr.g_prop)

        z_minus = jnp.where(going_right, tr.z_minus, sub.theta)
        r_minus = jnp.where(going_right, tr.r_minus, sub.r)
        g_minus = jnp.where(going_right, tr.g_minus, sub.g)
        z_plus = jnp.where(going_right, sub.theta, tr.z_plus)
        r_plus = jnp.where(going_right, sub.r, tr.r_plus)
        g_plus = jnp.where(going_right, sub.g, tr.g_plus)

        rho = tr.rho + sub.rho
        merged_turning = is_turning(r_minus, r_plus, rho, inv_mass)
        return _Tree(
            z_minus=z_minus, r_minus=r_minus, g_minus=g_minus,
            z_plus=z_plus, r_plus=r_plus, g_plus=g_plus,
            z_prop=z_prop, u_prop=u_prop, g_prop=g_prop,
            log_w=jnp.logaddexp(tr.log_w, sub.log_w),
            rho=rho,
            depth=tr.depth + 1,
            turning=sub.turning | (sub_ok & merged_turning),
            diverging=sub.diverging,
            acc_sum=tr.acc_sum + sub.acc_sum,
            n_leaf=tr.n_leaf + sub.n_leaf,
            key=key,
        )

    tree0 = _Tree(
        z_minus=theta0, r_minus=r0, g_minus=g0,
        z_plus=theta0, r_plus=r0, g_plus=g0,
        z_prop=theta0, u_prop=u0, g_prop=g0,
        log_w=jnp.asarray(0.0, dtype),
        rho=r0,
        depth=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        acc_sum=jnp.asarray(0.0, dtype),
        n_leaf=jnp.asarray(0, jnp.int32),
        key=k_tree,
    )
    tr = lax.while_loop(tree_cond, tree_body, tree0)

    accept_stat = tr.acc_sum / jnp.maximum(
        tr.n_leaf.astype(dtype), 1.0
    )
    return (
        tr.z_prop,
        tr.u_prop,
        tr.g_prop,
        accept_stat,
        tr.diverging,
        tr.depth,
        tr.n_leaf,
    )


# -------------------------------------------------------------------------
# warmup + sampling driver (mirrors hmc_sample)
# -------------------------------------------------------------------------

def nuts_sample(
    potential_grad: Callable,
    theta0: jnp.ndarray,
    key: jax.Array,
    num_warmup: int = 200,
    num_samples: int = 200,
    max_depth: int = 6,
    init_step_size: float = 0.01,
    target_accept: float = 0.8,
    divergence_threshold: float = 1000.0,
    grad_mask: Optional[jnp.ndarray] = None,
    adapt_depth: bool = True,
    depth_quantile: float = 0.9,
    warmup_max_depth: Optional[int] = 4,
) -> NUTSResult:
    """Sample exp(-U) with NUTS given `potential_grad(theta) -> (U, dU)`.

    All shapes static; vmaps over chains/patients. `max_depth` bounds a draw
    at 2^max_depth - 1 gradient evaluations (the while loops exit early on
    U-turn/divergence, so typical draws are much cheaper).

    `adapt_depth` (round-5): the warmup records the tree-depth histogram
    and the sampling phase doubles only to the warmup's `depth_quantile`
    depth + 1 (clipped to max_depth). Gradient evals per draw are the
    NUTS cost driver, and under vmap every batch member pays the
    batch-max trajectory each draw; bounding at the observed typical
    depth removes the tail's lockstep tax with negligible bias
    (max-depth-truncated NUTS is a standard, valid transition).

    `warmup_max_depth` (round-5): depth cap applied DURING warmup (None =
    uncapped). Warmup dominates short sampler budgets, and its early
    draws — while dual averaging is still hunting for the step size —
    build the deepest trees of the whole run (tiny eps => no U-turn for
    2^max_depth leaves, paid in vmap lockstep by the entire batch). A
    depth-4 cap (15 leaves ~= one HMC trajectory) keeps the acceptance
    statistic the adaptation consumes while bounding its cost; the
    sampling phase still doubles to the adaptive cap above.
    """
    dtype = theta0.dtype
    H = theta0.shape[-1]
    gmask = (
        jnp.ones(H, dtype) if grad_mask is None else grad_mask.astype(dtype)
    )

    u0, g0 = potential_grad(theta0)
    g0 = g0 * gmask

    def kernel(state, key, eps, inv_mass, depth_cap=None):
        theta, u, g = state
        th, u1, g1, acc, div, depth, n_lf = _nuts_transition(
            potential_grad, theta, u, g, key, eps, inv_mass, gmask,
            max_depth, divergence_threshold, depth_cap=depth_cap,
        )
        return (th, u1, g1), acc, div, depth, n_lf

    wcap = (
        None
        if warmup_max_depth is None
        else jnp.asarray(min(warmup_max_depth, max_depth), jnp.int32)
    )

    def warm_kernel(wstate, key, eps, inv_mass):
        state, hist = wstate
        state, acc, _, depth, _ = kernel(
            state, key, eps, inv_mass, depth_cap=wcap
        )
        hist = hist.at[jnp.clip(depth, 0, max_depth)].add(1)
        return (state, hist), acc

    keys = jax.random.split(key, num_samples + 1)
    hist0 = jnp.zeros(max_depth + 1, jnp.int32)
    (warm_state, hist), eps, inv_mass = two_phase_warmup(
        warm_kernel, ((theta0, u0, g0), hist0), lambda s: s[0][0], keys[-1],
        num_warmup, init_step_size, target_accept, gmask, dtype,
    )

    if adapt_depth and num_warmup > 0:
        cum = jnp.cumsum(hist).astype(jnp.float32)
        total = jnp.maximum(cum[-1], 1.0)
        q_depth = jnp.argmax(cum >= depth_quantile * total)
        depth_cap = jnp.clip(q_depth + 1, 1, max_depth).astype(jnp.int32)
    else:
        depth_cap = jnp.asarray(max_depth, jnp.int32)

    def sample_step(carry, key):
        state, acc, div, depth, n_lf = kernel(
            carry, key, eps, inv_mass, depth_cap=depth_cap
        )
        return state, (state[0], state[1], acc, div, depth, n_lf)

    _, (samples, pots, aps, divs, depths, n_lfs) = lax.scan(
        sample_step, warm_state, keys[:num_samples]
    )
    return NUTSResult(
        samples=samples,
        potential=pots,
        accept_prob=aps,
        accept_rate=jnp.mean(aps),
        step_size=eps,
        inv_mass=inv_mass,
        divergences=jnp.sum(divs.astype(jnp.int32)),
        tree_depth=depths.astype(jnp.int32),
        n_leapfrog=n_lfs.astype(jnp.int32),
    )


def nuts_patient(
    spec,
    data,
    theta0: jnp.ndarray,
    key: jax.Array,
    prior=None,
    num_chains: int = 4,
    **nuts_kwargs,
) -> NUTSResult:
    """Multi-chain NUTS for one patient (chains vmapped); theta0 may be (H,)
    (replicated with jittered starts) or (num_chains, H). Same contract as
    :func:`medgp_tpu.infer.hmc.hmc_patient`."""
    pg = make_potential(spec, data, prior)
    gmask = None if prior is None else prior.grad_mask()
    if theta0.ndim == 1:
        k0, key = jax.random.split(key)
        jitter = 0.01 * jax.random.normal(
            k0, (num_chains, theta0.shape[-1]), theta0.dtype
        )
        if gmask is not None:
            jitter = jitter * gmask
        theta0 = theta0[None, :] + jitter
    keys = jax.random.split(key, theta0.shape[0])
    return jax.vmap(
        lambda th, kk: nuts_sample(pg, th, kk, grad_mask=gmask, **nuts_kwargs)
    )(theta0, keys)
