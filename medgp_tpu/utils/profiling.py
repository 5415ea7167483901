"""Profiling and timing: device-accurate timers, trace capture, cost model.

Replaces the reference's ad-hoc wall-clock `time_t` pairs around expensive
blocks (main_one_train.cpp:227-256 etc.) with:
  * `device_timer` — block_until_ready-synchronized timing of jitted calls;
  * `trace` — a context manager around `jax.profiler` emitting TensorBoard-
    loadable traces;
  * `predict_train_cost` — the analytic cost model used for bucketing and
    shard balancing, the in-framework version of the reference's
    "profile obs count -> pick Slurm tier" flow (profile.py +
    run_exp_generator.py:213-263).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def device_timer(fn: Callable, *args, warmup: int = 1, iters: int = 10):
    """(seconds_per_call, last_output); synchronizes on device completion."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def predict_train_cost(
    n_obs: int, n_restarts: int, n_evals: int, q: int = 5, h: int = 1114
) -> float:
    """Relative cost of training one patient: restarts * (gram + chol) +
    gradient evals * (gram + chol + backward). The backward pass costs a
    small multiple of the forward (reverse-mode), NOT h forward traces —
    that factor-h saving is the core win over the reference's per-hyper
    gradient maps."""
    n = float(max(n_obs, 1))
    fwd = q * n * n + n**3 / 3.0
    return n_restarts * fwd + n_evals * 4.0 * fwd
