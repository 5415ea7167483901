"""Persistent-compilation-cache management for the product surface.

Cold XLA compiles of the canonical train/test programs cost 10s-300s+ on the
TPU pool (measured round 2); the reference has no analog because its C++
binaries are compiled once ahead of time. Enabling JAX's persistent
compilation cache makes every program shape a one-time cost per machine:
the second identical `medgp-tpu run` spends near-zero time compiling (the
per-bucket `*_compile` records in log/metrics.jsonl show the difference).

The runner bounds the number of distinct program shapes per run: train
programs are keyed by (n_max bucket, padded batch), test programs by
(test mode, n_max bucket, chunk), sampler programs by (sampler, n_max
bucket, padded batch) — with power-of-two length bucketing
(data/cohort.py:bucket_edges) the key space is logarithmic in the largest
patient.
"""

from __future__ import annotations

import os
import sys


def ensure_stable_hash_seed() -> None:
    """Re-exec the interpreter with PYTHONHASHSEED=0 if hashing is
    randomized. Hash randomization perturbs trace-time dict/set ordering,
    which perturbs the emitted HLO and therefore the persistent-cache key —
    measured on the TPU pool: a bit-identical second `medgp-tpu train`
    recompiled for 309s because its cache key differed (two `jit__argmax`
    entries, two hashes). Must run before jax is imported; no-op once the
    seed is pinned (the re-exec'd process sees PYTHONHASHSEED=0 and falls
    through)."""
    seed = os.environ.get("PYTHONHASHSEED", "")
    if seed.isdigit():
        # any pinned integer seed is already deterministic — re-execing
        # would gain nothing and needlessly restart the process
        return
    # NOTE: "jax already imported" is NOT a reason to skip — the container's
    # sitecustomize imports jax in every interpreter, and exec replaces the
    # process wholesale (nothing to lose at CLI entry). Callers must invoke
    # this before any real work only.
    env = dict(os.environ, PYTHONHASHSEED="0")
    argv = [sys.executable]
    spec = getattr(sys.modules.get("__main__"), "__spec__", None)
    if spec is not None and spec.name:  # invoked as `python -m pkg.mod`
        argv += ["-m", spec.name] + sys.argv[1:]
    elif sys.argv and sys.argv[0] in ("-c", "-"):
        # `python -c '...'` / stdin: sys.argv[0] is not a re-runnable path
        # (re-execing would run the first USER argument as code). The seed
        # cannot be pinned retroactively; warn and continue unpinned.
        print(
            "medgp-tpu: cannot pin PYTHONHASHSEED under `python -c`/stdin; "
            "persistent-compile-cache keys may vary across processes",
            file=sys.stderr,
        )
        return
    else:  # invoked as a script / console entry point
        argv += sys.argv
    os.execve(sys.executable, argv, env)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (idempotent, best-effort).

    Default location: $MEDGP_COMPILE_CACHE, else ~/.cache/medgp_tpu/jax_cache.
    Returns the cache dir, or None if the cache could not be enabled.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("MEDGP_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "medgp_tpu", "jax_cache"
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception as e:  # an optimization, never a failure
        print(f"medgp-tpu: compile cache unavailable: {e}", file=sys.stderr)
        return None
