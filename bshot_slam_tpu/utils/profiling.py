"""Timing + profiling helpers.

TicToc mirrors the reference's wall-clock stage timer (reference:
include/tic_toc.h:7-25, printed as "t1"/"t2" in lidar_odometry.cpp:128,167).
`device_timer` additionally forces a host fetch of the result so the timing
covers real device execution (the axon backend can return from
block_until_ready before remote compute settles — fetching a scalar is the
reliable fence).  `trace` wraps jax.profiler for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


class TicToc:
    """Wall-clock ms timer (reference: include/tic_toc.h)."""

    def __init__(self) -> None:
        self.tic()

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


def fence(tree) -> None:
    """Force completion of a pytree of jax arrays by fetching one scalar of
    each leaf (stronger than block_until_ready on remoted backends)."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype"):
            x = jnp.ravel(leaf)[0]
            if jnp.issubdtype(x.dtype, jnp.floating):
                float(x)
            else:
                int(x)


def scalarized(fn: Callable) -> Callable:
    """Wrap `fn` in a jit whose output is ONE scalar folding every output
    leaf: a timing fence is then a single device->host fetch.  Per-leaf
    fetches are ~25 ms RPCs each through the axon tunnel, which inflated
    multi-leaf stage timings by ~5 ms/iter in early artifacts (STAGE_r04).
    Full-leaf sums, not first-element slices — slicing would let XLA
    dead-code-eliminate the bulk of elementwise stages being measured.
    Used by tools/run_stage_bench.py and tools/run_feature_profile.py."""
    import functools

    import jax
    import jax.numpy as jnp

    def wrapped(*a):
        out = fn(*a)
        return functools.reduce(
            lambda acc, leaf: acc + jnp.sum(leaf).astype(jnp.float32),
            jax.tree_util.tree_leaves(out), jnp.float32(0.0),
        )

    return jax.jit(wrapped)


def device_timer(fn: Callable, *args, reps: int = 5, warmup: int = 1,
                 **kwargs) -> float:
    """Median-free mean ms/rep of fn(*args) with completion fencing."""
    for _ in range(warmup):
        fence(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(reps):
        fence(fn(*args, **kwargs))
    return (time.perf_counter() - t0) / reps * 1e3


@contextlib.contextmanager
def trace(logdir: str = "/tmp/bshot_slam_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def default_compile_cache_dir() -> str:
    """Cache dir resolution: $BSHOT_SLAM_JAX_CACHE, else <repo>/.jax_cache when
    the package sits in a writable checkout, else ~/.cache/bshot_slam_jax."""
    import os
    from pathlib import Path

    env = os.environ.get("BSHOT_SLAM_JAX_CACHE")
    if env:
        return env
    repo = Path(__file__).resolve().parents[2]
    if os.access(repo, os.W_OK):
        return str(repo / ".jax_cache")
    return str(Path.home() / ".cache" / "bshot_slam_jax")


def enable_persistent_compile_cache(
    path: str | None = None, min_compile_secs: float = 1.0
) -> None:
    """Point JAX's persistent compilation cache at a local directory so
    repeat CLI/bench invocations skip the 10-40 s first-compile of the big
    fused steps.  Safe to call multiple times; no-op if already configured."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", path or default_compile_cache_dir()
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except AttributeError:
        pass  # older jax without the flags: cache is an optimization only
