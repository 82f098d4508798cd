"""Profiling and honest timing utilities.

The reference's only tracing is wall-clock prints (reference:
train.py:36,130, demo.py:35-42). Here:

  * ``trace`` — context manager around jax.profiler.trace writing a
    TensorBoard-viewable trace directory,
  * ``timeit`` — steady-state timing of a jitted callable with two
    methodologies: pipelined dispatch with one final block (device
    throughput) and per-call fetch (end-to-end latency incl. D2H). On
    tunneled backends block_until_ready alone can mis-report; reporting
    both bounds the truth.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fetch(tree):
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            # complex64 D2H is UNIMPLEMENTED on this backend (CLAUDE.md):
            # fetch the magnitude instead of the raw complex buffer
            if jnp.iscomplexobj(leaf):
                np.asarray(jnp.abs(leaf))
            else:
                np.asarray(leaf)


def _scalar_fence(tree):
    """Force device completion with one scalar fetch per distinct
    executable output — block_until_ready returns before completion on
    tunneled backends (CLAUDE.md), so timings must fence this way."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            float(jnp.sum(jnp.abs(leaf)))
            return  # outputs of one execution complete together


def timeit(fn, *args, reps: int = 10, warmup: int = 2, **kwargs) -> dict:
    """Returns {"pipelined_ms", "fetch_ms"} steady-state timings of
    fn(*args, **kwargs)."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    _scalar_fence(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    _scalar_fence(out)
    pipelined = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(max(1, reps // 2)):
        out = fn(*args, **kwargs)
        _fetch(out)
    fetch = (time.perf_counter() - t0) / max(1, reps // 2)

    return {"pipelined_ms": pipelined * 1e3, "fetch_ms": fetch * 1e3}
