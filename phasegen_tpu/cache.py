"""Persistent XLA compilation cache for the CLIs.

First compile of a 612M-U-Net graph costs ~40 s on the tunnel, and the
whole-track streaming program measured ~200 s (BASELINE.md). None of
that work survives the process without a persistent cache, so every CLI
invocation used to pay it again. ``enable_compilation_cache`` points
JAX's disk cache at a stable location so the second invocation of any
CLI deserializes its executables in seconds.

The cache is keyed by (HLO, compile options, platform/runtime version),
so it is safe across model/config changes — a changed graph simply
misses. Thresholds are set to cache everything that takes noticeable
time without filling the disk with microsecond-compile DSP graphs.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "phasegen_tpu", "xla_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache. Returns the directory.

    Call before building any jitted graph (import-time state is fine;
    JAX picks the config up at first compile). Safe to call repeatedly.
    """
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compile that took >= 1 s (the U-Net graphs take tens)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # cache regardless of how often the program has been seen
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax: flag absent
        pass
    return cache_dir


def add_cache_flag(parser) -> None:
    """Attach the shared --no_compile_cache flag to an argparse parser."""
    parser.add_argument(
        "--no_compile_cache", action="store_true",
        help="disable the persistent XLA compilation cache "
             f"({DEFAULT_CACHE_DIR}); with it on, repeat invocations "
             "deserialize executables instead of recompiling (40s+ for "
             "the U-Net graphs, minutes for train steps)")


def enable_unless_disabled(args) -> None:
    """Honor the --no_compile_cache flag parsed by add_cache_flag."""
    if not getattr(args, "no_compile_cache", False):
        enable_compilation_cache()
