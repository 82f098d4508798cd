"""Multi-host (multi-slice) initialization.

The reference is strictly single-process (no torch.distributed, no
launcher — SURVEY.md §2.8). This framework is single-controller JAX: one
process per host, `jax.distributed.initialize` wiring hosts together,
after which the existing mesh/sharding code (parallel/mesh.py) sees all
devices globally and DP gradients all-reduce over ICI within a slice and
DCN across slices — no further code changes needed.

Usage on each host:
    from phasegen_tpu.parallel.distributed import init_distributed
    init_distributed()          # env-driven (TPU pods auto-detect)
    mesh = make_mesh()          # global devices
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Configuration comes from the arguments or the JAX_COORDINATOR /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment variables. On Cloud
    TPU pod slices, where ``jax.distributed.initialize()`` auto-detects
    everything, set ``JAX_AUTO_DISTRIBUTED=1`` instead of the triple —
    auto-detection must be opt-in because bare ``initialize()`` hangs on
    single-host dev backends (this tunnel) waiting for a coordinator.
    Returns True when distributed mode is active.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if os.environ.get("JAX_AUTO_DISTRIBUTED") and coordinator is None:
        jax.distributed.initialize()  # pod-slice auto-detection
        return jax.process_count() > 1

    explicit = coordinator is not None and num_processes is not None
    if not explicit and num_processes in (None, 1):
        return False  # single-process run; nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
