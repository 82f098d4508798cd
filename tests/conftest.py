"""Test configuration: run everything on a virtual 8-device CPU backend.

Multi-chip sharding tests use the standard JAX fake-backend trick
(``xla_force_host_platform_device_count``) since real multi-chip hardware
is not available in CI. The axon TPU plugin ignores the JAX_PLATFORMS env
var, so we also force the platform through jax.config before any test
imports jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Liveness probes spawn child processes that would NOT inherit the
# in-process CPU forcing below and would touch the real TPU tunnel.
os.environ["PHASEGEN_SKIP_LIVENESS"] = "1"
# A leftover /tmp/q_stop (bench.py's cooperative chip-yield request)
# must never truncate a training test's step budget — disable the stop
# file; the stop-file tests opt back in with an explicit tmp path.
os.environ["PHASEGEN_STOP_FILE"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
