"""Device mesh construction and sharding rules.

The reference's only parallelism is single-process DataParallel
scatter/gather (reference: model.py:40-41). The TPU-native replacement is
SPMD over a (data, model) mesh: batches shard over the ``data`` axis,
conv channels shard over the ``model`` axis (tensor parallelism), and XLA
inserts the gradient all-reduces / activation collectives over ICI.

Sharding rules (GSPMD annotations; XLA propagates the rest):
  batch (B, ...)                          -> P('data', ...)
  down-conv weight (C_out, C_in, k)       -> P('model', None, None)
  up-conv weight   (C_in, C_out, k)       -> P(None, 'model', None)
  per-channel vectors (norm scale/bias,
    biases, BN running stats)             -> P('model')
  scalars (step, rng, Adam counters)      -> replicated

Adam moments inherit the sharding of their parameters (they are
tree-mapped with the same rules).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _param_spec(path: str, leaf, n_model: int) -> P:
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 3:
        if "['down']" in path:  # (C_out, C_in, k)
            return P("model", None, None)
        if "['up']" in path:    # (C_in, C_out, k)
            return P(None, "model", None)
        return P(*([None] * ndim))
    if ndim == 1:
        # per-channel vectors (norm affine, biases, BN stats + their Adam
        # moments) shard over 'model'; NOT the PRNG key or any other
        # small/non-divisible 1-D leaf — those replicate.
        if ".rng" in path or leaf.shape[0] % max(n_model, 1) != 0:
            return P()
        return P("model")
    return P()


def state_shardings(mesh: Mesh, state):
    """NamedShardings for a TrainState (or any params-shaped pytree)."""
    n_model = mesh.shape["model"]

    def to_sharding(path, leaf):
        return NamedSharding(
            mesh, _param_spec(jax.tree_util.keystr(path), leaf, n_model))

    return jax.tree_util.tree_map_with_path(to_sharding, state)
