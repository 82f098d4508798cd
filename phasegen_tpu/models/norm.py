"""Functional normalization layers over (B, C, L) tensors.

The reference applies ``nn.BatchNorm2d`` to 3-D Conv1d outputs — legal in
torch-0.x, semantically BatchNorm1d: per-channel statistics over
(batch, length) (reference: model.py:23,60,81-83). We reproduce exactly
that, with torch's conventions: biased variance for normalization,
unbiased variance for the running estimate, momentum 0.1, eps 1e-5.

Statistics are always computed in float32 regardless of the activation
dtype (bf16-safe), and the state is an explicit pytree so the train step
stays pure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_norm_state(num_channels: int) -> dict:
    return {
        "mean": jnp.zeros((num_channels,), jnp.float32),
        "var": jnp.ones((num_channels,), jnp.float32),
    }


def batch_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    state: dict,
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> tuple[jax.Array, dict]:
    """BatchNorm over (B, L) per channel of a (B, C, L) tensor.

    Returns (normalized x in x.dtype, new running-stats state).
    """
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 2))
        var = jnp.var(xf, axis=(0, 2))  # biased, used for normalization
        n = x.shape[0] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean[None, :, None]) * (scale.astype(jnp.float32) * inv)[None, :, None]
    y = y + bias.astype(jnp.float32)[None, :, None]
    return y.astype(x.dtype), new_state


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm1d (affine=False, torch default) over L per (B, C)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=2, keepdims=True)
    var = jnp.var(xf, axis=2, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
