"""Training losses.

The reference trains the U-Net to predict phase and magnitude jointly
(reference: train.py:44-60): the angle loss is the MSE of the cos and sin
of the predicted vs. target phase (circular-safe), the magnitude loss is
a plain MSE against the input log-magnitude, scaled by 0.2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a - b))


def phase_mag_loss(
    pred: jax.Array,
    logmag: jax.Array,
    phase: jax.Array,
    n_bins: int,
    mag_weight: float = 0.2,
) -> tuple[jax.Array, dict]:
    """cos/sin phase MSE + scaled magnitude MSE (reference: train.py:49-60).

    Args:
      pred: (B, 2*n_bins, T) U-Net output — phase head first, mag head second.
      logmag: (B, n_bins, T) input log1p-magnitude (the mag target).
      phase: (B, n_bins, T) target phase angles.
    Returns:
      (total loss, {"ang_loss", "mag_loss", "loss"}) — all f32 scalars.
    """
    pred = pred.astype(jnp.float32)
    pred_p = pred[:, :n_bins]
    pred_m = pred[:, n_bins:]
    phase = phase.astype(jnp.float32)
    logmag = logmag.astype(jnp.float32)

    cos_loss = _mse(jnp.cos(pred_p), jnp.cos(phase))
    sin_loss = _mse(jnp.sin(pred_p), jnp.sin(phase))
    ang_loss = cos_loss + sin_loss
    mag_loss = _mse(pred_m, logmag)
    loss = ang_loss + mag_weight * mag_loss
    return loss, {"loss": loss, "ang_loss": ang_loss, "mag_loss": mag_loss}
