"""Training losses.

The reference trains the U-Net to predict phase and magnitude jointly
(reference: train.py:44-60): the angle loss is the MSE of the cos and sin
of the predicted vs. target phase (circular-safe), the magnitude loss is
a plain MSE against the input log-magnitude, scaled by 0.2.

Extension (``ang_weighting="mag2"``): weight each bin's cos/sin error by
its normalized magnitude-squared. Since
  (cos a - cos b)^2 + (sin a - sin b)^2 = 2 - 2 cos(a - b),
the mag^2-weighted angle loss is proportional (by Parseval) to the L2
waveform error of the hybrid reconstruction — the thing validation
actually measures. The reference's unweighted loss spends most of its
gradient on near-silent bins whose phase is irrelevant to the audio
(observed on-TPU: hybrid SNR slowly degrades late in training while the
unweighted loss still falls).
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
    ang_weighting: str = "none",
) -> tuple[jax.Array, dict]:
    """cos/sin phase MSE + scaled magnitude MSE (reference: train.py:49-60).

    Args:
      pred: (B, 2*n_bins, T) U-Net output — phase head first, mag head second.
      logmag: (B, n_bins, T) input log1p-magnitude (the mag target).
      phase: (B, n_bins, T) target phase angles.
      ang_weighting: "none" = reference loss; "mag2" = per-bin
        mag^2/mean(mag^2) weights on the cos/sin errors (waveform-L2
        aligned; see module docstring).
    Returns:
      (total loss, {"ang_loss", "mag_loss", "loss"}) — all f32 scalars.
      With weighting on, "ang_loss" stays the unweighted reference value
      (comparable across runs); "loss" uses the weighted angle term.
    """
    pred = pred.astype(jnp.float32)
    pred_p = pred[:, :n_bins]
    pred_m = pred[:, n_bins:]
    phase = phase.astype(jnp.float32)
    logmag = logmag.astype(jnp.float32)

    cos_err = jnp.square(jnp.cos(pred_p) - jnp.cos(phase))
    sin_err = jnp.square(jnp.sin(pred_p) - jnp.sin(phase))
    ang_loss = jnp.mean(cos_err) + jnp.mean(sin_err)
    if ang_weighting == "mag2":
        w = jnp.square(jnp.expm1(logmag))
        w = w / jnp.maximum(jnp.mean(w), 1e-12)  # mean-1 weights
        ang_term = jnp.mean(w * (cos_err + sin_err))
    elif ang_weighting == "none":
        ang_term = ang_loss
    else:
        raise ValueError(f"unknown ang_weighting {ang_weighting!r}")
    mag_loss = _mse(pred_m, logmag)
    loss = ang_term + mag_weight * mag_loss
    return loss, {"loss": loss, "ang_loss": ang_loss, "mag_loss": mag_loss}
