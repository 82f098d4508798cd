"""Jitted single-chip train/eval steps.

The reference's step (reference: train.py:37-62): forward on the
log-magnitude channel only, split the output into phase/magnitude heads,
cos/sin angle MSE + 0.2x magnitude MSE, Adam. Here the whole step —
including the raw real/imag -> (log1p-mag, phase) conversion the
reference does on the host at load time (reference: data.py:39-47) — is
one XLA graph with donated state buffers, so batches stream to the device
as raw f32 pairs and everything else stays on-chip.

The data-parallel multi-chip step lives in parallel/dp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from phasegen_tpu.models.unet import UNetConfig, unet_apply
from phasegen_tpu.train.losses import phase_mag_loss
from phasegen_tpu.train.state import TrainState


def ri_to_logmag_phase(batch_ri: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, 2, F, T) raw real/imag -> ((B, F, T) log1p-mag, (B, F, T) phase).

    Device-side equivalent of the reference's ``get_spec_and_angle``
    (reference: data.py:39-47).
    """
    re = batch_ri[:, 0]
    im = batch_ri[:, 1]
    return jnp.log1p(jnp.sqrt(re * re + im * im)), jnp.arctan2(im, re)


def loss_fn(params, norm_state, logmag, phase, cfg: UNetConfig,
            mag_weight: float, training: bool, ang_weighting: str = "none"):
    pred, new_norm_state = unet_apply(params, norm_state, logmag, cfg,
                                      training=training)
    loss, metrics = phase_mag_loss(pred, logmag, phase, cfg.input_nc,
                                   mag_weight, ang_weighting)
    return loss, (metrics, new_norm_state)


def build_train_step(cfg: UNetConfig, optimizer: optax.GradientTransformation,
                     mag_weight: float = 0.2, raw_ri: bool = True,
                     ang_weighting: str = "none"):
    """Returns jitted fn(state, batch) -> (state, metrics).

    Args:
      raw_ri: if True, batch is (B, 2, F, T) raw real/imag and the
        logmag/phase conversion is fused into the step; otherwise batch is
        a (logmag, phase) tuple.
      ang_weighting: "none" (reference loss) or "mag2" (waveform-L2
        aligned per-bin weights, train/losses.py).
    """

    def step(state: TrainState, batch):
        if raw_ri:
            logmag, phase = ri_to_logmag_phase(batch)
        else:
            logmag, phase = batch
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_norm_state)), grads = grad_fn(
            state.params, state.norm_state, logmag, phase, cfg, mag_weight,
            True, ang_weighting)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            norm_state=new_norm_state,
            step=state.step + 1,
            rng=state.rng,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def build_eval_step(cfg: UNetConfig, mag_weight: float = 0.2,
                    raw_ri: bool = True):
    """Returns jitted fn(state, batch) -> (pred, metrics) in eval mode."""

    def step(state: TrainState, batch):
        if raw_ri:
            logmag, phase = ri_to_logmag_phase(batch)
        else:
            logmag, phase = batch
        pred, _ = unet_apply(state.params, state.norm_state, logmag, cfg,
                             training=False)
        _, metrics = phase_mag_loss(pred, logmag, phase, cfg.input_nc,
                                    mag_weight)
        return pred.astype(jnp.float32), metrics

    return jax.jit(step)
