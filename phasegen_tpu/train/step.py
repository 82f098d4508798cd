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
            mag_weight: float, training: bool, ang_weighting: str = "none",
            wav_weight: float = 0.0, n_fft: int = 2048, hop: int = 512,
            ang_weight: float = 1.0, sc_weight: float = 0.0):
    pred, new_norm_state = unet_apply(params, norm_state, logmag, cfg,
                                      training=training)
    loss, metrics = phase_mag_loss(pred, logmag, phase, cfg.input_nc,
                                   mag_weight, ang_weighting,
                                   wav_weight, n_fft, hop,
                                   ang_weight=ang_weight,
                                   sc_weight=sc_weight)
    return loss, (metrics, new_norm_state)


def build_train_step(cfg: UNetConfig, optimizer: optax.GradientTransformation,
                     mag_weight: float = 0.2, raw_ri: bool = True,
                     ang_weighting: str = "none", wav_weight: float = 0.0,
                     n_fft: int = 2048, hop: int = 512,
                     ang_weight: float = 1.0, sc_weight: float = 0.0):
    """Returns jitted fn(state, batch) -> (state, metrics).

    Args:
      raw_ri: if True, batch is (B, 2, F, T) raw real/imag and the
        logmag/phase conversion is fused into the step; otherwise batch is
        a (logmag, phase) tuple.
      ang_weighting: "none" (reference loss) or "mag2" (waveform-L2
        aligned per-bin weights, train/losses.py).
      wav_weight: > 0 adds the waveform-domain hybrid-MAE auxiliary loss
        (train/losses.py:hybrid_wav_mae); needs n_fft/hop.
    """

    def step(state: TrainState, batch):
        if raw_ri:
            logmag, phase = ri_to_logmag_phase(batch)
        else:
            logmag, phase = batch
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_norm_state)), grads = grad_fn(
            state.params, state.norm_state, logmag, phase, cfg, mag_weight,
            True, ang_weighting, wav_weight, n_fft, hop, ang_weight,
            sc_weight)
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


def build_train_step_scan(cfg: UNetConfig,
                          optimizer: optax.GradientTransformation,
                          make_batch,
                          mag_weight: float = 0.2,
                          ang_weighting: str = "none",
                          state_shard=None,
                          data_shard=None,
                          wav_weight: float = 0.0,
                          n_fft: int = 2048,
                          hop: int = 512,
                          ang_weight: float = 1.0,
                          sc_weight: float = 0.0):
    """Returns jitted fn(state, data, xs) -> (state, metrics) running
    ``xs.shape[0]`` training steps in ONE dispatch via ``lax.scan``.

    Per scan iteration the batch is built on device by
    ``make_batch(data, x)`` — e.g. synthesizing clips from a seed row
    (data/device_synth.py) or gathering rows of a device-resident dataset
    — so the host feeds only a tiny (K, B) int32 array per call. This
    amortizes the fixed per-step cost (host dispatch + state round-trip;
    measured ~77 ms/step on the tunnel, ~13 ms of it optimizer HBM
    traffic) over K steps: production loops sync at log points, not every
    step, and the scan makes the whole window one XLA program.

    Args:
      make_batch: (data, x) -> (B, 2, F, T) raw real/imag batch, pure jnp.
      data: per-call invariant operand (device dataset / PRNG key);
        NOT donated, passed as an argument so large datasets are not baked
        into the executable as constants.
      state_shard/data_shard: optional GSPMD shardings (mesh runs).
    Returns metrics reduced over the window: mean ang/mag/loss plus the
    window-final ``loss_last`` for NaN checks.
    """

    def body(carry, x):
        state, data = carry
        batch = make_batch(data, x)
        logmag, phase = ri_to_logmag_phase(batch)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_norm_state)), grads = grad_fn(
            state.params, state.norm_state, logmag, phase, cfg, mag_weight,
            True, ang_weighting, wav_weight, n_fft, hop, ang_weight,
            sc_weight)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt_state, new_norm_state,
                               state.step + 1, state.rng)
        return (new_state, data), metrics

    def scan_fn(state: TrainState, data, xs):
        # `data` rides the carry unchanged (XLA aliases it; no copies) so
        # large device-resident datasets are an argument, not a baked-in
        # executable constant.
        (state, _), stacked = jax.lax.scan(body, (state, data), xs)
        out = {k: jnp.mean(v) for k, v in stacked.items()}
        out["loss_last"] = stacked["loss"][-1]
        return state, out

    if state_shard is not None:
        return jax.jit(scan_fn,
                       in_shardings=(state_shard, data_shard, None),
                       out_shardings=(state_shard, None),
                       donate_argnums=(0,))
    return jax.jit(scan_fn, donate_argnums=(0,))


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
