"""Quality regression: predicted phase must beat zero phase, held out.

This is the reference's success criterion in miniature: the model's
hybrid reconstruction (true magnitude + predicted phase) must have lower
held-out waveform error than the zero-phase baseline (MSE < NOPMSE,
reference: train.py:103-108). Runs at the tiny 16-bin geometry on a
256-clip on-device synthetic corpus; calibrated margin (measured
MSE/NOPMSE ≈ 0.75 at this step count, asserted < 0.9).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data.device_synth import corpus_stats, synth_patches
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.state import make_optimizer
from phasegen_tpu.train.validate import build_validate_fn

T, SR, NFFT, HOP = 1016, 4000, 32, 8


def test_trained_model_beats_zero_phase_on_held_out_clips():
    key = jax.random.PRNGKey(0)
    n = 256
    mean, std = corpus_stats(key, n, t_samples=T, sr=SR, n_fft=NFFT,
                             hop=HOP, sample=n, gen_batch=64)
    fn = jax.jit(functools.partial(synth_patches, t_samples=T, sr=SR,
                                   n_fft=NFFT, hop=HOP, mean=mean, std=std))

    cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
    opt = make_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(1), cfg, opt)
    step = build_train_step(cfg, opt)

    rng = np.random.default_rng(0)
    for _ in range(10):  # 10 epochs x 32 steps, B=8
        order = rng.permutation(n)
        for s in range(0, n, 8):
            state, metrics = step(state, fn(key, jnp.asarray(
                order[s:s + 8], jnp.int32)))
    assert np.isfinite(float(metrics["loss"]))

    # held-out seeds (outside the training range)
    val_batch = fn(key, jnp.arange(n, n + 16, dtype=jnp.int32))
    validate = build_validate_fn(cfg, NFFT, HOP, gl_iters=2)
    out = validate(state.params, state.norm_state, val_batch,
                   jax.random.PRNGKey(9))
    mse, nopmse = float(out["MSE"]), float(out["NOPMSE"])
    assert mse < 0.9 * nopmse, (mse, nopmse)
