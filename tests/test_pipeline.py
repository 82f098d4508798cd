"""End-to-end fused inference pipeline tests (CPU backend)."""

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.infer import build_infer_fn, spec_to_audio_fn, wav_to_patch_fn
from phasegen_tpu.models import UNetConfig, unet_init

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP = 32, 8  # tiny DSP geometry: n_fft//2 = 16 bins = input_nc


def _sine_batch(b=2, t=None, sr=16000):
    # length chosen so n_frames == 128: t = hop * (nf - 1) ... with center
    # padding nf = 1 + T//hop -> T = (128 - 1) * HOP
    t = t or (127 * HOP)
    time = np.arange(t) / sr
    # Frequencies well above bin 1 (sr/n_fft = 500 Hz at the tiny test
    # geometry): the pipeline drops the DC bin by design, so test tones
    # must not leak energy there.
    freqs = 2000.0 + 1300.0 * np.arange(b)[:, None]
    return (0.5 * np.sin(2 * np.pi * freqs * time[None, :])).astype(np.float32)


def test_wav_to_patch_shapes():
    wav = jnp.asarray(_sine_batch())
    logmag, phase = wav_to_patch_fn(N_FFT, HOP)(wav)
    assert logmag.shape == (2, N_FFT // 2, 128)
    assert phase.shape == logmag.shape
    assert bool(jnp.all(jnp.isfinite(logmag)))


def test_patch_to_audio_roundtrip_true_phase():
    wav = _sine_batch()
    logmag, phase = wav_to_patch_fn(N_FFT, HOP)(jnp.asarray(wav))
    out = np.asarray(
        spec_to_audio_fn(N_FFT, HOP, length=wav.shape[-1], normalize=False)(
            logmag, phase))
    # true mag + true phase must reconstruct the waveform
    snr = 10 * np.log10(np.sum(wav**2) / np.sum((wav - out) ** 2))
    assert snr > 40.0, snr


def test_fused_infer_runs_and_is_finite():
    params, state = unet_init(jax.random.PRNGKey(0), CFG)
    infer = build_infer_fn(CFG, N_FFT, HOP)
    wav = jnp.asarray(_sine_batch())
    out, pred_phase = infer(params, state, wav)
    assert out.shape == wav.shape
    assert pred_phase.shape == (2, 16, 128)
    assert bool(jnp.all(jnp.isfinite(out)))
    # normalized output: infinity norm == 1
    np.testing.assert_allclose(np.max(np.abs(np.asarray(out)), axis=-1), 1.0,
                               atol=1e-5)


def test_fused_infer_pred_mag_head():
    params, state = unet_init(jax.random.PRNGKey(1), CFG)
    infer = build_infer_fn(CFG, N_FFT, HOP, use_pred_mag=True)
    wav = jnp.asarray(_sine_batch())
    out, _ = infer(params, state, wav)
    assert out.shape == wav.shape
    assert bool(jnp.all(jnp.isfinite(out)))
