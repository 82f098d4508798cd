"""GEMM-native DFT path vs the complex rFFT reference path."""

import numpy as np

import jax.numpy as jnp

from phasegen_tpu.ops import istft, stft
from phasegen_tpu.ops.dft import istft_ri, logmag_phase_ri, polar_to_ri, stft_ri

N_FFT, HOP = 2048, 512
T_SLICE = 65024


def _rand_audio(n=T_SLICE, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32) * 0.1


def test_stft_ri_matches_complex_path():
    x = jnp.asarray(_rand_audio())
    golden = np.asarray(stft(x, N_FFT, HOP))
    re, im = stft_ri(x, N_FFT, HOP)
    scale = np.abs(golden).max()
    np.testing.assert_allclose(np.asarray(re), golden.real, atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(im), golden.imag, atol=1e-4 * scale)


def test_istft_ri_matches_complex_path():
    x = jnp.asarray(_rand_audio(seed=3))
    spec = stft(x, N_FFT, HOP)
    golden = np.asarray(istft(spec, N_FFT, HOP))
    y = np.asarray(istft_ri(spec.real, spec.imag, N_FFT, HOP))
    np.testing.assert_allclose(y, golden, atol=1e-4)


def test_roundtrip_ri():
    x = _rand_audio(seed=5)
    re, im = stft_ri(jnp.asarray(x), N_FFT, HOP)
    y = np.asarray(istft_ri(re, im, N_FFT, HOP))
    np.testing.assert_allclose(y, x, atol=2e-4)


def test_logmag_phase_ri_roundtrip():
    x = jnp.asarray(_rand_audio(seed=7))
    re, im = stft_ri(x, N_FFT, HOP)
    lm, ph = logmag_phase_ri(re, im)
    re2, im2 = polar_to_ri(lm, ph)
    scale = float(jnp.max(jnp.abs(re)))
    np.testing.assert_allclose(np.asarray(re2), np.asarray(re), atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(im2), np.asarray(im), atol=2e-3 * scale)


def test_batched_stft_ri():
    xs = np.stack([_rand_audio(seed=i) for i in range(2)])
    re, im = stft_ri(jnp.asarray(xs), N_FFT, HOP)
    assert re.shape == (2, N_FFT // 2 + 1, 128)
    single_re, single_im = stft_ri(jnp.asarray(xs[0]), N_FFT, HOP)
    np.testing.assert_allclose(np.asarray(re[0]), np.asarray(single_re), atol=1e-5)
