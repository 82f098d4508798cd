"""DSP core golden tests: STFT/ISTFT vs torch.stft/istft (librosa conventions).

torch.stft(center=True, pad_mode='reflect', window=hann_periodic, onesided)
computes the same transform librosa.stft does, so it serves as the golden
oracle for the reference's preprocessing contract (reference:
preproc_mdb.py:93, utils.py:34-44).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from phasegen_tpu.ops import (
    add_dc,
    drop_dc,
    frame_signal,
    hann_window,
    istft,
    logmag_phase,
    overlap_add,
    polar_to_complex,
    stft,
)
from phasegen_tpu.ops.stft import n_frames_for

N_FFT, HOP = 2048, 512
T_SLICE = 65024  # int(4.064 * 16000), the reference chunk length


def _rand_audio(n=T_SLICE, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32) * 0.1


def _torch_stft(x, n_fft=N_FFT, hop=HOP):
    w = torch.hann_window(n_fft, periodic=True)
    return torch.stft(
        torch.from_numpy(x), n_fft, hop_length=hop, window=w,
        center=True, pad_mode="reflect", onesided=True, return_complex=True,
    ).numpy()


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(N_FFT))
    theirs = torch.hann_window(N_FFT, periodic=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_frame_count_reference_geometry():
    # 4.064 s @ 16 kHz with n_fft=2048 hop=512 center=True -> exactly 128 frames
    assert n_frames_for(T_SLICE, N_FFT, HOP) == 128


def test_stft_matches_torch_golden():
    x = _rand_audio()
    golden = _torch_stft(x)
    ours = np.asarray(stft(jnp.asarray(x), N_FFT, HOP))
    assert ours.shape == (N_FFT // 2 + 1, 128)
    assert golden.shape == ours.shape
    scale = np.abs(golden).max()
    np.testing.assert_allclose(ours, golden, atol=2e-4 * scale, rtol=0)


def test_stft_batched_matches_single():
    xs = np.stack([_rand_audio(seed=i) for i in range(3)])
    batched = np.asarray(stft(jnp.asarray(xs), N_FFT, HOP))
    for i in range(3):
        single = np.asarray(stft(jnp.asarray(xs[i]), N_FFT, HOP))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_istft_roundtrip():
    x = _rand_audio()
    spec = stft(jnp.asarray(x), N_FFT, HOP)
    y = np.asarray(istft(spec, N_FFT, HOP))
    assert y.shape == (T_SLICE,)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_istft_matches_torch_golden():
    x = _rand_audio()
    spec = _torch_stft(x)
    w = torch.hann_window(N_FFT, periodic=True)
    golden = torch.istft(
        torch.from_numpy(spec), N_FFT, hop_length=HOP, window=w, center=True
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(spec), N_FFT, HOP))[: golden.shape[0]]
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_dc_drop_add_roundtrip():
    x = _rand_audio()
    spec = stft(jnp.asarray(x), N_FFT, HOP)
    no_dc = drop_dc(spec)
    assert no_dc.shape == (N_FFT // 2, 128)
    back = add_dc(no_dc)
    assert back.shape == spec.shape
    np.testing.assert_allclose(np.asarray(back[1:]), np.asarray(spec[1:]))
    assert np.all(np.asarray(back[0]) == 0)


def test_logmag_phase_roundtrip():
    x = _rand_audio()
    spec = drop_dc(stft(jnp.asarray(x), N_FFT, HOP))
    logmag, phase = logmag_phase(spec)
    np.testing.assert_allclose(
        np.asarray(logmag), np.log1p(np.abs(np.asarray(spec))), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(phase), np.angle(np.asarray(spec)), atol=1e-5
    )
    rec = polar_to_complex(logmag, phase)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(spec), atol=2e-3)


def test_overlap_add_dense_equals_scatter():
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((7, N_FFT)).astype(np.float32)
    dense = np.asarray(overlap_add(jnp.asarray(frames), HOP))
    # naive numpy reference
    out = np.zeros(HOP * 6 + N_FFT, np.float32)
    for i in range(7):
        out[i * HOP : i * HOP + N_FFT] += frames[i]
    np.testing.assert_allclose(dense, out, atol=1e-5)


def test_overlap_add_ragged_hop():
    rng = np.random.default_rng(2)
    hop = 300  # does not divide 1024 -> scatter path
    frames = rng.standard_normal((5, 1024)).astype(np.float32)
    ours = np.asarray(overlap_add(jnp.asarray(frames), hop))
    out = np.zeros(hop * 4 + 1024, np.float32)
    for i in range(5):
        out[i * hop : i * hop + 1024] += frames[i]
    np.testing.assert_allclose(ours, out, atol=1e-5)


def test_stft_grad_flows():
    x = jnp.asarray(_rand_audio(4096))

    def loss(x):
        return jnp.sum(jnp.abs(stft(x, 512, 128)) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
