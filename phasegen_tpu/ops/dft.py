"""GEMM-native real-pair STFT/ISTFT — the production TPU path.

Two reasons this exists alongside the complex rFFT path in ops/stft.py:

  1. Complex arithmetic is emulated on TPU, and the axon TPU backend
     cannot even transfer complex64 buffers off-device (probed:
     UNIMPLEMENTED). The whole pipeline therefore carries spectrograms as
     *real pairs* (re, im) or (logmag, phase) — never complex dtype.
  2. A one-sided DFT of n_fft=2048 is a (frames, 2048) @ (2048, 1025)
     matmul — exactly what the 128x128 MXU systolic array is built for.
     At the reference geometry (128 frames / 4.064 s clip) the DFT GEMM
     is ~2 GFLOP/clip, i.e. microseconds on a v5e; trading O(n log n)
     FLOPs for MXU residency wins over XLA's TPU FFT emitter and fuses
     cleanly with the surrounding windowing / magnitude elementwise ops.

Forward:   Re[k] = sum_n x[n] cos(2*pi*k*n/N),  Im[k] = -sum_n x[n] sin(...)
Inverse:   x[n]  = (1/N) sum_k c_k (Re[k] cos(...) - Im[k] sin(...)),
           with c_k = 1 for k in {0, N/2} and 2 otherwise (one-sided).

Matrices are built once in float64 on host and cached per (n_fft, dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from phasegen_tpu.ops.stft import (
    _WIN_SQ_TINY,
    _check_length,
    frame_signal,
    hann_window,
    overlap_add,
)


@functools.lru_cache(maxsize=8)
def _dft_mats_np(n_fft: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(fwd_cos, fwd_sin, inv_cos, inv_sin) as float64 numpy, cached."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_bins)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft  # (n_fft, n_bins)
    fwd_cos = np.cos(ang)
    fwd_sin = -np.sin(ang)
    c = np.full(n_bins, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    inv_cos = (c[:, None] * np.cos(ang.T)) / n_fft  # (n_bins, n_fft)
    inv_sin = -(c[:, None] * np.sin(ang.T)) / n_fft
    return fwd_cos, fwd_sin, inv_cos, inv_sin


def dft_matrices(n_fft: int, dtype=jnp.float32):
    f_c, f_s, i_c, i_s = _dft_mats_np(n_fft)
    return tuple(jnp.asarray(m, dtype) for m in (f_c, f_s, i_c, i_s))


def _mm(a, b):
    # DFT accuracy matters (0.1 dB SNR budget): force full-f32 MXU passes.
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def stft_ri(
    x: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    center: bool = True,
    window: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Real-pair STFT via MXU GEMM.

    Args:
      x: real signal (..., T).
    Returns:
      (re, im), each (..., n_fft//2 + 1, n_frames) float32. Matches
      ops.stft.stft(...) bit-for-tolerance (tested).
    """
    if window is None:
        window = hann_window(n_fft, jnp.float32)
    _check_length(x.shape[-1], n_fft, center)
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop) * window
    f_c, f_s, _, _ = dft_matrices(n_fft)
    re = _mm(frames, f_c)  # (..., nf, n_bins)
    im = _mm(frames, f_s)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def istft_ri(
    re: jax.Array,
    im: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    center: bool = True,
    length: int | None = None,
    window: jax.Array | None = None,
) -> jax.Array:
    """Real-pair inverse STFT via MXU GEMM + scatter-free overlap-add.

    Args:
      re, im: (..., n_fft//2 + 1, n_frames).
    Returns:
      real signal (..., T).
    """
    if window is None:
        window = hann_window(n_fft, jnp.float32)
    _, _, i_c, i_s = dft_matrices(n_fft)
    re_t = jnp.swapaxes(re.astype(jnp.float32), -1, -2)  # (..., nf, n_bins)
    im_t = jnp.swapaxes(im.astype(jnp.float32), -1, -2)
    frames = _mm(re_t, i_c) + _mm(im_t, i_s)  # (..., nf, n_fft)
    nf = frames.shape[-2]
    sig = overlap_add(frames * window, hop)

    wsq = jnp.broadcast_to(window * window, (nf, n_fft))
    wsum = overlap_add(wsq, hop)
    sig = jnp.where(wsum > _WIN_SQ_TINY, sig / jnp.maximum(wsum, _WIN_SQ_TINY), sig)

    if center:
        sig = sig[..., n_fft // 2 : sig.shape[-1] - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig


def logmag_phase_ri(re: jax.Array, im: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(re, im) -> (log1p magnitude, phase), all real tensors."""
    return jnp.log1p(jnp.sqrt(re * re + im * im)), jnp.arctan2(im, re)


def polar_to_ri(logmag: jax.Array, phase: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(log1p magnitude, phase) -> (re, im), all real tensors."""
    mag = jnp.expm1(logmag)
    return mag * jnp.cos(phase), mag * jnp.sin(phase)
