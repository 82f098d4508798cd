"""STFT / ISTFT primitives, designed TPU-first.

Semantics match the conventions the reference pipeline relies on
(librosa defaults, cross-checked against torch.stft in tests):

  * periodic ("fftbins") Hann window,
  * center=True reflect padding of n_fft//2 on both sides,
  * one-sided rFFT -> (n_fft//2 + 1) frequency bins,
  * ISTFT with windowed overlap-add + window-square-sum normalization,
    trimming n_fft//2 from both ends.

The reference preprocessing drops the DC bin after the STFT
(reference: preproc_mdb.py:93) and the resynthesis path re-inserts a zero
DC row before the ISTFT (reference: utils.py:38-39); `drop_dc`/`add_dc`
implement that contract.

TPU-first notes:
  * Framing is a static gather (XLA lowers to an efficient dynamic-slice
    loop); the fused Pallas analysis kernel (ops/pallas/stft_fused.py)
    covers framing + window + DFT for the hot preproc path.
  * Overlap-add avoids XLA scatter entirely when hop divides n_fft (the
    reference config: 512 | 2048): each frame is split into n_fft//hop
    hop-sized segments and the OLA becomes n_fft//hop dense shifted adds
    over a (n_frames + r - 1, hop) blocked view -- fully vectorizable on
    the VPU, no atomic accumulation. A scatter fallback covers ragged
    hops.
  * Everything is shape-static and jit/vmap/grad-compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# librosa uses np.finfo(float32).tiny as the window-sum-square threshold.
_WIN_SQ_TINY = float(np.finfo(np.float32).tiny)


def hann_window(n_fft: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window of length ``n_fft`` (scipy ``sym=False``)."""
    k = jnp.arange(n_fft, dtype=jnp.float32)
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * k / n_fft))
    return w.astype(dtype)


def _check_length(length: int, n_fft: int, center: bool) -> None:
    """Reject signals too short to transform (jnp reflect-pad is silent)."""
    min_len = n_fft // 2 + 1 if center else n_fft
    if length < min_len:
        raise ValueError(
            f"signal length {length} too short for n_fft={n_fft} "
            f"(need >= {min_len} samples with center={center})"
        )


def n_frames_for(length: int, n_fft: int, hop: int, center: bool = True) -> int:
    """Number of STFT frames produced for a signal of ``length`` samples."""
    padded = length + (n_fft if center else 0)
    if padded < n_fft:
        raise ValueError(f"signal too short: {length} < n_fft={n_fft}")
    return 1 + (padded - n_fft) // hop


def frame_signal(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Slice ``x`` (..., T) into overlapping frames -> (..., n_frames, n_fft).

    Pure gather; static shapes. The Pallas path (ops/pallas/stft_fused.py)
    fuses framing + windowing + DFT for the preproc hot loop.
    """
    length = x.shape[-1]
    nf = 1 + (length - n_fft) // hop
    idx = jnp.arange(nf)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def stft(
    x: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    center: bool = True,
    window: jax.Array | None = None,
) -> jax.Array:
    """Short-time Fourier transform.

    Args:
      x: real signal, shape (..., T).
    Returns:
      complex64 spectrogram of shape (..., n_fft//2 + 1, n_frames),
      frequency-major like the reference pipeline expects.
    """
    if window is None:
        window = hann_window(n_fft, x.dtype)
    _check_length(x.shape[-1], n_fft, center)
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    frames = frame_signal(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    # (..., n_frames, F) -> (..., F, n_frames)
    return jnp.swapaxes(spec, -1, -2)


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """Overlap-add frames (..., n_frames, n_fft) at stride ``hop``.

    Output length = hop * (n_frames - 1) + n_fft.

    When ``hop`` divides ``n_fft`` this is done scatter-free: view the
    output as (n_frames + r - 1) blocks of ``hop`` samples (r = n_fft//hop),
    split every frame into r hop-segments, and add each segment column
    into a shifted block range -- r dense adds, ideal for the TPU VPU.
    """
    *batch, nf, n_fft = frames.shape
    out_len = hop * (nf - 1) + n_fft
    if n_fft % hop == 0:
        r = n_fft // hop
        seg = frames.reshape(*batch, nf, r, hop)
        blocks = jnp.zeros((*batch, nf + r - 1, hop), frames.dtype)
        for k in range(r):  # r is small & static (4 for the reference config)
            blocks = blocks.at[..., k : k + nf, :].add(seg[..., :, k, :])
        return blocks.reshape(*batch, out_len)
    # Ragged hop: scatter-add fallback.
    idx = jnp.arange(nf)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = jnp.zeros((*batch, out_len), frames.dtype)
    return out.at[..., idx.reshape(-1)].add(frames.reshape(*batch, nf * n_fft))


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center", "length"))
def istft(
    spec: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    center: bool = True,
    length: int | None = None,
    window: jax.Array | None = None,
) -> jax.Array:
    """Inverse STFT with window-square-sum normalization.

    Args:
      spec: complex spectrogram (..., n_fft//2 + 1, n_frames).
    Returns:
      real signal (..., T) with T = hop*(n_frames-1) + n_fft - 2*(n_fft//2)
      for center=True (or ``length`` if given).
    """
    if window is None:
        window = hann_window(n_fft, jnp.float32)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    nf = frames.shape[-2]
    sig = overlap_add(frames * window, hop)

    # Window-square-sum normalization (shared by all batch elements).
    wsq = jnp.broadcast_to(window * window, (nf, n_fft))
    wsum = overlap_add(wsq, hop)
    sig = jnp.where(wsum > _WIN_SQ_TINY, sig / jnp.maximum(wsum, _WIN_SQ_TINY), sig)

    if center:
        sig = sig[..., n_fft // 2 : sig.shape[-1] - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig


def drop_dc(spec: jax.Array) -> jax.Array:
    """Remove the DC bin: (..., F, T) -> (..., F-1, T).

    Mirrors the reference preprocessing's ``np.delete(stft, (0), axis=0)``
    (reference: preproc_mdb.py:93).
    """
    return spec[..., 1:, :]


def add_dc(spec: jax.Array) -> jax.Array:
    """Re-insert a zero DC row: (..., F-1, T) -> (..., F, T).

    Mirrors the reference resynthesis (reference: utils.py:38-39).
    """
    dc = jnp.zeros((*spec.shape[:-2], 1, spec.shape[-1]), spec.dtype)
    return jnp.concatenate([dc, spec], axis=-2)


def logmag_phase(spec: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Complex spectrogram -> (log1p magnitude, phase angle).

    The model's input/target representation (reference: data.py:39-47).
    """
    return jnp.log1p(jnp.abs(spec)), jnp.angle(spec)


def polar_to_complex(logmag: jax.Array, phase: jax.Array) -> jax.Array:
    """(log1p magnitude, phase) -> complex spectrogram.

    Inverse of :func:`logmag_phase`: (e^logmag - 1) * e^{i*phase}
    (reference: train.py:82-83, demo.py:39).
    """
    mag = jnp.expm1(logmag)
    return (mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)).astype(jnp.complex64)


def normalize_inf(x: jax.Array, axis=None) -> jax.Array:
    """Infinity-norm normalization of audio (reference: utils.py:42)."""
    peak = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    return x / jnp.maximum(peak, jnp.finfo(x.dtype).tiny)
