"""Pallas kernel: fused inverse-DFT + window + overlap-add ISTFT.

Grid is (batch, n_fft-column-tiles). Each step GEMMs the full frame-major
spectrogram pair against a column slab of the inverse-DFT matrices
(bins 1..n_fft/2 — the DC-drop contract is folded into the matrices, so
the zero DC row the reference re-inserts on the host, utils.py:38-39,
never exists), windows it, and overlap-adds the slab *sequentially* into
a persistent VMEM signal buffer — race-free accumulation with no scatter
and no HBM round-trip for the frame tensor. The final column step
normalizes by the precomputed reciprocal window-square-sum and writes the
center-trimmed waveform.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phasegen_tpu.ops.stft import _WIN_SQ_TINY, hann_window, overlap_add


@functools.lru_cache(maxsize=8)
def _idft_nodc_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(inv_cos, inv_sin) for DC-dropped one-sided bins 1..n_fft/2."""
    n_bins = n_fft // 2
    k = np.arange(1, n_bins + 1)[:, None].astype(np.float64)
    n = np.arange(n_fft)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((n_bins, 1), 2.0)
    c[-1] = 1.0  # Nyquist
    return ((c * np.cos(ang) / n_fft).astype(np.float32),
            (-(c * np.sin(ang)) / n_fft).astype(np.float32))


def _make_istft_kernel(n_frames, n_fft, hop, fk, trim, t_out):
    n_k = n_fft // fk

    def kernel(re_ref, im_ref, icos_ref, isin_ref, win_ref, wnorm_ref,
               out_ref, sig_ref, cols_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            sig_ref[:] = jnp.zeros_like(sig_ref)

        cols_ref[:] = (
            jnp.dot(re_ref[0], icos_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(im_ref[0], isin_ref[:],
                      preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        ) * win_ref[0, :]  # (n_frames, fk)

        def ola(i, _):
            # dynamic row/offset indexing must go through refs (Mosaic has
            # no dynamic_slice on register values)
            off = i * hop + k * fk
            seg = sig_ref[0:1, pl.ds(off, fk)]
            sig_ref[0:1, pl.ds(off, fk)] = seg + cols_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, n_frames, ola, 0)

        @pl.when(k == n_k - 1)
        def _():
            out_ref[0, 0, :] = sig_ref[0, pl.ds(trim, t_out)] * wnorm_ref[0, :]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "center", "length",
                                    "fft_tile"))
def istft_ri_pallas(
    re: jax.Array,
    im: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    center: bool = True,
    length: int | None = None,
    fft_tile: int = 512,
) -> jax.Array:
    """Fused ISTFT from a DC-dropped real pair.

    Args:
      re, im: (B, n_fft//2, n_frames) bins-major (pipeline layout) or
        (n_fft//2, n_frames).
    Returns:
      (B, T) float32 waveforms (or (T,) for unbatched input).
    """
    squeeze = re.ndim == 2
    if squeeze:
        re, im = re[None], im[None]
    if re.shape[-2] != n_fft // 2:
        raise ValueError(f"expected {n_fft // 2} DC-dropped bins, "
                         f"got {re.shape[-2]}")
    # frame-major for the GEMM
    re_t = jnp.swapaxes(re.astype(jnp.float32), -1, -2)
    im_t = jnp.swapaxes(im.astype(jnp.float32), -1, -2)
    b, n_frames, n_bins = re_t.shape

    t_full = hop * (n_frames - 1) + n_fft
    trim = n_fft // 2 if center else 0
    t_out = t_full - 2 * trim
    fk = min(fft_tile, n_fft)
    # the grid is (b, n_fft // fk): a non-dividing tile would silently
    # drop the trailing n_fft % fk samples of every frame from the
    # overlap-add (r3x review) — shrink to the largest divisor tile
    while n_fft % fk != 0:
        fk -= 1

    icos, isin = _idft_nodc_np(n_fft)
    win = hann_window(n_fft, jnp.float32)

    wsq = jnp.broadcast_to(win * win, (n_frames, n_fft))
    wsum = overlap_add(wsq, hop)[trim : trim + t_out]
    wnorm = jnp.where(wsum > _WIN_SQ_TINY,
                      1.0 / jnp.maximum(wsum, _WIN_SQ_TINY), 1.0)[None, :]

    kernel = _make_istft_kernel(n_frames, n_fft, hop, fk, trim, t_out)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_fft // fk),
        in_specs=[
            pl.BlockSpec((1, n_frames, n_bins), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_frames, n_bins), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, fk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, fk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_out), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t_out), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, t_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, t_full), jnp.float32),
                        pltpu.VMEM((n_frames, fk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_frames * n_bins * n_fft,
            bytes_accessed=4 * b * (2 * n_frames * n_bins + t_out)
            + 8 * n_bins * n_fft,
            transcendentals=0,
        ),
    )(re_t, im_t, jnp.asarray(icos), jnp.asarray(isin), win[None, :], wnorm)

    out = out[:, 0, :]
    if length is not None:
        out = out[:, :length]
    if squeeze:
        out = out[0]
    return out
