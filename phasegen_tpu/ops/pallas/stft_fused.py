"""Pallas kernel: fused GEMM-DFT + log-magnitude/phase extraction.

The analysis front half of the pipeline (wav -> model input) is
  frames -> [cos GEMM, sin GEMM] -> log1p(sqrt(re^2+im^2)), atan2(im, re).
This kernel runs the two MXU GEMMs and the transcendental-heavy
mag/phase epilogue in one VMEM-resident pass per (frame-tile, bin-tile),
so the (re, im) intermediates never round-trip through HBM. The DC bin
is never computed: the DFT matrices cover bins 1..n_fft/2 (the pipeline
drops DC everywhere, reference: preproc_mdb.py:93), giving a 128-aligned
1024-lane output at the reference geometry.

Windowing and framing stay in the XLA prologue (a gather the compiler
fuses with the reflect pad); Mosaic's tiling rules make overlapped
framing from a flat signal row awkward in-kernel, and the gather is
bandwidth-trivial next to the GEMMs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phasegen_tpu.ops.stft import _check_length, frame_signal, hann_window


@functools.lru_cache(maxsize=8)
def _dft_nodc_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) forward DFT matrices for bins 1..n_fft/2, float32."""
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(1, n_fft // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def _atan_poly(x):
    """Cephes atanf: range-reduced polynomial, ~1e-7 abs error, VPU-only.

    Valid for x >= 0 (callers fold sign out). jnp.arctan2 does not lower
    in Pallas TPU (probed: NotImplementedError), hence this.
    """
    pio2 = jnp.float32(np.pi / 2)
    pio4 = jnp.float32(np.pi / 4)
    t3p8 = jnp.float32(2.414213562373095)  # tan(3*pi/8)
    sqrt2m1 = jnp.float32(0.4142135623730950)  # tan(pi/8)

    big = x > t3p8
    mid = jnp.logical_and(~big, x > sqrt2m1)
    xr = jnp.where(big, -1.0 / jnp.where(big, x, 1.0),
                   jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    base = jnp.where(big, pio2, jnp.where(mid, pio4, 0.0))
    z = xr * xr
    poly = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
             + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xr + xr
    return base + poly


def _atan2(y, x):
    """Vectorized atan2 from the atan polynomial + quadrant selects."""
    pi = jnp.float32(np.pi)
    pio2 = jnp.float32(np.pi / 2)
    safe_x = jnp.where(x == 0.0, 1.0, x)
    t = y / safe_x
    a = jnp.sign(t) * _atan_poly(jnp.abs(t))
    res = jnp.where(x > 0.0, a,
                    jnp.where(y >= 0.0, a + pi, a - pi))
    return jnp.where(x == 0.0, jnp.sign(y) * pio2, res)


def _analysis_kernel(f_ref, cos_ref, sin_ref, lm_ref, ph_ref):
    re = jnp.dot(f_ref[:], cos_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.dot(f_ref[:], sin_ref[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    lm_ref[:] = jnp.log1p(jnp.sqrt(re * re + im * im))
    ph_ref[:] = _atan2(im, re)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "center",
                                             "frame_tile", "bin_tile"))
def stft_logmag_phase_pallas(
    x: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    center: bool = True,
    frame_tile: int = 128,
    bin_tile: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Fused wav -> (log1p-mag, phase), DC dropped, bins-major.

    Args:
      x: (B, T) or (T,) float32 waveforms.
    Returns:
      (logmag, phase), each (B, n_fft//2, n_frames) float32.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    _check_length(x.shape[-1], n_fft, center)
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    b, t = x.shape
    nf = 1 + (t - n_fft) // hop
    n_bins = n_fft // 2

    win = hann_window(n_fft, jnp.float32)
    frames = (frame_signal(x.astype(jnp.float32), n_fft, hop)
              * win).reshape(b * nf, n_fft)

    n_rows = b * nf
    ft = min(frame_tile, n_rows)
    # pad rows to the tile grid (extra rows computed then dropped)
    rows_pad = -(-n_rows // ft) * ft - n_rows
    if rows_pad:
        frames = jnp.pad(frames, ((0, rows_pad), (0, 0)))
    if n_bins % 128 != 0:
        raise ValueError(f"n_fft//2 = {n_bins} must be a multiple of 128 "
                         "for the Pallas analysis kernel")
    # bin tile must divide n_bins exactly or trailing bins stay unwritten;
    # it must also be a positive multiple of 128 (lane width) — a
    # non-multiple request previously spun this loop forever (r3x review)
    bk = min(bin_tile, n_bins)
    if bk < 128 or bk % 128 != 0:
        raise ValueError(f"bin_tile {bin_tile} must be a positive "
                         "multiple of 128")
    while n_bins % bk != 0:
        bk -= 128

    cos_m, sin_m = _dft_nodc_np(n_fft)
    grid = ((n_rows + rows_pad) // ft, n_bins // bk)
    lm, ph = pl.pallas_call(
        _analysis_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ft, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ft, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ft, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows + rows_pad, n_bins), jnp.float32),
            jax.ShapeDtypeStruct((n_rows + rows_pad, n_bins), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (n_rows + rows_pad) * n_fft * n_bins,
            bytes_accessed=4 * ((n_rows + rows_pad) * (n_fft + 2 * n_bins)
                                + 2 * n_fft * n_bins),
            transcendentals=2 * (n_rows + rows_pad) * n_bins,
        ),
    )(frames, jnp.asarray(cos_m), jnp.asarray(sin_m))

    lm = lm[:n_rows].reshape(b, nf, n_bins)
    ph = ph[:n_rows].reshape(b, nf, n_bins)
    # bins-major pipeline layout
    lm = jnp.swapaxes(lm, -1, -2)
    ph = jnp.swapaxes(ph, -1, -2)
    if squeeze:
        lm, ph = lm[0], ph[0]
    return lm, ph


def stft_ri_pallas(x: jax.Array, n_fft: int = 2048, hop: int = 512,
                   center: bool = True) -> tuple[jax.Array, jax.Array]:
    """Compatibility wrapper: fused kernel, returning (re, im) bins-major.

    (re, im) = polar re-expansion of the fused kernel's (logmag, phase);
    prefer stft_logmag_phase_pallas, which is what the pipeline consumes.
    """
    lm, ph = stft_logmag_phase_pallas(x, n_fft, hop, center)
    mag = jnp.expm1(lm)
    return mag * jnp.cos(ph), mag * jnp.sin(ph)
