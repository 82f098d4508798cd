"""Pallas kernel correctness in interpreter mode (CPU test backend).

The same kernels run compiled on real TPU hardware (validated in the
bench/verify drives); interpret mode checks the kernel logic — grids,
block index maps, scratch accumulation, the in-kernel atan2 — without
Mosaic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import phasegen_tpu.ops.pallas.istft_fused as istft_mod
import phasegen_tpu.ops.pallas.stft_fused as stft_mod
from phasegen_tpu.ops.dft import istft_ri, logmag_phase_ri, stft_ri
from phasegen_tpu.ops.stft import add_dc, drop_dc

N_FFT, HOP = 512, 128
T = 127 * HOP + 1  # a few frames


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # route pl.pallas_call through the interpreter on CPU
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(stft_mod.pl, "pallas_call", interp_call)
    monkeypatch.setattr(istft_mod.pl, "pallas_call", interp_call)
    yield


def _x(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, T)) * 0.1).astype(np.float32)


def test_atan2_poly_accuracy():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    ours = np.asarray(stft_mod._atan2(y, x))
    golden = np.arctan2(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(ours, golden, atol=2e-6)
    # axis cases
    for yy, xx in [(0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0),
                   (0.0, 0.0)]:
        o = float(stft_mod._atan2(jnp.float32(yy), jnp.float32(xx)))
        assert abs(o - np.arctan2(yy, xx)) < 2e-6


def test_analysis_kernel_matches_xla():
    x = jnp.asarray(_x())
    lm_p, ph_p = stft_mod.stft_logmag_phase_pallas(
        x, N_FFT, HOP, frame_tile=64, bin_tile=128)

    re, im = stft_ri(x, N_FFT, HOP)
    lm_g, ph_g = logmag_phase_ri(drop_dc(re), drop_dc(im))

    np.testing.assert_allclose(np.asarray(lm_p), np.asarray(lm_g), atol=1e-4)
    mask = np.expm1(np.asarray(lm_g)) > 1e-3
    dphi = np.angle(np.exp(1j * (np.asarray(ph_p) - np.asarray(ph_g))))
    assert np.abs(dphi[mask]).max() < 1e-4


def test_analysis_kernel_row_padding():
    # b*nf not a multiple of frame_tile exercises the pad/drop path
    x = jnp.asarray(_x(b=1))
    lm_p, _ = stft_mod.stft_logmag_phase_pallas(
        x, N_FFT, HOP, frame_tile=128, bin_tile=256)
    re, im = stft_ri(x, N_FFT, HOP)
    lm_g, _ = logmag_phase_ri(drop_dc(re), drop_dc(im))
    np.testing.assert_allclose(np.asarray(lm_p), np.asarray(lm_g), atol=1e-4)


def test_istft_kernel_matches_xla():
    x = jnp.asarray(_x(seed=3))
    re, im = stft_ri(x, N_FFT, HOP)
    re_d, im_d = drop_dc(re), drop_dc(im)

    golden = np.asarray(istft_ri(add_dc(re_d), add_dc(im_d), N_FFT, HOP))
    ours = np.asarray(istft_mod.istft_ri_pallas(re_d, im_d, N_FFT, HOP,
                                                fft_tile=128))
    # vs the XLA ISTFT of the same DC-dropped pair (exact contract; white
    # noise does NOT roundtrip to x because the dropped DC bin carries
    # real energy for broadband signals — by design, preproc_mdb.py:93)
    np.testing.assert_allclose(ours, golden, atol=1e-4)
    assert ours.shape == golden.shape


def test_istft_kernel_rejects_full_band():
    x = jnp.asarray(_x(seed=4))
    re, im = stft_ri(x, N_FFT, HOP)  # 257 bins incl. DC
    with pytest.raises(ValueError):
        istft_mod.istft_ri_pallas(re, im, N_FFT, HOP)
