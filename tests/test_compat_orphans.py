"""Parity tests for the reference's cycleGAN-era utilities
(reference: utils.py:145-262) and get_gid (preproc_mdb.py:99-103),
provided as functional jnp/numpy equivalents in compat.py, plus the
finite-audio write guard (utils.py:41,131 parity)."""

import numpy as np
import pytest

from phasegen_tpu import compat
from phasegen_tpu.data.audio_io import write_wav


def test_view_flatten_transpose():
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    assert compat.View(2, 12)(x).shape == (2, 12)
    assert compat.View(-1,)(x).shape == (24,)
    f = compat.Flatten()(x)
    assert f.shape == (2, 12)
    np.testing.assert_array_equal(np.asarray(f)[0], x[0].ravel())
    t = compat.Transpose(1, 2)(x)
    assert t.shape == (2, 4, 3)
    np.testing.assert_array_equal(np.asarray(t), x.swapaxes(1, 2))


def test_gan_loss_lsgan_semantics():
    loss = compat.GANLoss()
    pred = np.full((4, 8), 0.5, np.float32)
    # MSE vs all-ones / all-zeros labels (reference: utils.py:185-213)
    assert float(loss(pred, True)) == pytest.approx(0.25)
    assert float(loss(pred, False)) == pytest.approx(0.25)
    loss2 = compat.GANLoss(real_label=0.9, fake_label=0.1)
    assert float(loss2(pred, True)) == pytest.approx(0.16)
    assert float(loss2(pred, False)) == pytest.approx(0.16)


def test_pool_fill_then_swap():
    pool = compat.Pool(pool_size=4, seed=0)
    first = np.arange(4, dtype=np.float32).reshape(4, 1)
    out = pool.draw(first)
    # while filling, samples pass through unchanged
    np.testing.assert_array_equal(out, first)
    assert pool.n == 4
    # after filling, each draw returns pool_size rows from {new, pooled}
    second = np.arange(10, 14, dtype=np.float32).reshape(4, 1)
    out2 = pool.draw(second)
    assert out2.shape == (4, 1)
    universe = set(range(4)) | set(range(10, 14))
    assert all(float(v) in universe for v in out2.ravel())
    got = pool.get_samples(6)
    assert got.shape == (6, 1)


def test_pool_size_zero_passthrough_and_empty_raises():
    pool = compat.Pool(pool_size=0)
    x = np.ones((3, 2), np.float32)
    np.testing.assert_array_equal(pool.draw(x), x)
    with pytest.raises(ValueError):
        compat.Pool(pool_size=2).get_samples(1)


def test_get_gid():
    assert compat.get_gid("Pop", ["Rock", "Pop"]) == 1
    with pytest.raises(ValueError):
        compat.get_gid("Jazz", ["Rock", "Pop"])


def test_valid_audio_and_write_wav_guard(tmp_path):
    good = np.zeros(64, np.float32)
    assert compat.valid_audio(good) is not None
    with pytest.raises(ValueError):
        compat.valid_audio(np.array([1.0, np.nan], np.float32))
    with pytest.raises(ValueError):
        compat.valid_audio(np.array([1, 2], np.int16))
    bad = good.copy()
    bad[3] = np.inf
    with pytest.raises(ValueError):
        write_wav(str(tmp_path / "bad.wav"), bad, 16000)
    write_wav(str(tmp_path / "good.wav"), good, 16000)  # no raise


def test_normalize_per_cell_standardization():
    """compat.normalize: each [i, j] cell standardized independently
    (reference: data.py:33-37), functional (input not mutated)."""
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.0, size=(2, 2, 8, 5)).astype(np.float32)
    x_orig = x.copy()
    out = compat.normalize(x)
    np.testing.assert_array_equal(x, x_orig)  # no in-place mutation
    for i in range(2):
        for j in range(2):
            cell = out[i, j]
            assert abs(cell.mean()) < 1e-5
            np.testing.assert_allclose(cell.std(), 1.0, rtol=1e-5)
            # same transform as the reference's (x - mean)/std per cell
            ref = (x[i, j] - x[i, j].mean()) / x[i, j].std()
            np.testing.assert_allclose(cell, ref, atol=1e-5)


def test_get_real_and_imag():
    """compat.get_real_and_imag (reference: data.py:49-59)."""
    rng = np.random.default_rng(1)
    c = (rng.normal(size=(3, 1, 4, 5))
         + 1j * rng.normal(size=(3, 1, 4, 5))).astype(np.complex64)
    out = compat.get_real_and_imag(c, norm=False)
    assert out.shape == (3, 2, 4, 5)
    np.testing.assert_allclose(out[:, :1], c.real, atol=1e-6)
    np.testing.assert_allclose(out[:, 1:], c.imag, atol=1e-6)

    # norm=True: real/imag each globally standardized (data._norm)
    outn = compat.get_real_and_imag(c, norm=True)
    np.testing.assert_allclose(outn[:, :1].mean(), 0.0, atol=1e-5)
    np.testing.assert_allclose(outn[:, :1].std(), 1.0, rtol=1e-4)

    # non-complex input passes through unchanged
    f = rng.normal(size=(2, 2, 4, 5)).astype(np.float32)
    np.testing.assert_array_equal(compat.get_real_and_imag(f, True), f)
