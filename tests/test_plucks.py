"""Structured pluck synthesis tests."""

import numpy as np

from phasegen_tpu.data.plucks import pluck_dataset, synth_plucks


def test_plucks_shape_and_range():
    w = synth_plucks(3, t_samples=8000, seed=0)
    assert w.shape == (3, 8000)
    assert np.abs(w).max() <= 1.0 + 1e-6
    assert np.isfinite(w).all()
    # plucks decay: energy in the last 10% differs from a stationary tone
    assert w.std(axis=1).min() > 0


def test_pluck_dataset_layout():
    d = pluck_dataset(2, n_fft=32, hop=8, t_samples=127 * 8)
    assert d.shape == (2, 2, 16, 128)
    assert abs(d.mean()) < 1e-4 and abs(d.std() - 1.0) < 1e-3


def test_plucks_have_onset_structure():
    # magnitude energy must be time-varying (onsets visible to the model)
    d = pluck_dataset(4, n_fft=32, hop=8, t_samples=127 * 8,
                      standardize=False)
    mag = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)  # (N, F, T)
    frame_energy = mag.sum(axis=1)  # (N, T)
    ratio = frame_energy.max(axis=1) / (frame_energy.mean(axis=1) + 1e-9)
    assert (ratio > 1.5).all()  # peaky in time, unlike stationary mixtures
