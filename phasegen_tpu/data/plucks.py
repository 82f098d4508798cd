"""Structured synthetic audio: plucked damped harmonics.

Unlike random-phase harmonic mixtures (data/synth.py) — whose phase is
unpredictable from magnitude by construction — plucks have *learnable*
phase: every partial starts at its onset with phase zero and evolves
deterministically, and the onsets/frequencies are visible in the
magnitude spectrogram. This is the synthetic stand-in for the structure
(percussive onsets, harmonic stacks) that makes the reference's task
well-posed on music.
"""

from __future__ import annotations

import numpy as np

from phasegen_tpu.data.synth import np_stft


def synth_plucks(n: int, t_samples: int = 65024, sr: int = 16000,
                 seed: int = 0, max_plucks: int = 8) -> np.ndarray:
    """(n, t_samples) float32 clips of overlapping plucked notes."""
    rng = np.random.default_rng(seed)
    t = np.arange(t_samples) / sr
    out = np.zeros((n, t_samples), np.float32)
    for i in range(n):
        for _ in range(rng.integers(3, max_plucks + 1)):
            onset = rng.uniform(0.0, 0.8 * t_samples / sr)
            f0 = rng.uniform(110.0, 1200.0)
            tau = rng.uniform(0.08, 0.4)
            amp = rng.uniform(0.2, 1.0)
            tt = t - onset
            env = (tt >= 0) * np.exp(-np.maximum(tt, 0.0) / tau)
            for h in range(1, 5):
                f = f0 * h
                if f >= sr / 2:
                    break
                out[i] += (amp / h * env
                           * np.sin(2 * np.pi * f * tt)).astype(np.float32)
        peak = np.abs(out[i]).max()
        if peak > 0:
            out[i] /= peak
    return out


def pluck_dataset(n: int, n_fft: int = 2048, hop: int = 512,
                  t_samples: int = 65024, sr: int = 16000, seed: int = 0,
                  standardize: bool = True) -> np.ndarray:
    """(N, 2, n_fft//2, T) shards in the reference preproc layout."""
    wavs = synth_plucks(n, t_samples, sr, seed)
    out = []
    for w in wavs:
        spec = np_stft(w, n_fft, hop)[1:]
        out.append(np.stack([spec.real, spec.imag]).astype(np.float32))
    arr = np.asarray(out, np.float32)
    if standardize:
        arr = (arr - arr.mean()) / arr.std()
    return arr
