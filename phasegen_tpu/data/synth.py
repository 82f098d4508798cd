"""Synthetic audio + dataset shards in the reference's npy layout.

Used by tests and benchmarks when MedleyDB assets are unavailable. The
output matches the reference preprocessing exactly: (N, 2, n_fft//2, T)
float32 real/imag STFT patches with the DC bin removed and global
standardization (reference: preproc_mdb.py:84-97,182).

Host-side numpy implementation (librosa-convention STFT, validated in
tests against ops/stft.py), so shard generation needs no device.
"""

from __future__ import annotations

import numpy as np


def _hann(n_fft: int) -> np.ndarray:
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
            ).astype(np.float32)


def np_stft(x: np.ndarray, n_fft: int = 2048, hop: int = 512) -> np.ndarray:
    """Center-padded, Hann-windowed one-sided STFT -> (F, T) complex64."""
    x = np.pad(x, n_fft // 2, mode="reflect")
    nf = 1 + (len(x) - n_fft) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * _hann(n_fft)
    return np.fft.rfft(frames, n=n_fft, axis=-1).T.astype(np.complex64)


def synth_waveforms(n: int, t_samples: int = 65024, sr: int = 16000,
                    seed: int = 0, n_partials: int = 6) -> np.ndarray:
    """(n, t_samples) float32 random harmonic mixtures with AM envelopes.

    Harmonic content (fundamentals 80-2000 Hz with overtone stacks) gives
    Griffin-Lim and the U-Net structured phase to recover — closer to
    music than white noise.
    """
    rng = np.random.default_rng(seed)
    t = np.arange(t_samples) / sr
    out = np.zeros((n, t_samples), np.float32)
    for i in range(n):
        f0 = rng.uniform(80.0, 2000.0)
        for h in range(1, n_partials + 1):
            f = f0 * h
            if f >= sr / 2:
                break
            amp = rng.uniform(0.1, 1.0) / h
            ph = rng.uniform(0, 2 * np.pi)
            env = 1.0 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.3, 3.0) * t
                                     + rng.uniform(0, 2 * np.pi))
            out[i] += (amp * env * np.sin(2 * np.pi * f * t + ph)).astype(
                np.float32)
        out[i] /= max(1e-6, np.abs(out[i]).max())
    return out


def synth_dataset(n: int, n_fft: int = 2048, hop: int = 512,
                  t_samples: int = 65024, sr: int = 16000, seed: int = 0,
                  standardize: bool = True) -> np.ndarray:
    """(N, 2, n_fft//2, T) float32 shards in the reference preproc layout."""
    wavs = synth_waveforms(n, t_samples, sr, seed)
    out = []
    for w in wavs:
        spec = np_stft(w, n_fft, hop)[1:]  # drop DC (preproc_mdb.py:93)
        out.append(np.stack([spec.real, spec.imag]).astype(np.float32))
    arr = np.asarray(out, np.float32)
    if standardize:
        arr = (arr - arr.mean()) / arr.std()  # (preproc_mdb.py:182)
    return arr
