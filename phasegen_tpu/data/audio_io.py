"""Waveform I/O and resampling without librosa.

librosa is not part of this framework's dependency set; WAV I/O goes
through scipy (float/PCM support both ways) and resampling is polyphase
(scipy.signal.resample_poly with a Kaiser window), the same family of
resampler the reference invokes via librosa.resample
(reference: preproc_mdb.py:114).
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def read_wav(path: str, mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 audio in [-1, 1], sample_rate).

    Multi-channel audio is averaged to mono when ``mono`` (librosa.load
    default behavior, used by the reference at preproc_mdb.py:112).
    """
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if mono and audio.ndim > 1:
        audio = audio.mean(axis=1)
    return audio, int(sr)


def write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    """Write float32 WAV (librosa.output.write_wav parity, demo.py:43).

    Validates finiteness first, mirroring the reference's
    librosa.util.valid_audio guard (reference: utils.py:41,131) — a NaN
    from a diverged model must fail loudly, not land in a WAV.
    """
    audio = np.asarray(audio, np.float32)
    if not np.isfinite(audio).all():
        raise ValueError(f"refusing to write non-finite audio to {path}")
    wavfile.write(path, sr, audio)


def resample(x: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis (Kaiser-windowed sinc)."""
    if orig_sr == target_sr:
        return np.asarray(x, np.float32)
    g = math.gcd(orig_sr, target_sr)
    out = resample_poly(x, target_sr // g, orig_sr // g, axis=-1,
                        window=("kaiser", 12.9846))
    return np.asarray(out, np.float32)
