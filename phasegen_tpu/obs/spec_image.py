"""Spectrogram image rendering for TensorBoard (reference: utils.py:46-83).

Renders a dB-scaled spectrogram to an HWC uint8 RGB array via matplotlib
Agg. ``amplitude_to_db`` reproduces librosa's conversion (ref-relative,
top_db clamp) without the librosa dependency.
"""

from __future__ import annotations

import numpy as np


def amplitude_to_db(mag: np.ndarray, ref: float | None = None,
                    amin: float = 1e-5, top_db: float = 80.0) -> np.ndarray:
    """20*log10(|mag|) relative to ``ref`` (default: max), clamped to
    ``top_db`` below the peak — librosa.amplitude_to_db semantics."""
    mag = np.abs(np.asarray(mag, np.float32))
    if ref is None:
        ref = float(mag.max()) or 1.0
    db = 20.0 * np.log10(np.maximum(amin, mag))
    db -= 20.0 * np.log10(max(amin, ref))
    return np.maximum(db, db.max() - top_db)


def spec_image(spec: np.ndarray, is_mag: bool = True,
               figsize=(3, 2)) -> np.ndarray:
    """(F, T) magnitude (or complex) spectrogram -> HWC uint8 RGB image."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    db = amplitude_to_db(spec if is_mag else np.abs(spec))
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111)
    im = ax.imshow(db, origin="lower", aspect="auto", cmap="magma")
    fig.colorbar(im, ax=ax)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def phase_error_image(err: np.ndarray, vmax: float = np.pi,
                      figsize=(3, 2)) -> np.ndarray:
    """(F, T) circular phase error [0, pi] -> HWC uint8 RGB image.

    Linear scale (not dB): phase error is already bounded, and the
    interesting structure is where it is small. The reference logs three
    pixel-identical magnitude renders here (reference: train.py:87-89 via
    phase-invariant amplitude_to_db); this image is the diagnostic
    replacement — bright = bins where the predicted phase is wrong."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111)
    im = ax.imshow(np.asarray(err, np.float32), origin="lower",
                   aspect="auto", cmap="inferno", vmin=0.0, vmax=vmax)
    fig.colorbar(im, ax=ax)
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def wave_image(audio: np.ndarray, sr: int, figsize=(3, 2)) -> np.ndarray:
    """Waveform plot -> HWC uint8 RGB (reference: utils.py:136-143)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111)
    t = np.arange(len(audio)) / sr
    ax.plot(t, audio, linewidth=0.5)
    ax.set_xlabel("s")
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img
