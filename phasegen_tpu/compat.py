"""Reference-API compatibility layer.

Thin wrappers exposing this framework's functionality under the
reference's names and call signatures (reference: utils.py, data.py,
logger.py), so a user of the reference can switch imports and keep their
code. Each wrapper delegates to the TPU-native implementation.

Mapping:
  utils.generate_audio      -> compat.generate_audio   (ops.dft ISTFT)
  utils.griffin_lim         -> compat.griffin_lim      (ops.griffin_lim, jitted)
  utils.generate_spec_img   -> compat.generate_spec_img (obs.spec_image)
  utils.generate_waveplot   -> compat.generate_waveplot (obs.spec_image.wave_image)
  utils.EnergyLoss          -> compat.EnergyLoss       (functional, jnp)
  data.get_fft_npy_loader   -> compat.get_fft_npy_loader (data.loader)
  data.get_spec_and_angle   -> compat.get_spec_and_angle (data.loader)
  logger.Logger             -> obs.Logger (already same surface)

Intentionally absent (dead in the reference, SURVEY.md §2.6): the
cycleGAN-era View/Flatten/Transpose/GANLoss/Pool helpers — they serve an
absent module (reference: demo.py:5 imports a missing cycleGAN.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from phasegen_tpu.data.loader import NpyPatchLoader, get_spec_and_angle  # noqa: F401
from phasegen_tpu.obs.logger import Logger  # noqa: F401
from phasegen_tpu.obs.spec_image import spec_image, wave_image
from phasegen_tpu.ops import griffin_lim as _gl_jit
from phasegen_tpu.ops.dft import istft_ri
from phasegen_tpu.ops.stft import add_dc, normalize_inf


def generate_audio(spec, sr=None, hop_length: int = 512, is_stft: bool = False):
    """Reference utils.generate_audio (utils.py:11-44): DC-dropped complex
    spectrogram (or stacked [real, imag]) -> normalized audio via ISTFT.

    ``sr`` is accepted for signature parity; the reference never uses it.
    """
    spec = np.asarray(spec)
    if not is_stft:
        spec = spec[0] + 1j * spec[1]
    re = jnp.asarray(spec.real, jnp.float32)
    im = jnp.asarray(spec.imag, jnp.float32)
    n_fft = 2 * spec.shape[0]  # DC-dropped bins -> n_fft
    audio = istft_ri(add_dc(re), add_dc(im), n_fft=n_fft, hop=hop_length)
    return np.asarray(normalize_inf(audio))


def griffin_lim(spec, n_fft: int = 2048, hop_length: int = 512,
                n_iter: int = 250, seed: int = 0):
    """Reference utils.griffin_lim (utils.py:85-134), device-jitted.

    Args:
      spec: DC-dropped linear magnitude (n_fft//2, T).
    Returns:
      (audio, final complex spectrogram, last-iteration RMSE) — the
      reference's triple.
    """
    import jax

    audio, final, loss = _gl_jit(jnp.asarray(spec, jnp.float32), n_fft,
                                 hop_length, n_iter,
                                 key=jax.random.PRNGKey(seed))
    re, im = np.asarray(final.real), np.asarray(final.imag)
    return np.asarray(audio), re + 1j * im, float(loss)


def generate_spec_img(spec, is_stft: bool = False, is_amp: bool = False):
    """Reference utils.generate_spec_img (utils.py:46-83)."""
    spec = np.asarray(spec)
    if not is_amp and not is_stft:
        spec = spec[0] + 1j * spec[1]
    return spec_image(np.abs(spec), is_mag=True)


def generate_waveplot(audio, sr: int):
    """Reference utils.generate_waveplot (utils.py:136-143)."""
    return wave_image(np.asarray(audio), sr)


class EnergyLoss:
    """Reference utils.EnergyLoss (utils.py:170-182): MSE between
    sqrt(re^2 + im^2 + eps) amplitudes of (B, 2, ...) stacks."""

    def __init__(self, eps: float = 1e-10):
        self.eps = eps

    def _amp(self, a):
        return jnp.sqrt(a[:, 0] ** 2 + a[:, 1] ** 2 + self.eps)

    def __call__(self, a, b):
        return jnp.mean((self._amp(jnp.asarray(a))
                         - self._amp(jnp.asarray(b))) ** 2)


def get_fft_npy_loader(paths, labels=None, batch_size: int = 1,
                       norm: bool = True, precon: bool = False):
    """Reference data.get_fft_npy_loader (data.py:7-28).

    ``norm`` is accepted-but-unused, faithfully (reference: data.py:7).
    Returns an iterable of (batch, labels) like the torch DataLoader did.
    """
    if labels is None:
        labels = [0]
    if not isinstance(paths, list):
        paths = [paths]
    return NpyPatchLoader(paths, labels=labels, batch_size=batch_size,
                          precon=precon, drop_ragged=False)
