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
  utils.View/Flatten/Transpose -> compat.View/Flatten/Transpose (jnp)
  utils.GANLoss             -> compat.GANLoss (functional, jnp)
  utils.Pool                -> compat.Pool (numpy replay buffer)
  data.normalize/_norm      -> compat.normalize/_norm (functional)
  data.get_real_and_imag    -> compat.get_real_and_imag
  preproc_mdb.get_gid       -> compat.get_gid
  model.UNetModel           -> compat.UNetModel (functional core; .load
                               also reads reference torch checkpoints)

The cycleGAN-era helpers (View/Flatten/Transpose/GANLoss/Pool) are dead
on the reference's live paths — they serve an absent module (reference:
demo.py:5 imports a missing cycleGAN.py) — but are provided here as
functional jnp/numpy equivalents for full component parity.
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


def valid_audio(audio) -> np.ndarray:
    """Finiteness/shape check before writing audio, mirroring the
    reference's librosa.util.valid_audio call (reference: utils.py:41,131).

    Returns the array (float32, 1-D or 2-D) or raises ValueError.
    """
    audio = np.asarray(audio)
    if audio.ndim not in (1, 2) or audio.size == 0:
        raise ValueError(f"audio must be non-empty 1-D/2-D, got {audio.shape}")
    if not np.issubdtype(audio.dtype, np.floating):
        raise ValueError(f"audio must be float, got {audio.dtype}")
    if not np.isfinite(audio).all():
        raise ValueError("audio contains NaN/Inf samples")
    return audio


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
    return valid_audio(np.asarray(normalize_inf(audio)))


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


class View:
    """Reference utils.View (utils.py:145-151): reshape to a fixed shape."""

    def __init__(self, *shape):
        self.shape = shape

    def __call__(self, x):
        return jnp.reshape(jnp.asarray(x), self.shape)


class Flatten:
    """Reference utils.Flatten (utils.py:154-159): (B, ...) -> (B, -1)."""

    def __call__(self, x):
        x = jnp.asarray(x)
        return jnp.reshape(x, (x.shape[0], -1))


class Transpose:
    """Reference utils.Transpose (utils.py:161-167): swap two axes."""

    def __init__(self, dim0: int, dim1: int):
        self.dim0, self.dim1 = dim0, dim1

    def __call__(self, x):
        return jnp.swapaxes(jnp.asarray(x), self.dim0, self.dim1)


class GANLoss:
    """Reference utils.GANLoss (utils.py:185-213): LSGAN-style MSE against
    a constant real/fake label. The reference caches label tensors to
    avoid re-allocation — unnecessary under XLA, where the broadcast
    constant folds into the compiled graph."""

    def __init__(self, real_label: float = 1.0, fake_label: float = 0.0):
        self.real_label = real_label
        self.fake_label = fake_label

    def __call__(self, pred, is_real: bool):
        pred = jnp.asarray(pred)
        target = self.real_label if is_real else self.fake_label
        return jnp.mean((pred - target) ** 2)


class Pool:
    """Reference utils.Pool (utils.py:216-262): CycleGAN replay buffer.

    Fills to ``pool_size``; thereafter each incoming sample has a 50%
    chance of being swapped with (and the evictee returned in place of) a
    random pooled sample. Host-side numpy — this is data-pipeline state,
    not device compute.
    """

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.n = 0
        self.samples: list[np.ndarray] = []
        self._rng = np.random.default_rng(seed)

    def draw(self, samples):
        samples = np.asarray(samples)
        if self.pool_size == 0:
            return samples
        drawn = []
        for s in samples:
            s = s[None]
            if self.n < self.pool_size:
                self.n += 1
                self.samples.append(s)
                drawn.append(s)
            elif self._rng.uniform() > 0.5:
                ind = int(self._rng.integers(0, self.pool_size))
                old = self.samples[ind]
                self.samples[ind] = s
                drawn.append(old)
            else:
                drawn.append(s)
        return np.concatenate(drawn, 0)

    def get_samples(self, n_sample: int):
        if self.n == 0:
            raise ValueError("Empty pool!")
        if self.n == 1:
            return self.samples[0]
        idx = self._rng.integers(0, self.n, size=n_sample)
        return np.concatenate([self.samples[int(i)] for i in idx], 0)


def _norm(data):
    """Reference data._norm (data.py:30-31): global standardize."""
    data = jnp.asarray(data, jnp.float32)
    return np.asarray((data - jnp.mean(data)) / jnp.std(data))


def normalize(data):
    """Reference data.normalize (data.py:33-37): standardize each
    data[i, j] cell independently (dead on the reference's live paths).

    Functional: returns a new array instead of mutating in place — the
    reference writes back into its input, which cannot survive jit and
    was only ever used on host numpy buffers.
    """
    data = np.array(data, dtype=np.float32)  # copy; reference mutates
    flat = data.reshape(data.shape[0] * data.shape[1], -1)
    mean = flat.mean(axis=1, keepdims=True)
    std = flat.std(axis=1, keepdims=True)
    return ((flat - mean) / std).reshape(data.shape)


def get_real_and_imag(data, norm: bool = False):
    """Reference data.get_real_and_imag (data.py:49-59): complex64 array ->
    concat(real, imag) along axis 1, optionally globally standardized.
    Non-complex input passes through unchanged, as in the reference."""
    data = np.asarray(data)
    if data.dtype != np.complex64:
        return data
    real, imag = np.real(data), np.imag(data)
    if norm:
        real, imag = _norm(real), _norm(imag)
    return np.concatenate([real, imag], axis=1)


def get_gid(genre: str, genres) -> int:
    """Reference preproc_mdb.get_gid (preproc_mdb.py:99-103): genre name ->
    index in the --genres list."""
    for i, g in enumerate(genres):
        if g == genre:
            return i
    raise ValueError(f"Undefined genre: {genre!r}")


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


class UNetModel:
    """Reference model.UNetModel drop-in (reference: model.py:22-54).

    Wraps the functional U-Net (models/unet.py) behind the reference's
    object surface: ``forward(x)`` (also ``__call__``), ``save(path)``,
    ``load(path)``. ``gpu_ids`` is accepted and ignored — parallelism
    here is mesh-based (parallel/), not DataParallel. ``norm_layer``
    accepts the strings "batch"/"instance"/"none" or any torch-style
    class whose name contains "InstanceNorm".

    ``load`` additionally accepts the reference's own torch checkpoints
    (``ckpt_{cnt}`` state_dict files) via torch_ckpt.py, so reference
    users keep their trained weights — see docs/MIGRATION.md.
    """

    def __init__(self, input_nc: int, output_nc: int, norm_layer="batch",
                 gpu_ids=(), seed: int = 0, extra_depth: int = 0,
                 compute_dtype=jnp.float32):
        import jax

        from phasegen_tpu.models.unet import UNetConfig, unet_init

        if not isinstance(norm_layer, str):
            name = getattr(norm_layer, "__name__",
                           getattr(getattr(norm_layer, "func", None),
                                   "__name__", "batch"))
            norm_layer = "instance" if "InstanceNorm" in str(name) else "batch"
        self.cfg = UNetConfig(input_nc=input_nc, output_nc=output_nc,
                              norm=norm_layer, extra_depth=extra_depth,
                              compute_dtype=compute_dtype)
        self.gpu_ids = tuple(gpu_ids)  # accepted, unused (mesh parallelism)
        self.params, self.norm_state = unet_init(jax.random.PRNGKey(seed),
                                                 self.cfg)

    def forward(self, x, training: bool = False):
        """(B, input_nc, L) -> (B, output_nc, L) numpy float32.

        Eval mode by default (the reference's val/demo usage); training
        mode updates the wrapped BatchNorm running statistics in place.
        """
        from phasegen_tpu.models.unet import unet_apply_jit

        y, new_state = unet_apply_jit(self.params, self.norm_state,
                                      jnp.asarray(np.asarray(x), jnp.float32),
                                      self.cfg, training)
        if training:
            self.norm_state = new_state
        return np.asarray(y, dtype=np.float32)

    __call__ = forward

    def save(self, path: str) -> None:
        from phasegen_tpu.train.checkpoint import save_params_npz

        save_params_npz(path, self.params, self.norm_state)

    def load(self, path: str) -> None:
        import os

        path = str(path)
        # np.savez appends ".npz" at save time, so the reference's own
        # extension-less save/load pattern (model.save("ckpt_100") then
        # model.load("ckpt_100"), reference: train.py:127, demo.py:26)
        # must resolve to the file save() actually wrote.
        if (not path.endswith(".npz") and not os.path.exists(path)
                and os.path.exists(path + ".npz")):
            path += ".npz"
        if path.endswith(".npz"):
            from phasegen_tpu.train.checkpoint import load_params_npz

            params, norm_state = load_params_npz(
                path, self.params, norm_template=self.norm_state)
            self.params = params
            if norm_state is not None:
                self.norm_state = norm_state
            return
        from phasegen_tpu.torch_ckpt import load_torch_checkpoint

        self.params, self.norm_state = load_torch_checkpoint(path, self.cfg)
