"""Griffin-Lim phase reconstruction as a single jitted XLA loop.

The reference's Griffin-Lim (reference: utils.py:85-134) is a 250-iteration
Python loop of numpy/librosa stft/istft on the host — the slow baseline its
U-Net exists to beat (reference: demo.py:48-60). Here the whole iteration
runs device-side as one ``lax.fori_loop`` over jitted STFT/ISTFT, so a
"250-iter GL" is one XLA executable: no host round-trips, FFTs batched on
the TPU.

Semantics: the input magnitude is the DC-dropped (n_fft//2 bins) linear
spectrogram the pipeline carries everywhere; we re-insert a zero DC row
before each ISTFT and drop it after each STFT, mirroring the reference's
data contract (reference: utils.py:121, preproc_mdb.py:93). Phase is
initialized from a random waveform like the reference (utils.py:116).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phasegen_tpu.ops.stft import add_dc, drop_dc, istft, normalize_inf, stft


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_iter",
                                             "dc_dropped", "normalize"))
def griffin_lim(
    mag: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    n_iter: int = 250,
    key: jax.Array | None = None,
    dc_dropped: bool = True,
    init: jax.Array | None = None,
    normalize: bool = True,
):
    """Reconstruct audio from a magnitude spectrogram.

    Args:
      mag: linear magnitude, (..., F, T) where F = n_fft//2 (DC dropped,
        the pipeline's native layout) or n_fft//2+1 (full band).
      key: PRNG key for the random initial waveform.
      init: optional initial waveform (..., hop*(T-1)) to refine instead
        of the random start — e.g. the U-Net's predicted-phase hybrid
        reconstruction, turning GL into a cheap phase polish
        (benchmarks/gl_refine.py measures the quality/iteration trade).
      normalize: peak-normalize the returned audio (the reference's
        semantics, utils.py:134). ``False`` keeps the magnitude-consistent
        ISTFT amplitude — required when the caller splices the result
        against other unnormalized ISTFT output (infer/stream.py).
    Returns:
      (audio, spec, loss): audio (..., T_samples) — infinity-normalized
      unless ``normalize=False`` — the final complex spectrogram, and the
      last-iteration waveform RMSE, the same triple as the reference
      (utils.py:134).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    mag = mag.astype(jnp.float32)
    full = add_dc(mag) if dc_dropped else mag
    nf = full.shape[-1]
    out_len = hop * (nf - 1)  # centered ISTFT length

    if init is None:
        recon = jax.random.normal(key, (*mag.shape[:-2], out_len),
                                  jnp.float32)
    else:
        recon = init.astype(jnp.float32)

    def body(_, carry):
        recon, _ = carry
        spec = drop_dc(stft(recon, n_fft=n_fft, hop=hop))
        phase = jnp.angle(spec)
        new_spec = mag * jnp.exp(1j * phase.astype(jnp.complex64))
        new = istft(add_dc(new_spec), n_fft=n_fft, hop=hop)
        loss = jnp.sqrt(jnp.sum((new - recon) ** 2) / new.size)
        return new, loss

    recon, loss = jax.lax.fori_loop(0, n_iter, body, (recon, jnp.float32(0)))

    phase = jnp.angle(drop_dc(stft(recon, n_fft=n_fft, hop=hop)))
    final_spec = mag * jnp.exp(1j * phase.astype(jnp.complex64))
    if normalize:
        # per-CLIP peak normalization for batched input — the reference
        # normalizes each clip in its host loop (utils.py:134), and the
        # validation metrics compare against per-clip-normalized
        # references. A global batch max here under-scaled every clip
        # quieter than the batch's loudest; for phase-misaligned audio
        # MAE DECREASES as the output is scaled down, so that bias
        # flattered LMSE/MSE_refineK (re-measured in BASELINE.md r4:
        # GL-250 LMSE 0.12709 -> 0.15069 on the same shard).
        recon = normalize_inf(recon, axis=-1 if recon.ndim > 1 else None)
    return recon, final_spec, loss
