"""Fused inference: waveform -> STFT -> U-Net phase -> ISTFT, one XLA graph.

The reference's demo path crosses the host/device boundary four times per
clip (forward on GPU, complex rebuild + ISTFT in numpy on host, reference:
demo.py:33-44). Here the entire resynthesis is a single jitted graph on
the TPU: GEMM-native STFT, U-Net forward, polar reconstruction with the
*true* magnitude + *predicted* phase (reference: demo.py:39), zero-DC
re-insertion, and GEMM-native ISTFT — no complex dtype, no host round
trips, batched over clips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phasegen_tpu.models.unet import UNetConfig, unet_apply
from phasegen_tpu.ops.dft import istft_ri, logmag_phase_ri, polar_to_ri, stft_ri
from phasegen_tpu.ops.stft import add_dc, drop_dc, normalize_inf


def wav_to_patch_fn(n_fft: int = 2048, hop: int = 512,
                    use_pallas: bool | None = None):
    """Returns a jittable fn: waveform (B, T) -> (logmag, phase) patches.

    Output shape (B, n_fft//2, n_frames) each — DC dropped, matching the
    preprocessing contract (reference: preproc_mdb.py:93, data.py:39-47).

    use_pallas: None = auto — the fused Pallas analysis kernel on TPU for
    batches <= 64 (A/B: ~5x faster device-side at B=32; at B=128 XLA's
    GEMM path edges ahead), XLA elsewhere. Pallas needs n_fft//2 % 128 == 0.
    """
    pallas_ok = (n_fft // 2) % 128 == 0

    def fn(wav: jax.Array):
        batch = wav.shape[0] if wav.ndim > 1 else 1
        pick_pallas = (use_pallas if use_pallas is not None
                       else (jax.default_backend() == "tpu" and pallas_ok
                             and batch <= 64))
        if pick_pallas:
            from phasegen_tpu.ops.pallas.stft_fused import (
                stft_logmag_phase_pallas,
            )

            return stft_logmag_phase_pallas(wav, n_fft, hop)
        re, im = stft_ri(wav, n_fft, hop)
        return logmag_phase_ri(drop_dc(re), drop_dc(im))

    return fn


def spec_to_audio_fn(n_fft: int = 2048, hop: int = 512,
                     length: int | None = None, normalize: bool = True,
                     use_pallas: bool | None = None):
    """Returns a jittable fn: (logmag, phase) -> waveform (B, T).

    Re-inserts the zero DC row (reference: utils.py:38-39) and
    infinity-normalizes like the reference's generate_audio
    (reference: utils.py:42).

    use_pallas: None = auto — the fused Pallas ISTFT kernel
    (ops/pallas/istft_fused.py) on TPU for batches <= 4, where its fused
    iDFT+window+OLA wins ~10-16% over the XLA GEMM path (istft_ab.py:
    2.98/3.04 ms vs 3.27/3.63 ms at B=2/4; a wash at B >= 8). Needs
    (n_fft//2) % 128 == 0 and batched (B, F, T) input.
    """
    pallas_ok = (n_fft // 2) % 128 == 0

    def fn(logmag: jax.Array, phase: jax.Array):
        re, im = polar_to_ri(logmag, phase)
        batch = re.shape[0] if re.ndim > 2 else 0
        pick_pallas = (use_pallas if use_pallas is not None
                       else (jax.default_backend() == "tpu" and pallas_ok
                             and 1 <= batch <= 4))
        if pick_pallas:
            from phasegen_tpu.ops.pallas.istft_fused import istft_ri_pallas

            wav = istft_ri_pallas(re, im, n_fft, hop, length=length,
                                  fft_tile=256)
        else:
            wav = istft_ri(add_dc(re), add_dc(im), n_fft, hop,
                           length=length)
        if normalize:
            wav = normalize_inf(wav, axis=-1 if wav.ndim > 1 else None)
        return wav

    return fn


def build_infer_fn(
    cfg: UNetConfig,
    n_fft: int = 2048,
    hop: int = 512,
    use_pred_mag: bool = False,
    normalize: bool = True,
    channels: int = 1,
    conv_impl=None,
):
    """Build the fused waveform -> waveform phase-regeneration function.

    Args:
      use_pred_mag: if True, resynthesize from the U-Net's predicted
        magnitude head instead of the true input magnitude (the reference
        demo keeps the true magnitude, reference: demo.py:39).
      channels: audio channels (2 = stereo, high-res config). Channel
        spectrograms stack along the U-Net's channel axis, so
        cfg.input_nc must equal channels * n_fft//2.
      conv_impl: optional (down_fn, up_fn) conv arithmetic override — the
        int8 serving paths (infer/quantize.py INT8_STORE_IMPL /
        INT8_ARITH_IMPL) expect quantized params here.
    Returns:
      jitted fn(params, state, wav) -> (wav_out, pred_phase) with wav of
      shape (B, T) for mono or (B, channels, T) otherwise.
    """
    bins = n_fft // 2
    if cfg.input_nc != channels * bins:
        raise ValueError(f"cfg.input_nc={cfg.input_nc} != channels*bins="
                         f"{channels * bins}")
    to_patch = wav_to_patch_fn(n_fft, hop)

    @jax.jit
    def infer(params, state, wav):
        length = wav.shape[-1]
        if channels > 1:
            b = wav.shape[0]
            flat = wav.reshape(b * channels, length)
            logmag, _ = to_patch(flat)
            logmag = logmag.reshape(b, channels * bins, -1)
        else:
            logmag, _ = to_patch(wav)
        pred, _ = unet_apply(params, state, logmag, cfg, training=False,
                             conv_impl=conv_impl)
        pred_phase = pred[:, : cfg.input_nc].astype(jnp.float32)
        mag_src = (pred[:, cfg.input_nc :].astype(jnp.float32)
                   if use_pred_mag else logmag)
        if channels > 1:
            # normalize per CLIP, not per channel: a per-row peak
            # normalization of the (b*channels, T) layout would rescale
            # L/R independently and destroy the stereo image (r3x review)
            to_audio = spec_to_audio_fn(n_fft, hop, length=length,
                                        normalize=False)
            b, _, nf = mag_src.shape
            out = to_audio(mag_src.reshape(b * channels, bins, nf),
                           pred_phase.reshape(b * channels, bins, nf))
            out = out.reshape(b, channels, length)
            if normalize:
                peak = jnp.max(jnp.abs(out), axis=(-2, -1), keepdims=True)
                out = out / jnp.maximum(peak, jnp.finfo(out.dtype).tiny)
            return out, pred_phase
        to_audio = spec_to_audio_fn(n_fft, hop, length=length,
                                    normalize=normalize)
        return to_audio(mag_src, pred_phase), pred_phase

    return infer
