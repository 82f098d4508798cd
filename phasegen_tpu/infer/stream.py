"""Long-form streaming inference with overlap-add phase blending.

The reference handles long audio only by cutting it into independent
4.064 s patches at preproc time and never reassembling them (reference:
preproc_mdb.py:66-97). This module regenerates phase for arbitrarily long
tracks as one device-resident pipeline:

  1. GEMM-STFT of the whole track -> (bins, T_frames) log-mag (+ phase),
  2. window the spectrogram into 128-frame patches with ``overlap``
     overlapping frames,
  3. batched U-Net forward over all patches (lax.map over fixed-size
     batches keeps the compiled graph small and memory bounded),
  4. phase blending on overlaps: overlap-add of ramp-weighted unit
     phasors (sum w*cos(phi), sum w*sin(phi), then atan2) — circular-mean
     crossfade, reusing the scatter-free overlap_add kernel along the
     frame axis,
  5. single ISTFT of true magnitude + blended phase back to a waveform.

Compilation note: the graph is shape-specialized per (padded) track
length; ``frame_bucket`` rounds track lengths up so repeated calls on
similar-length tracks share one executable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phasegen_tpu.models.unet import UNetConfig, unet_apply
from phasegen_tpu.ops.dft import istft_ri, logmag_phase_ri, polar_to_ri, stft_ri
from phasegen_tpu.ops.griffin_lim import griffin_lim
from phasegen_tpu.ops.stft import add_dc, drop_dc, normalize_inf, overlap_add


def _ramp_weights(patch_frames: int, overlap: int) -> jax.Array:
    """Per-frame blend weights: linear ramps over the overlap zones,
    flat 1.0 in the middle, never exactly zero (atan2-safe)."""
    w = jnp.ones((patch_frames,), jnp.float32)
    if overlap > 0:
        ramp = (jnp.arange(1, overlap + 1, dtype=jnp.float32)) / overlap
        w = w.at[:overlap].set(ramp)
        w = w.at[-overlap:].set(ramp[::-1])
    return w


def build_stream_infer(
    cfg: UNetConfig,
    n_fft: int = 2048,
    hop: int = 512,
    overlap: int = 64,
    batch_patches: int = 8,
    use_pred_mag: bool = False,
    normalize: bool = True,
    frame_bucket: int = 512,
    refine_iters: int = 0,
):
    """Returns jitted fn(params, norm_state, wav (T,)) -> wav (T,).

    ``overlap`` is in spectrogram frames; with patch_frames=128 and
    overlap=64 the patch stride divides the patch length, so the blend
    uses the dense scatter-free overlap-add path.

    ``refine_iters`` > 0 polishes the blended full track with K
    warm-started Griffin-Lim iterations (ops/griffin_lim init=), the same
    polish the demo applies per clip — K=2 beat random-start GL-250 on
    the held-out set (BASELINE.md). Applied after blending, the polish
    also smooths any residual seam error at patch boundaries.
    """
    patch_frames = cfg.length
    hop_f = patch_frames - overlap
    if not (0 <= overlap < patch_frames):
        raise ValueError(f"overlap {overlap} must be in [0, {patch_frames})")

    weights = _ramp_weights(patch_frames, overlap)

    @jax.jit
    def infer(params, norm_state, wav):
        length = wav.shape[-1]
        re, im = stft_ri(wav, n_fft, hop)
        logmag, phase = logmag_phase_ri(drop_dc(re), drop_dc(im))
        nb, nf = logmag.shape  # (bins, T_frames)

        # pad the frame axis so patches tile it exactly, and the patch
        # count to a multiple of batch_patches
        n_patch = max(1, -(-(nf - overlap) // hop_f))
        pad_f = (n_patch - 1) * hop_f + patch_frames - nf
        n_pad_patch = -(-n_patch // batch_patches) * batch_patches
        pad_p = n_pad_patch - n_patch
        lm = jnp.pad(logmag, ((0, 0), (0, pad_f)))

        starts = jnp.arange(n_pad_patch) * hop_f
        starts = jnp.minimum(starts, nf + pad_f - patch_frames)
        idx = starts[:, None] + jnp.arange(patch_frames)[None, :]
        patches = jnp.transpose(lm[:, idx], (1, 0, 2))  # (P, bins, L)

        # One forward per patch batch returns both heads; slicing off the
        # magnitude half afterwards keeps use_pred_mag at 1x model FLOPs.
        def fwd(batch):
            pred, _ = unet_apply(params, norm_state, batch, cfg,
                                 training=False)
            take = 2 * cfg.input_nc if use_pred_mag else cfg.input_nc
            return pred[:, :take].astype(jnp.float32)

        batched = patches.reshape(n_pad_patch // batch_patches,
                                  batch_patches, nb, patch_frames)
        pred = jax.lax.map(fwd, batched).reshape(
            n_pad_patch, -1, patch_frames)[:n_patch]
        pred_phase = pred[:, : cfg.input_nc]

        # circular-mean phase blend over overlaps (frames axis OLA)
        w = weights[None, None, :]
        cs = overlap_add(jnp.transpose(jnp.cos(pred_phase) * w, (1, 0, 2)),
                         hop_f)[:, : nf]
        sn = overlap_add(jnp.transpose(jnp.sin(pred_phase) * w, (1, 0, 2)),
                         hop_f)[:, : nf]
        blended = jnp.arctan2(sn, cs)

        if use_pred_mag:
            # weighted-average magnitude over overlaps needs the weight sum
            mag_p = pred[:, cfg.input_nc :]
            msum = overlap_add(jnp.transpose(mag_p * w, (1, 0, 2)),
                               hop_f)[:, : nf]
            wsum = overlap_add(
                jnp.broadcast_to(weights, (n_patch, patch_frames)),
                hop_f)[None, : nf]
            mag_src = msum / jnp.maximum(wsum, 1e-6)
        else:
            mag_src = logmag

        re2, im2 = polar_to_ri(mag_src, blended)
        out = istft_ri(add_dc(re2), add_dc(im2), n_fft, hop, length=length)
        if refine_iters > 0:
            # warm-started GL polish of the whole track. GL's natural
            # output length is hop*(nf-1); infer_bucketed pads tracks to
            # a hop multiple so this equals `length` — the pad/concat
            # below only fires for direct calls on unpadded lengths.
            gl_len = hop * (nf - 1)
            init = (out[..., :gl_len] if length >= gl_len
                    else jnp.pad(out, (0, gl_len - length)))
            refined, _, _ = griffin_lim(jnp.expm1(mag_src), n_fft, hop,
                                        refine_iters, init=init)
            out = (refined[..., :length] if gl_len >= length
                   else jnp.concatenate([refined, out[..., gl_len:]], -1))
        if normalize:
            out = normalize_inf(out)
        return out

    def infer_bucketed(params, norm_state, wav):
        """Pad track length to the next frame bucket to cap recompiles."""
        t = wav.shape[-1]
        frames = -(-(1 + t // hop) // frame_bucket) * frame_bucket
        # padded length is a hop multiple derived from the bucketed frame
        # count alone — same bucket => same executable — and equals
        # hop*(n_frames-1), so the GL polish covers the whole track
        t_pad = frames * hop
        wav_p = jnp.pad(wav, (0, t_pad - t))
        return infer(params, norm_state, wav_p)[..., :t]

    infer_bucketed.jitted = infer
    return infer_bucketed
