"""Long-form streaming inference with overlap-add phase blending.

The reference handles long audio only by cutting it into independent
4.064 s patches at preproc time and never reassembling them (reference:
preproc_mdb.py:66-97). This module regenerates phase for arbitrarily long
tracks as one device-resident pipeline:

  1. GEMM-STFT of the whole track -> (bins, T_frames) log-mag (+ phase),
  2. window the spectrogram into 128-frame patches with ``overlap``
     overlapping frames,
  3. batched U-Net forward over all patches,
  4. phase blending on overlaps: overlap-add of ramp-weighted unit
     phasors (sum w*cos(phi), sum w*sin(phi), then atan2) — circular-mean
     crossfade, reusing the scatter-free overlap_add kernel along the
     frame axis,
  5. single ISTFT of true magnitude + blended phase back to a waveform
     (optionally polished with warm-started Griffin-Lim iterations).

Two execution modes:

  * ``fused``   — steps 1-5 are ONE jitted graph per track-length bucket.
    Fastest steady state (~0.09 s per 60 s track measured), but the
    first call compiles the whole-track program: ~200 s for the 612M
    model (BASELINE.md "Streaming").
  * ``chunked`` — the U-Net forward is its own jitted fn at the fixed
    patch-batch shape, compiled ONCE and reused for every track and
    bucket; the pre (STFT+patching) and post (blend+ISTFT+polish) DSP
    graphs compile per bucket in seconds. The host loops over patch
    batches, slicing on device. Kills the cold start at a small
    steady-state cost (per-batch dispatch overhead).

Compilation note: graphs are shape-specialized per (padded) track
length; ``frame_bucket`` rounds track lengths up so repeated calls on
similar-length tracks share executables. The persistent compilation
cache (phasegen_tpu/cache.py) removes repeat-process compiles for both
modes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phasegen_tpu.infer.aot import AotRegistry, tree_avals
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


def _patch_plan(nf: int, patch_frames: int, hop_f: int,
                batch_patches: int) -> tuple[int, int, int]:
    """Static patching geometry for an nf-frame spectrogram:
    (n_patch, pad_f frames of zero-padding, n_pad_patch incl. batch pad).
    """
    n_patch = max(1, -(-(nf - (patch_frames - hop_f)) // hop_f))
    pad_f = (n_patch - 1) * hop_f + patch_frames - nf
    n_pad_patch = -(-n_patch // batch_patches) * batch_patches
    return n_patch, pad_f, n_pad_patch


def _extract_patches(logmag: jax.Array, patch_frames: int, hop_f: int,
                     batch_patches: int) -> jax.Array:
    """(bins, nf) -> (n_pad_patch, bins, patch_frames) strided windows."""
    nb, nf = logmag.shape
    n_patch, pad_f, n_pad_patch = _patch_plan(nf, patch_frames, hop_f,
                                              batch_patches)
    lm = jnp.pad(logmag, ((0, 0), (0, pad_f)))
    starts = jnp.arange(n_pad_patch) * hop_f
    starts = jnp.minimum(starts, nf + pad_f - patch_frames)
    idx = starts[:, None] + jnp.arange(patch_frames)[None, :]
    return jnp.transpose(lm[:, idx], (1, 0, 2))  # (P, bins, L)


def _blend_and_resynth(pred: jax.Array, logmag: jax.Array, *, cfg,
                       weights, hop_f: int, n_fft: int, hop: int,
                       length: int, use_pred_mag: bool, normalize: bool,
                       refine_iters: int) -> jax.Array:
    """(n_patch, C, L) U-Net outputs + (bins, nf) logmag -> waveform."""
    nb, nf = logmag.shape
    n_patch = pred.shape[0]
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
            jnp.broadcast_to(weights, (n_patch, weights.shape[0])),
            hop_f)[None, : nf]
        mag_src = msum / jnp.maximum(wsum, 1e-6)
    else:
        mag_src = logmag

    re2, im2 = polar_to_ri(mag_src, blended)
    out = istft_ri(add_dc(re2), add_dc(im2), n_fft, hop, length=length)
    if refine_iters > 0:
        # warm-started GL polish of the whole track. GL's natural output
        # length is hop*(nf-1); the bucketed wrapper pads tracks to a hop
        # multiple so this equals `length` — the pad/concat below only
        # fires for direct calls on unpadded lengths.
        gl_len = hop * (nf - 1)
        init = (out[..., :gl_len] if length >= gl_len
                else jnp.pad(out, (0, gl_len - length)))
        # normalize=False keeps GL's magnitude-consistent ISTFT amplitude
        # (same scale as `out`): the tail splice below stays continuous
        # and normalize=False callers get an unnormalized track (r3
        # review: peak-1.0 GL head spliced onto a source-amplitude tail).
        refined, _, _ = griffin_lim(jnp.expm1(mag_src), n_fft, hop,
                                    refine_iters, init=init,
                                    normalize=False)
        out = (refined[..., :length] if gl_len >= length
               else jnp.concatenate([refined, out[..., gl_len:]], -1))
    if normalize:
        out = normalize_inf(out)
    return out


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
    mode: str = "fused",
    conv_impl=None,
):
    """Returns fn(params, norm_state, wav (T,)) -> wav (T,).

    ``overlap`` is in spectrogram frames; with patch_frames=128 and
    overlap=64 the patch stride divides the patch length, so the blend
    uses the dense scatter-free overlap-add path.

    ``refine_iters`` > 0 polishes the blended full track with K
    warm-started Griffin-Lim iterations (ops/griffin_lim init=), the same
    polish the demo applies per clip — K=1 (the measured sweet spot on
    wav-tuned models) beat random-start GL-250 on
    the held-out set (BASELINE.md). Applied after blending, the polish
    also smooths any residual seam error at patch boundaries.

    ``mode``: "fused" (one whole-track graph, slow first compile, fastest
    steady state) or "chunked" (fixed-shape U-Net executable shared by
    all tracks + cheap per-bucket DSP graphs — see module docstring).
    """
    patch_frames = cfg.length
    hop_f = patch_frames - overlap
    if not (0 <= overlap < patch_frames):
        raise ValueError(f"overlap {overlap} must be in [0, {patch_frames})")
    if mode not in ("fused", "chunked"):
        raise ValueError(f"unknown stream mode {mode!r}")

    weights = _ramp_weights(patch_frames, overlap)
    take = 2 * cfg.input_nc if use_pred_mag else cfg.input_nc

    # One forward per patch batch returns both heads; slicing off the
    # magnitude half afterwards keeps use_pred_mag at 1x model FLOPs.
    def fwd(params, norm_state, batch):
        # conv_impl plugs in the int8 serving convs (infer/quantize.py):
        # `params` is then the quantized tree, 4x smaller in HBM and —
        # host-quantized — 4x fewer upload bytes on cold start
        pred, _ = unet_apply(params, norm_state, batch, cfg,
                             training=False, conv_impl=conv_impl)
        return pred[:, :take].astype(jnp.float32)

    @jax.jit
    def infer_fused(params, norm_state, wav):
        length = wav.shape[-1]
        re, im = stft_ri(wav, n_fft, hop)
        logmag, _ = logmag_phase_ri(drop_dc(re), drop_dc(im))
        nb, nf = logmag.shape  # (bins, T_frames)
        n_patch, _, n_pad_patch = _patch_plan(nf, patch_frames, hop_f,
                                              batch_patches)
        patches = _extract_patches(logmag, patch_frames, hop_f,
                                   batch_patches)
        batched = patches.reshape(n_pad_patch // batch_patches,
                                  batch_patches, nb, patch_frames)
        pred = jax.lax.map(
            lambda b: fwd(params, norm_state, b), batched).reshape(
            n_pad_patch, -1, patch_frames)[:n_patch]
        return _blend_and_resynth(
            pred, logmag, cfg=cfg, weights=weights, hop_f=hop_f,
            n_fft=n_fft, hop=hop, length=length,
            use_pred_mag=use_pred_mag, normalize=normalize,
            refine_iters=refine_iters)

    # --- chunked mode: 3 small executables instead of one giant one ---
    fwd_jit = jax.jit(fwd)

    # AOT warm-up registry: warm() lowers + compiles executables from
    # SHAPES alone (jax.ShapeDtypeStruct trees — no weights needed), so
    # executable compile/restore overlaps the multi-GB H2D weight upload
    # instead of serializing after it (the two dominant cold-start costs,
    # BASELINE.md "Streaming cold start"). Calls fall back to the jitted
    # fn on any signature mismatch (infer/aot.py).
    warm_execs = AotRegistry()
    _maybe_compiled = warm_execs.call

    @jax.jit
    def pre_chunked(wav):
        re, im = stft_ri(wav, n_fft, hop)
        logmag, _ = logmag_phase_ri(drop_dc(re), drop_dc(im))
        return logmag, _extract_patches(logmag, patch_frames, hop_f,
                                        batch_patches)

    @jax.jit
    def post_chunked(pred, logmag, wav):
        return _blend_and_resynth(
            pred, logmag, cfg=cfg, weights=weights, hop_f=hop_f,
            n_fft=n_fft, hop=hop, length=wav.shape[-1],
            use_pred_mag=use_pred_mag, normalize=normalize,
            refine_iters=refine_iters)

    def infer_chunked(params, norm_state, wav):
        t_pad = wav.shape[-1]
        logmag, patches = _maybe_compiled(("pre", t_pad), pre_chunked, wav)
        n_patch, _, n_pad_patch = _patch_plan(logmag.shape[-1],
                                              patch_frames, hop_f,
                                              batch_patches)
        preds = [_maybe_compiled("fwd", fwd_jit, params, norm_state,
                                 patches[s : s + batch_patches])
                 for s in range(0, n_pad_patch, batch_patches)]
        pred = (jnp.concatenate(preds, axis=0)[:n_patch]
                if len(preds) > 1 else preds[0][:n_patch])
        return _maybe_compiled(("post", t_pad), post_chunked,
                               pred, logmag, wav)

    infer = infer_fused if mode == "fused" else infer_chunked

    def _bucket_pad(t: int) -> int:
        frames = -(-(1 + t // hop) // frame_bucket) * frame_bucket
        return frames * hop

    def infer_bucketed(params, norm_state, wav):
        """Pad track length to the next frame bucket to cap recompiles."""
        t = wav.shape[-1]
        # padded length is a hop multiple derived from the bucketed frame
        # count alone — same bucket => same executable — and equals
        # hop*(n_frames-1), so the GL polish covers the whole track
        t_pad = _bucket_pad(t)
        wav_p = jnp.pad(wav, (0, t_pad - t))
        if mode == "fused":
            out = _maybe_compiled(("fused", t_pad), infer_fused,
                                  params, norm_state, wav_p)
        else:
            out = infer_chunked(params, norm_state, wav_p)
        return out[..., :t]

    def warm(params, norm_state, track_len: int | None = None) -> None:
        """AOT-compile the serving executables from shapes alone.

        Call right after starting an asynchronous weight upload
        (infer/upload.py device_put_async): XLA compiles — or restores
        from the persistent cache (phasegen_tpu/cache.py) — while the
        H2D transfer streams, collapsing the cold start from
        upload + restore to max(upload, restore). ``params``/
        ``norm_state`` may be HOST trees; only shapes/dtypes are read.

        chunked mode warms the shared patch-batch U-Net executable (the
        expensive one); pass ``track_len`` (samples) to also warm the
        per-bucket pre/post DSP graphs. fused mode requires ``track_len``
        to know the whole-track graph's shape.
        """
        p_aval, n_aval = tree_avals(params, norm_state)
        t_pad = _bucket_pad(track_len) if track_len is not None else None
        wav_aval = (jax.ShapeDtypeStruct((t_pad,), jnp.float32)
                    if t_pad is not None else None)
        if mode == "fused":
            if wav_aval is None:
                raise ValueError("fused-mode warm() needs track_len")
            warm_execs.warm(("fused", t_pad), infer_fused,
                            p_aval, n_aval, wav_aval)
            return
        b_aval = jax.ShapeDtypeStruct(
            (batch_patches, n_fft // 2, patch_frames), jnp.float32)
        warm_execs.warm("fwd", fwd_jit, p_aval, n_aval, b_aval)
        if wav_aval is not None:
            nf = t_pad // hop + 1
            n_patch, _, _ = _patch_plan(nf, patch_frames, hop_f,
                                        batch_patches)
            lm_aval = jax.ShapeDtypeStruct((n_fft // 2, nf), jnp.float32)
            pred_aval = jax.ShapeDtypeStruct(
                (n_patch, take, patch_frames), jnp.float32)
            warm_execs.warm(("pre", t_pad), pre_chunked, wav_aval)
            warm_execs.warm(("post", t_pad), post_chunked,
                            pred_aval, lm_aval, wav_aval)

    infer_bucketed.jitted = infer
    infer_bucketed.warm = warm
    infer_bucketed._warm_execs = warm_execs  # observability (tests/debug)
    return infer_bucketed
