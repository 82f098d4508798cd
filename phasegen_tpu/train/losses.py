"""Training losses.

The reference trains the U-Net to predict phase and magnitude jointly
(reference: train.py:44-60): the angle loss is the MSE of the cos and sin
of the predicted vs. target phase (circular-safe), the magnitude loss is
a plain MSE against the input log-magnitude, scaled by 0.2.

Extension (``ang_weighting="mag2"``): weight each bin's cos/sin error by
its normalized magnitude-squared. Since
  (cos a - cos b)^2 + (sin a - sin b)^2 = 2 - 2 cos(a - b),
the mag^2-weighted angle loss is proportional (by Parseval) to the L2
waveform error of the hybrid reconstruction — the thing validation
actually measures. The reference's unweighted loss spends most of its
gradient on near-silent bins whose phase is irrelevant to the audio
(observed on-TPU: hybrid SNR slowly degrades late in training while the
unweighted loss still falls).

Extension (``wav_weight > 0``): add a waveform-domain auxiliary term —
the mean-abs-error between the infinity-normalized hybrid reconstruction
(true magnitude + predicted phase) and the infinity-normalized original,
i.e. *exactly* the "MSE" scalar the reference's validation reports
(reference: train.py:98-108; our train/validate.py). The cos/sin loss
treats every bin independently, but the waveform error couples bins
through the ISTFT — two phase fields with equal per-bin cos/sin error can
differ hugely in how their errors interfere in the time domain. The ISTFT
is a (frames, bins) GEMM (ops/dft.py), ~2 orders of magnitude cheaper
than the U-Net forward, so the term costs ~nothing per step.

Extension (``sc_weight > 0``): add a spectral-consistency auxiliary term.
The round-4 metric analysis (BASELINE.md "Alignment-robust quality
columns") showed the pure model wins the reference's waveform-MAE metric
while leaving spectral convergence ≈ 0.70 on the table (Griffin-Lim:
0.07): the predicted phase field is inconsistent — its ISTFT re-analyzes
to a different magnitude than the one it was paired with. ``--refine_iters``
trades MAE for SC post-hoc (and measurably hurts MAE); this term instead
asks training for consistency directly: per clip, the sin² of the angle
between |STFT(hybrid)| and the target magnitude — the scale-optimal
residual min_a ||a·|STFT(w)| − M||² / ||M||², smooth everywhere (no
sqrt at the optimum, unlike SC itself). Costs one extra GEMM-STFT of the
hybrid per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phasegen_tpu.ops.dft import istft_ri, polar_to_ri, stft_ri
from phasegen_tpu.ops.stft import add_dc, drop_dc, normalize_inf


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a - b))


def hybrid_wav_mae(pred_p: jax.Array, logmag: jax.Array, phase: jax.Array,
                   n_fft: int, hop: int) -> jax.Array:
    """Waveform MAE of (true mag + pred phase) vs (true mag + true phase).

    Both reconstructions are infinity-normalized independently, matching
    the validation metric (train/validate.py, reference: utils.py:42 +
    train.py:103-108). Accepts stacked-channel inputs (B, C*F, T): they
    are unstacked to (B, C, F, T) so each source channel gets its own
    ISTFT, mirroring how multi-source patches are built.
    """
    b, f_total, t = logmag.shape
    n_bins = n_fft // 2  # DC dropped (reference: preproc_mdb.py:93)
    if f_total != n_bins:  # stacked channels (stereo / multi-source)
        c = f_total // n_bins
        shape = (b, c, n_bins, t)
        pred_p = pred_p.reshape(shape)
        logmag = logmag.reshape(shape)
        phase = phase.reshape(shape)

    def wav(ph):
        re, im = polar_to_ri(logmag, ph)
        w = istft_ri(add_dc(re), add_dc(im), n_fft, hop)
        return normalize_inf(w, axis=-1)

    return jnp.mean(jnp.abs(wav(phase) - wav(pred_p)))


def spectral_sin2(pred_p: jax.Array, logmag: jax.Array,
                  n_fft: int, hop: int) -> jax.Array:
    """Differentiable spectral-consistency loss (batch-mean per-clip sin²).

    Per clip: 1 − cos²(angle(|STFT(hybrid)|, M)) where the hybrid is the
    ISTFT of (true magnitude M, predicted phase). Equals the scale-
    OPTIMAL normalized residual min_a ||a·|STFT(w)| − M||²/||M||², i.e.
    the square of the spectral-convergence column train/validate.py
    reports — squared so the gradient is smooth at the optimum. Scale
    optimality matters: the metric must not reward amplitude bookkeeping,
    only the SHAPE of the re-analyzed magnitude. Stacked-channel inputs
    (B, C*F, T) unstack like hybrid_wav_mae.
    """
    b, f_total, t = logmag.shape
    n_bins = n_fft // 2
    if f_total != n_bins:
        c = f_total // n_bins
        pred_p = pred_p.reshape(b, c, n_bins, t)
        logmag = logmag.reshape(b, c, n_bins, t)
    mag = jnp.expm1(logmag.astype(jnp.float32))
    re, im = polar_to_ri(logmag, pred_p)
    w = istft_ri(add_dc(re), add_dc(im), n_fft, hop)
    re2, im2 = stft_ri(w, n_fft, hop)
    # eps inside the sqrt keeps the gradient finite on silent bins
    amp = jnp.sqrt(re2 * re2 + im2 * im2 + 1e-12)
    amp = drop_dc(amp)[..., : mag.shape[-1]]
    axes = tuple(range(1, amp.ndim))
    dot = jnp.sum(amp * mag, axis=axes)
    cos2 = (dot * dot
            / jnp.maximum(jnp.sum(amp * amp, axis=axes)
                          * jnp.sum(mag * mag, axis=axes), 1e-24))
    return jnp.mean(jnp.maximum(1.0 - cos2, 0.0))


def phase_mag_loss(
    pred: jax.Array,
    logmag: jax.Array,
    phase: jax.Array,
    n_bins: int,
    mag_weight: float = 0.2,
    ang_weighting: str = "none",
    wav_weight: float = 0.0,
    n_fft: int = 2048,
    hop: int = 512,
    ang_weight: float = 1.0,
    sc_weight: float = 0.0,
) -> tuple[jax.Array, dict]:
    """cos/sin phase MSE + scaled magnitude MSE (reference: train.py:49-60).

    Args:
      pred: (B, 2*n_bins, T) U-Net output — phase head first, mag head second.
      logmag: (B, n_bins, T) input log1p-magnitude (the mag target).
      phase: (B, n_bins, T) target phase angles.
      ang_weighting: "none" = reference loss; "mag2" = per-bin
        mag^2/mean(mag^2) weights on the cos/sin errors (waveform-L2
        aligned; see module docstring).
      wav_weight: > 0 adds wav_weight * hybrid_wav_mae(...) — the
        waveform-domain term that IS the validation metric (module
        docstring). n_fft/hop only matter when it is on.
      sc_weight: > 0 adds sc_weight * spectral_sin2(...) — the
        differentiable spectral-consistency term (module docstring).
      ang_weight: scale on the cos/sin angle term (1.0 = reference
        semantics). < 1 lets a wav_weight fine-tune optimize the
        waveform metric without the full-strength per-bin angle gradient
        fighting it (measured: the combined loss at equal weights pulls
        held-out MSE back up after the first ~1k fine-tune steps).
    Returns:
      (total loss, {"ang_loss", "mag_loss", "loss"[, "wav_loss"]}) — f32
      scalars. With weighting on, "ang_loss" stays the unweighted
      reference value (comparable across runs); "loss" uses the weighted
      angle term.
    """
    pred = pred.astype(jnp.float32)
    pred_p = pred[:, :n_bins]
    pred_m = pred[:, n_bins:]
    phase = phase.astype(jnp.float32)
    logmag = logmag.astype(jnp.float32)

    cos_err = jnp.square(jnp.cos(pred_p) - jnp.cos(phase))
    sin_err = jnp.square(jnp.sin(pred_p) - jnp.sin(phase))
    ang_loss = jnp.mean(cos_err) + jnp.mean(sin_err)
    if ang_weighting == "mag2":
        w = jnp.square(jnp.expm1(logmag))
        w = w / jnp.maximum(jnp.mean(w), 1e-12)  # mean-1 weights
        ang_term = jnp.mean(w * (cos_err + sin_err))
    elif ang_weighting == "none":
        ang_term = ang_loss
    else:
        raise ValueError(f"unknown ang_weighting {ang_weighting!r}")
    mag_loss = _mse(pred_m, logmag)
    loss = ang_weight * ang_term + mag_weight * mag_loss
    metrics = {"ang_loss": ang_loss, "mag_loss": mag_loss}
    if wav_weight > 0.0:
        wav_loss = hybrid_wav_mae(pred_p, logmag, phase, n_fft, hop)
        loss = loss + wav_weight * wav_loss
        metrics["wav_loss"] = wav_loss
    if sc_weight > 0.0:
        sc_loss = spectral_sin2(pred_p, logmag, n_fft, hop)
        loss = loss + sc_weight * sc_loss
        metrics["sc_loss"] = sc_loss
    metrics["loss"] = loss
    return loss, metrics
