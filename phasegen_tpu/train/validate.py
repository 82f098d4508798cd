"""Validation: the three reconstructions + Griffin-Lim comparison.

Device-side version of the reference's val branch (reference:
train.py:69-124): from each val patch build
  orig     = true magnitude + true phase,
  hybrid   = true magnitude + predicted phase,
  no_phase = true magnitude + zero phase,
resynthesize all three (plus a Griffin-Lim reconstruction of the
magnitude), and report waveform mean-abs-errors against ``orig`` under
the reference's names: MSE (hybrid), NOPMSE (no-phase), LMSE (GL)
(reference: train.py:103-108,122). Audios are infinity-normalized before
comparison, matching generate_audio (reference: utils.py:42).

Everything — forward, resynthesis, 250-iteration Griffin-Lim, metrics —
is one jitted graph; only uint8 image rendering stays on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phasegen_tpu.models.unet import UNetConfig, unet_apply
from phasegen_tpu.ops.dft import istft_ri, polar_to_ri, stft_ri
from phasegen_tpu.ops.griffin_lim import griffin_lim
from phasegen_tpu.ops.stft import add_dc, drop_dc, normalize_inf
from phasegen_tpu.train.step import ri_to_logmag_phase


def build_validate_fn(cfg: UNetConfig, n_fft: int = 2048, hop: int = 512,
                      gl_iters: int = 250, raw_ri: bool = True,
                      refine_iters: tuple = (), phase_err: bool = True,
                      refine_pick: bool = False, per_clip: bool = False):
    """Returns jitted fn(params, norm_state, batch, key) -> dict.

    The dict carries the four audio banks — (B, T), or (B, C, T) for
    stacked-channel configs (each source channel ISTFT'd separately,
    matching losses.hybrid_wav_mae) — and scalar metrics
    {"MSE", "NOPMSE", "LMSE", "snr_hybrid_db"} plus the
    alignment/scale-robust columns (VERDICT r3 #4):
    "si_sdr_{hybrid,gl,nophase}_db" (per-clip scale-invariant SDR vs the
    ground-truth resynthesis, batch mean) and "sc_{hybrid,gl}"
    (per-clip scale-optimal spectral convergence vs the target
    magnitude). Each K in ``refine_iters`` adds "MSE_refine{K}": the
    hybrid MAE after K warm-started Griffin-Lim polish iterations of the
    predicted phase (the --refine_iters path of cli/demo, measured
    in-graph here so evaluate reports refined columns from the same
    batches).

    ``refine_pick`` additionally selects a polish depth PER CLIP among
    {0} | refine_iters by scale-invariant spectral mismatch. RESEARCH
    ONLY — measured twice (BASELINE.md r3): the criterion decreases
    monotonically with GL depth, so argmin degenerates to the deepest K
    and loses to fixed K=1; it is intentionally NOT exposed on the
    cli/evaluate surface (benchmarks/gl_refine.py keeps it reachable,
    with "MSE_refine_oracle" as the per-clip ceiling any future
    criterion must chase). Adds "MSE_refine_auto", "MSE_refine_oracle"
    and "refine_pick_counts" (index-aligned with [0, *refine_iters]).

    ``per_clip`` adds (B,) per-clip metric vectors under "*_pc" keys
    ("MSE_pc", "NOPMSE_pc", "LMSE_pc", "MSE_refine{K}_pc",
    "si_sdr_{hybrid,gl}_pc", "sc_{hybrid,gl}_pc") — the values the
    scalar columns are batch means of. Opt-in (default off) so the
    traced graph of existing callers is byte-identical and their
    persistent-cache entries stay warm; cli/evaluate uses it for
    per-clip JSONL dumps and paired-bootstrap confidence intervals.
    """

    def _audio(logmag, phase, length):
        re, im = polar_to_ri(logmag, phase)
        wav = istft_ri(add_dc(re), add_dc(im), n_fft, hop, length=length)
        return normalize_inf(wav, axis=-1)

    def validate(params, norm_state, batch, key):
        if raw_ri:
            logmag, phase = ri_to_logmag_phase(batch)
        else:
            logmag, phase = batch
        pred, _ = unet_apply(params, norm_state, logmag, cfg, training=False)
        pred_phase = pred[:, : cfg.input_nc].astype(jnp.float32)

        # Stacked-channel configs (stereo / multi-source, input_nc = C*F)
        # unstack to (B, C, F, T) so each source channel gets its own
        # ISTFT / GL — the same contract as losses.hybrid_wav_mae; the
        # audio banks come out (B, C, T). Mono (the reference layout)
        # passes through unchanged. phase_err below stays on the stacked
        # layout (elementwise, and the media render expects it stacked).
        n_bins = n_fft // 2
        b, f_total, nf = logmag.shape
        if f_total != n_bins:
            shape = (b, f_total // n_bins, n_bins, nf)
            logmag_c = logmag.reshape(shape)
            phase_c = phase.reshape(shape)
            pred_phase_c = pred_phase.reshape(shape)
        else:
            logmag_c, phase_c, pred_phase_c = logmag, phase, pred_phase

        length = hop * (nf - 1)
        orig = _audio(logmag_c, phase_c, length)
        hybrid = _audio(logmag_c, pred_phase_c, length)
        no_phase = _audio(logmag_c, jnp.zeros_like(phase_c), length)
        gl, _, _ = griffin_lim(jnp.expm1(logmag_c), n_fft, hop, gl_iters,
                               key=key)

        clip_axes = lambda x: tuple(range(1, x.ndim))  # noqa: E731

        def mae_pc(x):  # per-clip MAE vs orig, (B,)
            return jnp.mean(jnp.abs(orig - x), axis=clip_axes(x))

        def mae(x):
            return jnp.mean(mae_pc(x))

        err = jnp.sum((orig - hybrid) ** 2)
        snr = 10.0 * jnp.log10(jnp.sum(orig**2) /
                               jnp.maximum(err, 1e-12))

        # Alignment/scale-robust quality metrics (VERDICT r3 #4): the
        # reference's MAE-over-inf-normalized-waveforms is forgiving of
        # per-clip scale mismatch that plain SNR punishes; these say
        # which story is right.
        def si_sdr_pc(x):
            # per-clip scale-invariant SDR vs orig, (B,) dB:
            # project x onto orig (optimal gain), SDR of the residual
            ax = clip_axes(x)
            dot = jnp.sum(x * orig, axis=ax, keepdims=True)
            ref_e = jnp.sum(orig * orig, axis=ax, keepdims=True)
            s = dot / jnp.maximum(ref_e, 1e-12) * orig  # scaled target
            e = x - s
            r = (jnp.sum(s * s, axis=ax)
                 / jnp.maximum(jnp.sum(e * e, axis=ax), 1e-12))
            return 10.0 * jnp.log10(jnp.maximum(r, 1e-12))

        def si_sdr_db(x):
            return jnp.mean(si_sdr_pc(x))

        mag_t = jnp.expm1(logmag_c)
        mag_e = jnp.sum(mag_t * mag_t, axis=clip_axes(mag_t))

        def spectral_convergence_pc(wav):
            # per-clip scale-OPTIMAL spectral convergence vs the target
            # magnitude, (B,): min over gain a of ||a*|STFT(wav)| - M||_F
            # / ||M||_F = sin(angle(|STFT|, M)). Scale-optimal because
            # the resynth banks are peak-normalized (a scale-sensitive
            # SC would only measure that normalization).
            re2, im2 = stft_ri(wav, n_fft, hop)
            amp = jnp.sqrt(re2 * re2 + im2 * im2)
            amp = drop_dc(amp)[..., : mag_t.shape[-1]]
            ax = clip_axes(amp)
            dot = jnp.sum(amp * mag_t, axis=ax)
            cos2 = (dot * dot
                    / jnp.maximum(jnp.sum(amp * amp, axis=ax) * mag_e,
                                  1e-24))
            return jnp.sqrt(jnp.maximum(1.0 - cos2, 0.0))

        def spectral_convergence(wav):
            return jnp.mean(spectral_convergence_pc(wav))
        refined = {}
        refined_wavs = []
        for k in refine_iters:
            r, _, _ = griffin_lim(jnp.expm1(logmag_c), n_fft, hop, int(k),
                                  init=hybrid)
            refined[f"MSE_refine{int(k)}"] = mae(r)
            refined_wavs.append(r)
        if refine_pick and refine_iters:
            def sc_pc(wav):
                # scale-invariant spectral mismatch per clip:
                # 1 - cos angle between |STFT(wav)| and the target
                # magnitude (resynth banks are peak-normalized, so a
                # scale-sensitive SC would be meaningless)
                re, im = stft_ri(wav, n_fft, hop)
                a = jnp.sqrt(re * re + im * im)
                a = drop_dc(a)[..., : mag_t.shape[-1]]
                axes = tuple(range(1, a.ndim))
                dot = jnp.sum(a * mag_t, axis=axes)
                na = jnp.sqrt(jnp.sum(a * a, axis=axes))
                nm = jnp.sqrt(jnp.sum(mag_t * mag_t, axis=axes))
                return 1.0 - dot / jnp.maximum(na * nm, 1e-12)

            cands = [hybrid] + refined_wavs  # K = 0, *refine_iters
            maes = jnp.stack([mae_pc(w) for w in cands])  # (n_K, B)
            scs = jnp.stack([sc_pc(w) for w in cands])    # (n_K, B)
            pick = jnp.argmin(scs, axis=0)                # (B,)
            refined["MSE_refine_auto"] = jnp.mean(
                jnp.take_along_axis(maes, pick[None], 0)[0])
            refined["MSE_refine_oracle"] = jnp.mean(jnp.min(maes, axis=0))
            refined["refine_pick_counts"] = jnp.sum(
                pick[None, :] == jnp.arange(len(cands))[:, None], axis=1)
        if per_clip:
            # (B,) vectors behind the scalar columns — tiny D2H (floats
            # per clip); consumed by cli/evaluate for per-clip JSONL and
            # paired-bootstrap CIs over the whole shard.
            refined["MSE_pc"] = mae_pc(hybrid)
            refined["NOPMSE_pc"] = mae_pc(no_phase)
            refined["LMSE_pc"] = mae_pc(gl)
            refined["si_sdr_hybrid_pc"] = si_sdr_pc(hybrid)
            refined["si_sdr_gl_pc"] = si_sdr_pc(gl)
            refined["sc_hybrid_pc"] = spectral_convergence_pc(hybrid)
            refined["sc_gl_pc"] = spectral_convergence_pc(gl)
            for k, w in zip(refine_iters, refined_wavs):
                refined[f"MSE_refine{int(k)}_pc"] = mae_pc(w)
        if phase_err:
            # circular per-bin phase error |wrap(pred - true)| in [0, pi]
            # for the diagnostic validation image (obs/spec_image); off
            # for metric-only callers — the (B, F, T) bank is ~8 MB of
            # D2H per batch on the tunnel
            d = pred_phase - phase
            refined["phase_err"] = jnp.abs(
                jnp.arctan2(jnp.sin(d), jnp.cos(d)))
        return refined | {
            "orig": orig,
            "hybrid": hybrid,
            "no_phase": no_phase,
            "gl": gl,
            "MSE": mae(hybrid),
            "NOPMSE": mae(no_phase),
            "LMSE": mae(gl),
            "snr_hybrid_db": snr,
            "si_sdr_hybrid_db": si_sdr_db(hybrid),
            "si_sdr_gl_db": si_sdr_db(gl),
            "si_sdr_nophase_db": si_sdr_db(no_phase),
            "sc_hybrid": spectral_convergence(hybrid),
            "sc_gl": spectral_convergence(gl),
        }

    return jax.jit(validate)
