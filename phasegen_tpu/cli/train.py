"""Training CLI.

The reference hardcodes its training config as module constants
(reference: train.py:11-16,26); here each constant is a flag with the
reference value as default:

    python -m phasegen_tpu.cli.train \
        --train_paths dataset/Pop_audio_train.npy \
        --val_paths dataset/Pop_audio_val.npy
"""

from __future__ import annotations

import argparse

from phasegen_tpu.cache import add_cache_flag, enable_unless_disabled
from phasegen_tpu.config import TrainConfig
from phasegen_tpu.train.loop import train


def build_parser() -> argparse.ArgumentParser:
    d = TrainConfig()
    p = argparse.ArgumentParser(description="Train the phase-generation U-Net")
    p.add_argument("--log_dir", default=d.log_dir)
    p.add_argument("--train_paths", nargs="+",
                   default=list(d.train_paths))
    p.add_argument("--val_paths", nargs="+", default=list(d.val_paths))
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--val_batch_size", type=int, default=d.val_batch_size)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--sr", type=int, default=d.sr)
    p.add_argument("--n_fft", type=int, default=d.n_fft)
    p.add_argument("--hop", type=int, default=d.hop)
    p.add_argument("--mag_weight", type=float, default=d.mag_weight)
    p.add_argument("--val_every", type=int, default=d.val_every)
    p.add_argument("--ckpt_every", type=int, default=d.ckpt_every)
    p.add_argument("--gl_iters", type=int, default=d.gl_iters)
    p.add_argument("--max_steps", type=int, default=d.max_steps,
                   help="0 = run forever (reference semantics)")
    p.add_argument("--max_epochs", type=int, default=d.max_epochs)
    p.add_argument("--max_seconds", type=float, default=d.max_seconds,
                   help="wall-clock budget: checkpoint + exit cleanly once "
                        "exceeded (0 = off) — queue-window alternative to "
                        "`timeout`, whose mid-step SIGTERM can wedge the "
                        "tunneled backend")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--compute_dtype", default=d.compute_dtype,
                   choices=["float32", "bfloat16"])
    p.add_argument("--extra_depth", type=int, default=d.extra_depth)
    p.add_argument("--norm", default=d.norm,
                   choices=["batch", "instance", "none"])
    p.add_argument("--no_data_parallel", action="store_true")
    p.add_argument("--tensor_parallel", type=int, default=d.tensor_parallel)
    p.add_argument("--no_media", action="store_true",
                   help="skip TB image/audio logging")
    p.add_argument("--prefetch", type=int, default=d.prefetch)
    p.add_argument("--channels", type=int, default=d.channels)
    p.add_argument("--profile_steps", type=int, default=d.profile_steps,
                   help="trace N steps (starting at step 10) to log_dir/profile")
    p.add_argument("--device_data_gb", type=float, default=d.device_data_gb,
                   help="HBM budget for device-resident training data (0 off)")
    p.add_argument("--adam_mu_dtype", default=d.adam_mu_dtype,
                   choices=["float32", "bfloat16"],
                   help="first-moment dtype (bfloat16 halves optimizer traffic)")
    p.add_argument("--ckpt_light", action="store_true",
                   help="periodic checkpoints save weights-only bf16 npz "
                        "(~6x less D2H than full state; full state still "
                        "saved at exit)")
    p.add_argument("--no_final_ckpt", action="store_true",
                   help="skip the full-state save at run end (~7 min of "
                        "D2H at 612M) — for sweep runs whose periodic "
                        "light saves suffice")
    p.add_argument("--lr_schedule", default=d.lr_schedule,
                   choices=["constant", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=d.warmup_steps)
    p.add_argument("--decay_steps", type=int, default=d.decay_steps)
    p.add_argument("--synth_train", type=int, default=d.synth_train,
                   help=">0: train on the on-device synthetic corpus of "
                        "this many clips instead of --train_paths")
    p.add_argument("--synth_seed", type=int, default=d.synth_seed)
    p.add_argument("--synth_version", type=int, default=d.synth_version,
                   choices=[1, 2, 3],
                   help="1 = tonal-event corpus; 2 = harder music-like "
                        "corpus (noise floor, percussion noise bursts, "
                        "reverb tail, denser polyphony); 3 = v2 + music "
                        "structure (per-clip key/scale quantization, "
                        "bass/harmony/melody register roles, looping "
                        "percussion, tremolo)")
    p.add_argument("--synth_fresh", action="store_true",
                   help="never reuse a clip seed (infinite stream)")
    p.add_argument("--synth_t_samples", type=int, default=d.synth_t_samples)
    p.add_argument("--init_from", default=d.init_from,
                   help="warm-start params/BN from this checkpoint "
                        "(orbax dir or npz) into a fresh run (step 0, "
                        "new optimizer); use with a new --log_dir")
    p.add_argument("--scan_steps", type=int, default=d.scan_steps,
                   help="K train steps per dispatch via lax.scan "
                        "(device-side feeds only; amortizes the fixed "
                        "per-step host/dispatch cost). 0 = auto: 8 for "
                        "device-side feeds (clamped to one epoch), 1 "
                        "otherwise. Validation/checkpoint cadences fire "
                        "at the first window boundary past each multiple")
    p.add_argument("--ang_weighting", default=d.ang_weighting,
                   choices=["none", "mag2"],
                   help="mag2: weight each bin's cos/sin error by its "
                        "normalized magnitude^2 (waveform-L2 aligned); "
                        "none = reference loss")
    add_cache_flag(p)
    from phasegen_tpu.obs.watchdog import add_wait_flag

    add_wait_flag(p)
    p.add_argument("--wav_weight", type=float, default=d.wav_weight,
                   help=">0: add this weight times the waveform MAE of "
                        "the hybrid reconstruction (true mag + predicted "
                        "phase) vs the original — the validation metric "
                        "itself; 0 = reference loss")
    p.add_argument("--sc_weight", type=float, default=d.sc_weight,
                   help=">0: add this weight times the per-clip sin^2 "
                        "spectral-consistency of the hybrid — asks "
                        "training for the magnitude self-consistency "
                        "Griffin-Lim wins on (the sc_* eval columns); "
                        "0 = reference loss")
    p.add_argument("--ang_weight", type=float, default=d.ang_weight,
                   help="scale on the cos/sin angle loss term (1.0 = "
                        "reference). Lower it in a --wav_weight fine-tune "
                        "so the angle gradient doesn't dominate the "
                        "waveform term")
    return p


def main(argv=None) -> None:
    a = build_parser().parse_args(argv)
    enable_unless_disabled(a)
    # Gate only the START on backend recovery (--wait_backend): a new
    # client cannot connect during an outage, but once training is
    # running it must NOT probe — mid-run stalls recover unaided
    # (obs/watchdog.py module docstring).
    from phasegen_tpu.obs.watchdog import gate_backend

    gate_backend(a)
    cfg = TrainConfig(
        log_dir=a.log_dir,
        train_paths=a.train_paths,
        val_paths=a.val_paths,
        batch_size=a.batch_size,
        val_batch_size=a.val_batch_size,
        lr=a.lr,
        sr=a.sr,
        n_fft=a.n_fft,
        hop=a.hop,
        mag_weight=a.mag_weight,
        val_every=a.val_every,
        ckpt_every=a.ckpt_every,
        gl_iters=a.gl_iters,
        max_steps=a.max_steps,
        max_epochs=a.max_epochs,
        max_seconds=a.max_seconds,
        seed=a.seed,
        resume=not a.no_resume,
        compute_dtype=a.compute_dtype,
        extra_depth=a.extra_depth,
        norm=a.norm,
        data_parallel=not a.no_data_parallel,
        tensor_parallel=a.tensor_parallel,
        log_media=not a.no_media,
        prefetch=a.prefetch,
        channels=a.channels,
        profile_steps=a.profile_steps,
        device_data_gb=a.device_data_gb,
        ckpt_light=a.ckpt_light,
        final_ckpt=not a.no_final_ckpt,
        adam_mu_dtype=a.adam_mu_dtype,
        lr_schedule=a.lr_schedule,
        warmup_steps=a.warmup_steps,
        decay_steps=a.decay_steps,
        synth_train=a.synth_train,
        synth_seed=a.synth_seed,
        synth_version=a.synth_version,
        synth_fresh=a.synth_fresh,
        synth_t_samples=a.synth_t_samples,
        ang_weighting=a.ang_weighting,
        wav_weight=a.wav_weight,
        sc_weight=a.sc_weight,
        ang_weight=a.ang_weight,
        init_from=a.init_from,
        scan_steps=a.scan_steps,
    )
    train(cfg)


if __name__ == "__main__":
    main()
