"""Long-form streaming inference CLI: regenerate the phase of a whole WAV.

    python -m phasegen_tpu.cli.stream --input song.wav --output out.wav \
        --weight unet_llr/ [--overlap 64] [--use_pred_mag]

The track of any length runs through the overlap-add streaming pipeline
(infer/stream.py): windowed 128-frame patches, batched U-Net phase
prediction, circular-mean crossfade on overlaps, one full-track ISTFT.
The reference has no long-form path at all (tracks become independent
4.064 s patches at preproc time, never reassembled).
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.cache import add_cache_flag, enable_unless_disabled
from phasegen_tpu.config import DemoConfig
from phasegen_tpu.data.audio_io import read_wav, resample, write_wav
from phasegen_tpu.infer.stream import build_stream_infer
from phasegen_tpu.train.state import create_train_state


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Streaming phase regeneration.")
    p.add_argument("--input", default="",
                   help="input WAV (or use --input_dir)")
    p.add_argument("--output", default="",
                   help="output WAV (or use --output_dir)")
    p.add_argument("--input_dir", default="",
                   help="process every .wav in this folder (offline batch)")
    p.add_argument("--output_dir", default="",
                   help="destination folder for --input_dir mode")
    p.add_argument("--weight", default="")
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--hop", default=512, type=int)
    p.add_argument("--sr", default=16000, type=int)
    p.add_argument("--overlap", default=64, type=int,
                   help="overlapping spectrogram frames between patches")
    p.add_argument("--batch_patches", default=8, type=int)
    p.add_argument("--use_pred_mag", action="store_true")
    p.add_argument("--refine_iters", default=0, type=int,
                   help="polish the blended track with K warm-started "
                        "Griffin-Lim iterations (K=1 is the measured sweet spot on wav-tuned models, beating random-start "
                        "GL-250 per-clip on the held-out set)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--extra_depth", default=0, type=int)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--mode", default="chunked",
                   choices=["chunked", "fused"],
                   help="chunked: fixed-shape U-Net executable shared "
                        "across tracks/buckets (fast first call); fused: "
                        "one whole-track graph (fastest steady state, "
                        "~200s first compile for the 612M model)")
    p.add_argument("--quantize", default="none",
                   choices=["none", "store"],
                   help="'store': int8 weights quantized on the HOST — "
                        "~4x fewer weight-upload bytes (the dominant "
                        "cold-start cost once compiles are cached) and "
                        "4x smaller HBM footprint; conv math stays bf16")
    p.add_argument("--serve", action="store_true",
                   help="resident server: after any --input/--input_dir "
                        "jobs, read 'IN_WAV OUT_WAV' lines from stdin and "
                        "process each as it arrives (blank line or EOF "
                        "stops). Weights + executables stay resident, so "
                        "every job after the first runs at steady-state "
                        "latency — the one-shot CLI pays the cold start "
                        "per process instead")
    add_cache_flag(p)
    from phasegen_tpu.obs.watchdog import add_wait_flag, gate_backend

    add_wait_flag(p)
    a = p.parse_args(argv)
    enable_unless_disabled(a)
    gate_backend(a)  # --wait_backend: recovery-gated start

    cfg = DemoConfig(n_fft=a.n_fft, hop=a.hop, sr=a.sr, weight=a.weight,
                     compute_dtype=a.compute_dtype,
                     extra_depth=a.extra_depth)
    model_cfg = cfg.model_config()

    if a.input_dir:
        import glob
        import os

        jobs = sorted(glob.glob(os.path.join(a.input_dir, "*.wav")))
        if not jobs:
            raise FileNotFoundError(f"no .wav files in {a.input_dir}")
        out_dir = a.output_dir or a.input_dir
        os.makedirs(out_dir, exist_ok=True)
        outputs = [os.path.join(out_dir,
                                "regen_" + os.path.basename(j))
                   for j in jobs]
    elif a.input or a.output:
        if not a.input or not a.output:
            raise SystemExit("--input/--output (or --input_dir) required")
        jobs, outputs = [a.input], [a.output]
    elif a.serve:
        jobs, outputs = [], []  # stdin-only server
    else:
        raise SystemExit("--input/--output (or --input_dir) required")

    host_weights = bool(a.weight) and not a.random_init
    if not host_weights:
        state = create_train_state(jax.random.PRNGKey(0), model_cfg)
        params, norm_state = state.params, state.norm_state
    else:
        from phasegen_tpu.cli.demo import load_weights

        # HOST tree: serving dtypes for dense (bf16 conv views), f32 for
        # int8 quantization input; the upload starts asynchronously below
        # so the executable compile/restore overlaps the H2D transfer
        params, norm_state = load_weights(a.weight, model_cfg,
                                          device=False,
                                          host_serving=(a.quantize
                                                        == "none"))

    conv_impl = None
    if a.quantize == "store":
        from phasegen_tpu.infer.quantize import (
            INT8_STORE_IMPL,
            quantize_for_serving,
            quantize_params_host,
            quantized_size_bytes,
        )

        # host weights quantize in numpy (only int8 + scales cross the
        # link, async below); random-init device trees quantize on device
        params = (quantize_params_host(params) if host_weights
                  else quantize_for_serving(params))
        conv_impl = INT8_STORE_IMPL
        print(f"int8 store: weights "
              f"{quantized_size_bytes(params) / 1e9:.2f} GB in HBM")

    stream = build_stream_infer(model_cfg, a.n_fft, a.hop,
                                overlap=a.overlap,
                                batch_patches=a.batch_patches,
                                use_pred_mag=a.use_pred_mag,
                                refine_iters=a.refine_iters,
                                mode=a.mode, conv_impl=conv_impl)

    if host_weights:
        # overlapped cold start: the weight upload streams on a worker
        # thread while warm() AOT-compiles (or restores from the
        # persistent cache) the patch-batch U-Net executable from shapes
        # alone — max(upload, restore) instead of upload + restore.
        # fused mode skips warm(): its whole-track graph shape needs the
        # first track's length, which isn't known yet.
        from phasegen_tpu.infer.upload import device_put_async

        fut = device_put_async((params, norm_state))
        if a.mode == "chunked":
            stream.warm(params, norm_state)
        params, norm_state = fut.result()
    def job_feed():
        yield from zip(jobs, outputs)
        if not a.serve:
            return
        # resident server: weights + executables stay on device; each
        # stdin line is one job at steady-state latency (no per-process
        # cold start). Blank line or EOF shuts down.
        import sys

        print("serving: one 'IN_WAV OUT_WAV' job per line "
              "(shell-style quoting for paths with spaces)", flush=True)
        for line in sys.stdin:
            line = line.strip()
            if not line:
                break
            import shlex

            try:
                parts = shlex.split(line)
            except ValueError:
                parts = []
            if len(parts) != 2:
                print(f"bad job line (want 'IN_WAV OUT_WAV'): {line!r}",
                      flush=True)
                continue
            yield parts[0], parts[1]

    total_audio = total_dt = 0.0
    n_jobs = 0
    for src, dst in job_feed():
        # in serve mode ANY per-job failure (unreadable input, bad output
        # path, non-finite audio refused by write_wav) must not kill the
        # resident server — dropping it repays the whole cold start
        try:
            audio, sr = read_wav(src)
            if sr != a.sr:
                audio = resample(audio, sr, a.sr)
            start = time.time()
            out = np.asarray(stream(params, norm_state, jnp.asarray(audio)))
            dt = time.time() - start
            write_wav(dst, out, a.sr)
        except (OSError, ValueError) as e:
            if not a.serve:
                raise
            print(f"skipping {src}: {e}", flush=True)
            continue
        total_audio += len(out) / a.sr
        total_dt += dt
        n_jobs += 1
        # first call compiles: chunked mode compiles the patch-batch
        # U-Net once + cheap DSP graphs; fused mode compiles the whole-
        # track program (minutes for the 612M model). The persistent
        # compilation cache makes repeat processes skip both.
        note = (" [includes one-time XLA compile]" if n_jobs == 1 else "")
        print(f"wrote {dst}: {len(out) / a.sr:.1f}s in {dt:.2f}s "
              f"({len(out) / a.sr / dt:.1f} audio-seconds/sec){note}",
              flush=True)
    if n_jobs > 1:
        print(f"total: {total_audio:.1f}s audio in {total_dt:.2f}s "
              f"({total_audio / total_dt:.1f} audio-seconds/sec)")


if __name__ == "__main__":
    main()
