"""Single-chip bf16 serving bench of the 2.85B high-res stereo config.

VERDICT r3 #6 asked for a fresh number: round 1 measured 42.9 ms/batch-4
(379 audio-sec/sec) before the fused-pipeline and upload work landed.
Geometry matches benchmarks/dryrun_2850m.py (BASELINE.json configs[3]):
stereo 2048-bin patches stacked on the channel axis (input_nc=2048),
one extra U-Net stage, bf16 params + compute — 2.852B params, 5.7 GB
resident.

    python benchmarks/serve_2850m.py [--batches 4,8,16] [--reps 5]

Prints one JSON line per batch size (scalar-fenced timing, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
T_SLICE = 65024  # 4.064 s


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="4,8,16")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="")
    from phasegen_tpu.cache import add_cache_flag, enable_unless_disabled
    from phasegen_tpu.obs.watchdog import add_wait_flag, gate_backend

    add_cache_flag(p)
    add_wait_flag(p)
    a = p.parse_args(argv)
    enable_unless_disabled(a)
    gate_backend(a)
    from phasegen_tpu.obs.watchdog import device_liveness_probe

    device_liveness_probe()

    import jax
    import jax.numpy as jnp

    from phasegen_tpu.infer.pipeline import build_infer_fn
    from phasegen_tpu.models import UNetConfig, unet_init

    cfg = UNetConfig(input_nc=2048, output_nc=4096, length=128,
                     extra_depth=1, compute_dtype=jnp.bfloat16,
                     param_dtype=jnp.bfloat16)
    params, norm_state = unet_init(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    infer = build_infer_fn(cfg, n_fft=2048, hop=512, channels=2)

    out_f = open(a.out, "w") if a.out else None
    for batch in (int(s) for s in a.batches.split(",") if s.strip()):
        t = np.arange(T_SLICE) / SR
        wav = np.stack([
            np.stack([
                (0.4 * np.sin(2 * np.pi * (220 + 3 * i + c) * t)).astype(
                    np.float32)
                for c in range(2)
            ])
            for i in range(batch)
        ])
        wav = jnp.asarray(wav)

        def run():
            out, _ = infer(params, norm_state, wav)
            return float(jnp.sum(out))  # completion fence

        try:
            run()  # compile + warm
            times = []
            for _ in range(a.reps):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0)
        except Exception as e:  # e.g. HBM OOM at the largest batch:
            # keep the smaller-batch rows (written incrementally below)
            print(json.dumps({"batch": batch, "error": str(e)[:300]}),
                  flush=True)
            continue
        dt = float(np.median(times))
        audio_sec = batch * (T_SLICE / SR)  # stereo clip = clip-seconds
        rec = {
            "metric": "2.85B hi-res stereo fused serving (bf16, "
                      f"batch {batch})",
            "n_params": n_params,
            "batch": batch,
            "ms_per_call": round(dt * 1e3, 1),
            "audio_sec_per_sec": round(audio_sec / dt, 1),
        }
        print(json.dumps(rec), flush=True)
        if out_f is not None:
            out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
    if out_f is not None:
        out_f.close()


if __name__ == "__main__":
    main()
