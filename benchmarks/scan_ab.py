"""A/B: --scan_steps multi-step dispatch vs per-step dispatch.

    python benchmarks/scan_ab.py [--batches 16,64,256] [--k 8]
        [--windows 3]

Times the production synthetic-corpus training feed both ways on the
612M flagship:

  A) per-step dispatch: synth_fn(seeds) then step(state, batch), chained
     K calls per fence (the loop's default path);
  B) scan dispatch: ONE build_train_step_scan call runs the same K steps
     inside lax.scan, synthesizing each batch on device from a (K, B)
     seed window (train/step.py:build_train_step_scan).

Both use a single scalar fence per K-step window, so the measured delta
is exactly the per-step host/dispatch + inter-program boundary cost the
scan removes (measured ~77 ms/step fixed at B=1 in train_sweep.py).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,64,256")
    p.add_argument("--k", default=8, type=int, help="steps per window")
    p.add_argument("--windows", default=3, type=int)
    p.add_argument("--mu_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--tiny", action="store_true",
                   help="16-bin CPU smoke of the harness itself")
    a = p.parse_args(argv)

    if a.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.data.device_synth import corpus_stats, synth_patches
    from phasegen_tpu.models import UNetConfig
    from phasegen_tpu.train import build_train_step, create_train_state
    from phasegen_tpu.train.state import make_optimizer
    from phasegen_tpu.train.step import build_train_step_scan

    if a.tiny:
        cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
        geom = dict(t_samples=1016, sr=4000, n_fft=32, hop=8)
    else:
        cfg = UNetConfig(input_nc=1024, output_nc=2048, length=128,
                         compute_dtype=jnp.bfloat16)
        geom = dict(t_samples=65024, sr=16000, n_fft=2048, hop=512)
    mu = jnp.bfloat16 if a.mu_dtype == "bfloat16" else None
    opt = make_optimizer(1e-3, mu_dtype=mu)

    key = jax.random.PRNGKey(0)
    mean, std = corpus_stats(key, 98304, **geom)
    raw = functools.partial(synth_patches, mean=mean, std=std, **geom)
    synth_fn = jax.jit(raw)
    rng = np.random.default_rng(0)

    for b in [int(x) for x in a.batches.split(",")]:
        seeds_np = rng.integers(0, 98304, size=(a.k, b))

        # A: per-step dispatch (loop default)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = build_train_step(cfg, opt)

        def window_a(state):
            for row in seeds_np:
                state, m = step(state, synth_fn(key, jnp.asarray(
                    row, jnp.int32)))
            return state, float(jnp.sum(m["loss"]))  # single fence

        state, _ = window_a(state)  # warm/compile
        times = []
        for _ in range(a.windows):
            t0 = time.perf_counter()
            state, _ = window_a(state)
            times.append((time.perf_counter() - t0) / a.k)
        ms_a = float(np.median(times)) * 1000
        del state

        # B: scan dispatch, same K steps in one program
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        scan = build_train_step_scan(cfg, opt, lambda d, s: raw(d, s))
        xs = jnp.asarray(seeds_np, jnp.int32)
        state, m = scan(state, key, xs)
        float(jnp.sum(m["loss"]))  # warm fence
        times = []
        for _ in range(a.windows):
            t0 = time.perf_counter()
            state, m = scan(state, key, xs)
            float(jnp.sum(m["loss"]))
            times.append((time.perf_counter() - t0) / a.k)
        ms_b = float(np.median(times)) * 1000
        del state

        print(f"B={b} K={a.k}: per-step {ms_a:.1f} ms/step | "
              f"scan {ms_b:.1f} ms/step | "
              f"{(ms_a / ms_b - 1) * 100:+.0f}% throughput "
              f"({b * 4.064 / (ms_b / 1e3):.0f} audio-sec/sec scanned)",
              flush=True)


if __name__ == "__main__":
    main()
