"""Micro-benchmarks: forward / train step / Griffin-Lim / batch scan.

    python benchmarks/micro.py [fwd|train|gl|scan|highres]

All timings fence each call with a scalar fetch (block_until_ready
returns early on tunneled backends — see CLAUDE.md). Numbers from round 1
are recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/micro.py` without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _clean(f, *a, reps=6, label=""):
    import jax.numpy as jnp
    import jax

    r = f(*a)
    _ = float(jnp.sum(jax.tree.leaves(r)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(r)[0]))
        ts.append(time.perf_counter() - t0)
    m = float(np.median(ts)) * 1000
    print(f"{label}: {m:.1f} ms")
    return m


def bench_fwd():
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.models import UNetConfig, unet_init
    from phasegen_tpu.models.unet import unet_apply

    cfg = UNetConfig(input_nc=1024, output_nc=2048, length=128,
                     compute_dtype=jnp.bfloat16)
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    fwd = jax.jit(lambda p, s, x: unet_apply(p, s, x, cfg, training=False)[0])
    for b in (1, 4, 16):
        x = jnp.ones((b, 1024, 128), jnp.float32)
        _clean(fwd, params, state, x, label=f"fwd B={b}")


def bench_train():
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.models import UNetConfig
    from phasegen_tpu.train import build_train_step, create_train_state
    from phasegen_tpu.train.state import make_optimizer

    cfg = UNetConfig(input_nc=1024, output_nc=2048, length=128,
                     compute_dtype=jnp.bfloat16)
    batch = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((16, 2, 1024, 128))
                        .astype(np.float32))
    for mu in (None, jnp.bfloat16):
        opt = make_optimizer(1e-3, mu_dtype=mu)
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = build_train_step(cfg, opt)
        state, m = step(state, batch)
        _ = float(m["loss"])
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            state, m = step(state, batch)
            _ = float(m["loss"])
            ts.append(time.perf_counter() - t0)
        print(f"train step B=16 mu={mu}: {np.median(ts)*1000:.1f} ms")


def bench_gl():
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.ops import griffin_lim
    from phasegen_tpu.ops.dft import stft_ri
    from phasegen_tpu.ops.stft import drop_dc

    t = np.arange(65024) / 16000
    wav = jnp.asarray(np.stack([
        (0.5 * np.sin(2 * np.pi * (300 + 40 * i) * t)).astype(np.float32)
        for i in range(8)]))
    re, im = jax.jit(lambda v: stft_ri(v))(wav)
    mag = jnp.sqrt(drop_dc(re) ** 2 + drop_dc(im) ** 2)
    _clean(lambda m: griffin_lim(m, 2048, 512, 250)[0], mag, reps=3,
           label="GL-250 batch 8")


def bench_scan():
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.infer.pipeline import build_infer_fn
    from phasegen_tpu.models import UNetConfig, unet_init

    cfg = UNetConfig(input_nc=1024, output_nc=2048, length=128,
                     compute_dtype=jnp.bfloat16)
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    infer = build_infer_fn(cfg)
    t = np.arange(65024) / 16000
    for b in (32, 128, 512):
        wav = jnp.asarray(np.stack([
            (0.4 * np.sin(2 * np.pi * (330 + 3 * i) * t)).astype(np.float32)
            for i in range(b)]))
        m = _clean(lambda p, s, w: infer(p, s, w)[0], params, state, wav,
                   reps=5, label=f"fused infer B={b}")
        print(f"  -> {b * 4.064 / (m / 1000):.0f} audio-sec/sec")


def bench_highres():
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.infer.pipeline import build_infer_fn
    from phasegen_tpu.models import UNetConfig, unet_init, unet_param_count

    cfg = UNetConfig(input_nc=2048, output_nc=4096, length=128, extra_depth=1,
                     compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    print(f"high-res stereo deeper: {unet_param_count(cfg)/1e9:.2f} B params")
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    infer = build_infer_fn(cfg, channels=2)
    t = np.arange(65024) / 16000
    wav = jnp.asarray(np.stack([np.stack([
        (0.4 * np.sin(2 * np.pi * (330 + 50 * i + 20 * c) * t)
         ).astype(np.float32) for c in range(2)]) for i in range(4)]))
    m = _clean(lambda p, s, w: infer(p, s, w)[0], params, state, wav,
               reps=5, label="high-res stereo infer B=4")
    print(f"  -> {4 * 4.064 / (m / 1000):.0f} audio-sec/sec")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "scan"
    {"fwd": bench_fwd, "train": bench_train, "gl": bench_gl,
     "scan": bench_scan, "highres": bench_highres}[which]()
