"""Benchmark harness: e2e STFT -> U-Net -> ISTFT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_seconds_per_sec_per_chip",
   "vs_baseline": N}

``value`` is the measured steady-state throughput of the fused inference
graph (full-size 612M-param U-Net, bf16 compute, 4.064 s clips at
n_fft=2048 hop=512 — the reference demo geometry, reference:
demo.py:33-45). ``vs_baseline`` divides by the CPU reference throughput
measured on this machine by benchmarks/cpu_reference.py (torch-CPU
forward of the exact reference architecture + host numpy ISTFT).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured by benchmarks/cpu_reference.py on this machine (torch-CPU
# reference demo path, mean of 3 clips: 3.030 sec/clip). See BASELINE.md.
CPU_REFERENCE_AUDIO_SEC_PER_SEC = 1.341

SR = 16000
T_SLICE = 65024  # 4.064 s
BATCH = 8
REPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from phasegen_tpu.infer.pipeline import build_infer_fn
    from phasegen_tpu.models import UNetConfig, unet_init

    cfg = UNetConfig(input_nc=1024, output_nc=2048, length=128,
                     compute_dtype=jnp.bfloat16)
    params, norm_state = unet_init(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    jax.block_until_ready(params)

    t = np.arange(T_SLICE) / SR
    wav = np.stack([
        (0.4 * np.sin(2 * np.pi * (330 + 45 * i) * t)
         + 0.2 * np.sin(2 * np.pi * (660 + 45 * i) * t)).astype(np.float32)
        for i in range(BATCH)
    ])
    wav = jnp.asarray(wav)

    infer = build_infer_fn(cfg, n_fft=2048, hop=512)
    # compile + warmup
    infer(params, norm_state, wav)[0].block_until_ready()

    start = time.time()
    for _ in range(REPS):
        out, _ = infer(params, norm_state, wav)
    out.block_until_ready()
    dt = (time.time() - start) / REPS

    audio_sec = BATCH * (T_SLICE / SR)
    value = audio_sec / dt
    print(json.dumps({
        "metric": "e2e STFT->UNet->ISTFT throughput (612M U-Net, bf16, "
                  f"batch {BATCH}, 4.064s clips)",
        "value": round(value, 1),
        "unit": "audio_seconds_per_sec_per_chip",
        "vs_baseline": round(value / CPU_REFERENCE_AUDIO_SEC_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
