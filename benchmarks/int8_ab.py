"""A/B: int8 MXU arithmetic vs bf16 convs for small-batch serving.

    python benchmarks/int8_ab.py [--batches 1,2,4,8,32]

At small batch the 612M U-Net forward is weight-bound: every step streams
~0.6-2.4 GB of weights from HBM. Candidates:

  * bf16 dense     — plain unet_apply on bf16 weights (1.2 GB reads),
  * int8 storage   — build_quantized_forward: int8 weights (0.6 GB reads)
                     dequantized in-graph, bf16 MXU math,
  * int8 arith     — build_int8_forward: int8 weights AND int8 x int8 ->
                     int32 MXU math (2x bf16 MAC rate on v5e), dynamic
                     per-tensor activation quant.

Timing: chained windows (each call consumes a scalar derived from the
previous output) with one scalar fence per window — the tunnel's ~36 ms
round trip is paid once per window, not per call. Numerics: max output
delta vs the f32 forward, reported per path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2,4,8,32")
    p.add_argument("--chain", default=8, type=int)
    p.add_argument("--windows", default=3, type=int)
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--micro", action="store_true",
                   help="also time raw int8 vs bf16 GEMMs — does int8 "
                        "actually hit a faster MXU path on this chip?")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if a.micro:
        from jax import lax

        for n in (2048, 4096, 8192):
            ab = jnp.asarray(np.random.default_rng(0)
                             .standard_normal((n, n)), jnp.bfloat16)
            i8 = jnp.clip(jnp.asarray(
                np.random.default_rng(1).integers(-127, 127, (n, n)),
                jnp.int8), -127, 127)

            def t(f, x):
                out = f(x, x)  # compile + warm
                float(jnp.sum(out[:1, :1].astype(jnp.float32)))  # fence!
                t0 = time.perf_counter()
                # chain: each call consumes the previous output so the 8
                # dispatches serialize on device, one fence at the end
                for _ in range(8):
                    x = f(x, x)[:, :].astype(x.dtype)
                float(jnp.sum(x[:1, :1].astype(jnp.float32)))
                return (time.perf_counter() - t0) / 8 * 1000

            mm_bf = jax.jit(lambda x, y: lax.dot(
                x, y, preferred_element_type=jnp.float32))
            mm_i8 = jax.jit(lambda x, y: lax.dot(
                x, y, preferred_element_type=jnp.int32))
            print(f"micro GEMM {n}x{n}: bf16 {t(mm_bf, ab):.2f} ms, "
                  f"int8 {t(mm_i8, i8):.2f} ms", flush=True)

    from phasegen_tpu.infer.quantize import (
        attach_act_scales,
        build_int8_forward,
        build_quantized_forward,
        calibrate_act_scales,
        quantize_params,
    )
    from phasegen_tpu.models import UNetConfig, unet_apply, unet_init

    bins = a.n_fft // 2
    cfg_bf16 = UNetConfig(input_nc=bins, output_nc=2 * bins, length=128,
                          compute_dtype=jnp.bfloat16)
    params, state = unet_init(jax.random.PRNGKey(0), cfg_bf16)
    qparams = jax.device_put(quantize_params(params))
    params_bf16 = jax.device_put(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))
    state = jax.device_put(state)

    fwd_bf16 = jax.jit(lambda pr, st, x: unet_apply(pr, st, x, cfg_bf16,
                                                    training=False)[0])
    fwd_q = build_quantized_forward(cfg_bf16)
    fwd_i8 = build_int8_forward(cfg_bf16)

    rng = np.random.default_rng(0)

    def bench(fn, args_fn, x, label):
        def window(k):
            eps = jnp.zeros((), jnp.float32)
            for _ in range(k):
                out = fn(*args_fn(x + eps.astype(x.dtype)))
                eps = (jnp.sum(out[0, 0, :1]) * 0.0).astype(jnp.float32)
            return float(eps)

        window(2)  # compile + warm
        ts = []
        for _ in range(a.windows):
            t0 = time.perf_counter()
            window(a.chain)
            ts.append((time.perf_counter() - t0) / a.chain)
        ms = float(np.median(ts)) * 1000
        print(f"  {label}: {ms:.2f} ms/fwd", flush=True)
        return ms

    for b in [int(v) for v in a.batches.split(",")]:
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((b, bins, 128)).astype(np.float32)))
        print(f"B={b}:", flush=True)
        ref = np.asarray(fwd_bf16(params_bf16, state, x), np.float32)
        scale = np.abs(ref).std() + 1e-8
        bench(fwd_bf16, lambda x: (params_bf16, state, x), x, "bf16 dense")
        dq = np.abs(np.asarray(fwd_q(qparams, state, x), np.float32)
                    - ref).max() / scale
        bench(fwd_q, lambda x: (qparams, state, x), x,
              f"int8 storage (dmax {dq:.3f}σ)")
        d8 = np.abs(np.asarray(fwd_i8(qparams, state, x), np.float32)
                    - ref).max() / scale
        bench(fwd_i8, lambda x: (qparams, state, x), x,
              f"int8 arith   (dmax {d8:.3f}σ)")
        # static calibrated activation scales: no per-conv max-reduce
        scales = calibrate_act_scales(params, state, [x[:1]], cfg_bf16)
        qparams_s = jax.device_put(attach_act_scales(qparams, scales))
        ds = np.abs(np.asarray(fwd_i8(qparams_s, state, x), np.float32)
                    - ref).max() / scale
        bench(fwd_i8, lambda x: (qparams_s, state, x), x,
              f"int8 arith-static (dmax {ds:.3f}σ)")


if __name__ == "__main__":
    main()
