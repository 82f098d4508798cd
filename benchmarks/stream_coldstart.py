"""Streaming first-call latency: chunked vs fused, cold vs cached.

    python benchmarks/stream_coldstart.py --weight runs/wav612m \
        [--mode chunked|fused] [--seconds 60] [--no_cache]

Measures the two fixes for VERDICT r2 #4 (the ~200 s whole-track XLA
compile on first use):
  * mode=chunked — the U-Net executable compiles once at the fixed
    patch-batch shape; per-bucket DSP graphs are cheap,
  * the persistent compilation cache — run this script twice and the
    second process's "first call" deserializes instead of compiling.

Prints one JSON line:
{mode, quantize, overlap, prep_s, warm_s, upload_join_s, first_s,
steady_s, audio_s, cache}. The cross-config cold-start total is
prep_s + warm_s + upload_join_s + first_s (warm_s/upload_join_s are 0
for --no_overlap runs, whose upload enqueue sits in prep_s and whose
in-flight bytes land in first_s). With overlap on, warm_s is the
compile/restore that now hides under the transfer and upload_join_s is
the fenced wait for the transfer to actually finish afterwards.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weight", default="")
    p.add_argument("--mode", default="chunked",
                   choices=["chunked", "fused"])
    p.add_argument("--seconds", default=60.0, type=float)
    p.add_argument("--sr", default=16000, type=int)
    p.add_argument("--batch_patches", default=8, type=int)
    p.add_argument("--refine_iters", default=0, type=int)
    p.add_argument("--quantize", default="none", choices=["none", "store"],
                   help="'store': host int8 quantization — uploads ~0.6 GB "
                        "instead of the dense tree (docs/NEXT.md lead #5)")
    p.add_argument("--no_overlap", action="store_true",
                   help="disable the overlapped cold start (async upload "
                        "+ shape-only AOT warm) to measure the serial "
                        "baseline")
    p.add_argument("--no_cache", action="store_true")
    a = p.parse_args(argv)

    if not a.no_cache:
        from phasegen_tpu.cache import enable_compilation_cache

        enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from phasegen_tpu.config import DemoConfig
    from phasegen_tpu.infer.stream import build_stream_infer
    from phasegen_tpu.train.state import create_train_state

    cfg = DemoConfig(weight=a.weight).model_config()
    conv_impl = None
    overlap_warm = bool(a.weight) and not a.no_overlap
    t0 = time.time()
    if a.weight:
        from phasegen_tpu.cli.demo import load_weights

        # overlapped path loads HOST trees (cli/stream.py flow); serial
        # baseline keeps the historical synchronous upload
        params, norm_state = load_weights(
            a.weight, cfg,
            device=(a.quantize == "none" and not overlap_warm),
            host_serving=(a.quantize == "none" and overlap_warm))
    else:
        st = create_train_state(jax.random.PRNGKey(0), cfg)
        params, norm_state = st.params, st.norm_state
    if a.quantize == "store":
        from phasegen_tpu.infer.quantize import (
            INT8_STORE_IMPL,
            quantize_for_serving,
            quantize_params_host,
        )

        if overlap_warm:
            params = quantize_params_host(params)
        else:
            params = quantize_for_serving(params)
            norm_state = jax.device_put(norm_state)
        conv_impl = INT8_STORE_IMPL
    # prep_s = disk load (+ host quantize) + upload enqueue; any
    # still-in-flight transfer bytes land in first_s, so the cold-start
    # total to compare across modes is prep_s + first_s
    prep = time.time() - t0

    t = np.arange(int(a.seconds * a.sr)) / a.sr
    wav = jnp.asarray((0.4 * np.sin(2 * np.pi * 220 * t)
                       + 0.3 * np.sin(2 * np.pi * 554.4 * t)
                       + 0.2 * np.sin(2 * np.pi * 1318.5 * t))
                      .astype(np.float32))

    stream = build_stream_infer(cfg, overlap=64,
                                batch_patches=a.batch_patches,
                                refine_iters=a.refine_iters, mode=a.mode,
                                conv_impl=conv_impl)

    warm_s = upload_join_s = 0.0
    if overlap_warm:
        # async upload + shape-only AOT warm, exactly as cli/stream.py:
        # warm_s is the compile/restore time that now hides under the
        # transfer; upload_join_s is what the transfer still costs AFTER
        # the warm — near-zero when compile dominates, the residual
        # upload tail when bandwidth dominates
        from phasegen_tpu.infer.upload import device_put_async

        t0 = time.time()
        fut = device_put_async((params, norm_state))
        if a.mode == "chunked":
            stream.warm(params, norm_state)
        else:
            stream.warm(params, norm_state, track_len=wav.shape[-1])
        warm_s = time.time() - t0
        t0 = time.time()
        params, norm_state = fut.result()
        # fence the transfer: fut.result() returns when device_put
        # RETURNS, not when bytes land (CLAUDE.md: block_until_ready
        # also lies on this tunnel). Scalar-fetch the largest leaf
        # (finishes last if transfers multiplex) AND the last-issued
        # leaf (finishes last if the link serializes in order); any
        # residual stragglers land in first_s.
        leaves = jax.tree.leaves((params, norm_state))
        for leaf in {id(l): l for l in
                     (max(leaves, key=lambda l: l.size),
                      leaves[-1])}.values():
            float(jnp.sum(leaf.astype(jnp.float32)))
        upload_join_s = time.time() - t0

    t0 = time.time()
    out = stream(params, norm_state, wav)
    float(jnp.sum(out))  # fence (block_until_ready lies on the tunnel)
    first = time.time() - t0
    t0 = time.time()
    out = stream(params, norm_state, wav)
    float(jnp.sum(out))  # fence
    steady = time.time() - t0

    print(json.dumps({"mode": a.mode, "quantize": a.quantize,
                      "overlap": overlap_warm,
                      "prep_s": round(prep, 2),
                      "warm_s": round(warm_s, 2),
                      "upload_join_s": round(upload_join_s, 2),
                      "first_s": round(first, 2),
                      "steady_s": round(steady, 3),
                      "audio_s": a.seconds,
                      "cache": not a.no_cache}))


if __name__ == "__main__":
    main()
