"""A/B: fused Pallas ISTFT kernel vs the XLA GEMM ISTFT at serving batch.

    python benchmarks/istft_ab.py [--batches 1,2,4,8,16,32,64]

Times (re, im) DC-dropped pairs -> waveform through
  * XLA: istft_ri on add_dc'd inputs (ops/dft.py, the production path),
  * Pallas: istft_ri_pallas over an fft_tile sweep (the DC-drop contract
    is folded into the kernel's matrices),
and checks numerics (max |dy| vs XLA). The decision rule is the same as
for the analysis kernel (BASELINE.md): auto-on the kernel where it wins
on hardware, otherwise delete it.

Timing: chained windows (each call consumes a scalar derived from the
previous output) with one scalar fence per window, amortizing the
tunnel's ~36 ms round trip.
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
    p.add_argument("--batches", default="1,2,4,8,16,32,64")
    p.add_argument("--chain", default=16, type=int)
    p.add_argument("--windows", default=3, type=int)
    p.add_argument("--tiles", default="256,512,1024")
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--frames", default=128, type=int)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from phasegen_tpu.ops.dft import istft_ri
    from phasegen_tpu.ops.pallas.istft_fused import istft_ri_pallas
    from phasegen_tpu.ops.stft import add_dc

    hop = a.n_fft // 4
    bins = a.n_fft // 2
    rng = np.random.default_rng(0)

    def bench(fn, re, im, label):
        def window(k):
            eps = jnp.zeros((), jnp.float32)
            for _ in range(k):
                out = fn(re + eps, im)
                eps = jnp.sum(out[..., :1]) * 0.0
            return float(eps)

        window(2)  # compile + warm
        ts = []
        for _ in range(a.windows):
            t0 = time.perf_counter()
            window(a.chain)
            ts.append((time.perf_counter() - t0) / a.chain)
        ms = float(np.median(ts)) * 1000
        print(f"  {label}: {ms:.3f} ms", flush=True)
        return ms

    for b in [int(v) for v in a.batches.split(",")]:
        re = jax.device_put(jnp.asarray(
            rng.standard_normal((b, bins, a.frames)).astype(np.float32)))
        im = jax.device_put(jnp.asarray(
            rng.standard_normal((b, bins, a.frames)).astype(np.float32)))
        print(f"B={b}:", flush=True)

        xla = jax.jit(lambda r, i: istft_ri(add_dc(r), add_dc(i),
                                            a.n_fft, hop))
        ref = np.asarray(xla(re, im))
        bench(xla, re, im, "XLA GEMM istft_ri")
        for tile in [int(t) for t in a.tiles.split(",")]:
            pal = jax.jit(lambda r, i, t=tile: istft_ri_pallas(
                r, i, a.n_fft, hop, fft_tile=t))
            try:
                dy = np.abs(np.asarray(pal(re, im)) - ref).max()
            except Exception as e:  # VMEM overflow etc.
                print(f"  pallas fft_tile={tile}: FAILED "
                      f"({type(e).__name__})", flush=True)
                continue
            bench(pal, re, im, f"pallas fft_tile={tile} (dmax {dy:.2e})")


if __name__ == "__main__":
    main()
