"""A/B: fused Pallas analysis kernel vs XLA GEMM-STFT at production batch.

    python benchmarks/analysis_ab.py [--batches 32,128,512]

For each batch size, times wav -> (logmag, phase) through
  * XLA: stft_ri + logmag_phase_ri (separate GEMMs + fused epilogue),
  * Pallas: stft_logmag_phase_pallas over a (frame_tile, bin_tile) sweep,
and checks Pallas numerics against XLA (max |dlogmag|, phase wrap diff).

Timing: chained windows (each call consumes a scalar derived from the
previous output) with one fence, amortizing the tunnel round trip.
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
    p.add_argument("--batches", default="32,128,512")
    p.add_argument("--chain", default=8, type=int)
    p.add_argument("--windows", default=3, type=int)
    p.add_argument("--tiles", default="128x256,256x512,512x512,512x1024")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from phasegen_tpu.ops.dft import logmag_phase_ri, stft_ri
    from phasegen_tpu.ops.pallas.stft_fused import stft_logmag_phase_pallas
    from phasegen_tpu.ops.stft import drop_dc

    N_FFT, HOP, T = 2048, 512, 65024
    rng = np.random.default_rng(0)

    def xla_fn(wav):
        re, im = stft_ri(wav, N_FFT, HOP)
        return logmag_phase_ri(drop_dc(re), drop_dc(im))

    xla_jit = jax.jit(xla_fn)

    def bench(fn, wav, label):
        def window(k):
            eps = jnp.zeros((), jnp.float32)
            for _ in range(k):
                lm, ph = fn(wav + eps)
                eps = jnp.sum(lm[0, 0, :1]) * 0.0
            return float(eps)

        window(2)
        ts = []
        for _ in range(a.windows):
            t0 = time.perf_counter()
            window(a.chain)
            ts.append((time.perf_counter() - t0) / a.chain)
        ms = float(np.median(ts)) * 1000
        print(f"  {label}: {ms:.2f} ms", flush=True)
        return ms

    tiles = [tuple(int(v) for v in t.split("x")) for t in a.tiles.split(",")]
    for b in [int(x) for x in a.batches.split(",")]:
        wav = jax.device_put(jnp.asarray(
            rng.standard_normal((b, T)).astype(np.float32) * 0.3))
        print(f"B={b}:", flush=True)
        bench(xla_jit, wav, "XLA GEMM-STFT")
        lm_ref, ph_ref = jax.device_get(xla_jit(wav[:2]))
        for ft, bt in tiles:
            fn = jax.jit(lambda w, ft=ft, bt=bt: stft_logmag_phase_pallas(
                w, N_FFT, HOP, frame_tile=ft, bin_tile=bt))
            try:
                lm, ph = jax.device_get(fn(wav[:2]))
            except Exception as e:
                print(f"  pallas ft={ft} bt={bt}: FAILED "
                      f"({type(e).__name__})", flush=True)
                continue
            dlm = float(np.max(np.abs(lm - lm_ref)))
            dph = float(np.max(np.abs(
                np.angle(np.exp(1j * (ph - ph_ref))))))
            try:  # full-batch compile can fail where the 2-row probe fits
                bench(fn, wav, f"pallas ft={ft} bt={bt} "
                               f"(dlogmag {dlm:.1e}, dphase {dph:.1e})")
            except Exception as e:
                print(f"  pallas ft={ft} bt={bt} @B={b}: FAILED "
                      f"({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
