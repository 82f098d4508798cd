"""Training-step efficiency sweep: ms/step and TFLOPS vs batch size.

    python benchmarks/train_sweep.py [--batches 16,64,128] [--remat]
        [--mu_dtype bfloat16] [--decompose] [--chain 10]

Measures the full donated train step (612M U-Net, bf16 compute) at
production batch sizes, reporting model TFLOPS from the analytic conv
FLOP count (fwd = 2*C_in*C_out*k*L MACs per stage; train = 3x fwd for
the standard grad-of-conv backward).

Methodology: steps chain on device — step k+1 consumes step k's state —
so a window of --chain steps runs back-to-back with ONE scalar fence at
the end. This matches production (the loop only syncs at log points) and
amortizes the ~36 ms tunnel round-trip that a per-call fence would add
to every step. --decompose additionally times forward-only and
grad-only graphs (gradients are fenced via a weight-grad leaf so XLA
cannot dead-code-eliminate the backward).

Memory note: one 612M TrainState (f32 params + Adam) is ~6-7 GB on a
16 GB chip — the sweep keeps exactly one state alive at a time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_flops_per_sample(cfg) -> float:
    """Analytic forward MAC*2 count of all convs for one sample."""
    from phasegen_tpu.models.unet import stage_specs

    total = 0.0
    for st in stage_specs(cfg):
        # down conv: L_out output positions, C_in*k MACs per output chan
        total += 2.0 * st.c_in * st.c_out * st.k * st.l_out
        # up (transposed) conv: each of its L_out(=st.l_out) input
        # positions scatters k taps across up_c_out channels
        total += 2.0 * st.up_c_in * st.up_c_out * st.up_k * st.l_out
    return total


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="16,64,128")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--mu_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--decompose", action="store_true")
    p.add_argument("--chain", default=10, type=int,
                   help="steps per timed window (single fence)")
    p.add_argument("--windows", default=3, type=int)
    p.add_argument("--wav_weight", default=0.0, type=float,
                   help=">0 adds the waveform-domain aux loss to the "
                        "timed step (overhead A/B for --wav_weight)")
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from phasegen_tpu.models import UNetConfig
    from phasegen_tpu.train import build_train_step, create_train_state
    from phasegen_tpu.train.state import make_optimizer
    from phasegen_tpu.train.step import loss_fn, ri_to_logmag_phase

    cfg = UNetConfig(
        input_nc=1024, output_nc=2048, length=128,
        compute_dtype=jnp.bfloat16 if a.compute_dtype == "bfloat16"
        else jnp.float32,
        remat=a.remat)
    fwd_flops = conv_flops_per_sample(cfg)
    print(f"analytic fwd conv FLOPs/sample: {fwd_flops / 1e9:.1f} G "
          f"(train ~ {3 * fwd_flops / 1e9:.1f} G)", flush=True)

    mu = jnp.bfloat16 if a.mu_dtype == "bfloat16" else None
    opt = make_optimizer(1e-3, mu_dtype=mu)
    rng = np.random.default_rng(0)

    for b in [int(x) for x in a.batches.split(",")]:
        batch = jax.device_put(jnp.asarray(
            rng.standard_normal((b, 2, 1024, 128)).astype(np.float32)))
        state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = build_train_step(cfg, opt, wav_weight=a.wav_weight)

        def window(state, k):
            for _ in range(k):
                state, m = step(state, batch)
            return state, float(jnp.sum(m["loss"]))  # single fence

        try:
            state, _ = window(state, 2)  # warm/compile
            times = []
            for _ in range(a.windows):
                t0 = time.perf_counter()
                state, _ = window(state, a.chain)
                times.append((time.perf_counter() - t0) / a.chain)
            ms = float(np.median(times)) * 1000
        except Exception as e:  # OOM etc.
            print(f"B={b}: FAILED ({type(e).__name__})", flush=True)
            del state, batch
            continue
        tflops = 3 * fwd_flops * b / (ms / 1e3) / 1e12
        print(f"B={b}: {ms:.1f} ms/step  {tflops:.1f} TFLOPS  "
              f"{b * 4.064 / (ms / 1e3):.0f} audio-sec/sec", flush=True)

        if a.decompose:
            params, norm_state = state.params, state.norm_state

            # forward-only: chain by feeding the loss back into the input
            # (keeps calls dependent without state donation)
            fwd = jax.jit(lambda p, s, x, eps: loss_fn(
                p, s, *ri_to_logmag_phase(x + eps), cfg, 0.2, True)[0])

            def fwd_window(k):
                eps = jnp.zeros((), jnp.float32)
                for _ in range(k):
                    eps = fwd(params, norm_state, batch, eps) * 0.0
                return float(jnp.sum(eps))

            # grad-only: fence through a weight-gradient leaf so the
            # backward survives DCE; chain via the same trick
            def gradval(p, s, x, eps):
                g = jax.grad(
                    lambda pp: loss_fn(pp, s, *ri_to_logmag_phase(x + eps),
                                       cfg, 0.2, True)[0])(p)
                return sum(jnp.sum(jnp.abs(w["w"][:1, :1]))
                           for w in g["down"])

            gradf = jax.jit(gradval)

            def grad_window(k):
                eps = jnp.zeros((), jnp.float32)
                for _ in range(k):
                    eps = gradf(params, norm_state, batch, eps) * 0.0
                return float(jnp.sum(eps))

            for name, fn in (("fwd-only", fwd_window),
                             ("fwd+bwd", grad_window)):
                fn(2)
                ts = []
                for _ in range(a.windows):
                    t0 = time.perf_counter()
                    fn(a.chain)
                    ts.append((time.perf_counter() - t0) / a.chain)
                m = float(np.median(ts)) * 1000
                mult = 1 if name == "fwd-only" else 3
                tf = mult * fwd_flops * b / (m / 1e3) / 1e12
                print(f"  {name}: {m:.1f} ms ({tf:.1f} TFLOPS)", flush=True)
            del params, norm_state
        del state, batch


if __name__ == "__main__":
    main()
