"""Export the fused inference graph as a serialized StableHLO artifact.

    python -m phasegen_tpu.cli.export --weight unet_llr/ --out model.jaxexport \
        [--batch 8] [--n_fft 2048] [--hop 512]

Uses jax.export: the waveform -> waveform phase-regeneration graph
(STFT -> U-Net -> ISTFT) with the weights baked in, serialized to a
portable artifact any JAX process (or StableHLO consumer) can load and
run without this package — the serving hand-off the reference never had.

Round-trip check is built in: the artifact is reloaded and executed on a
test clip before the CLI reports success.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.config import DemoConfig
from phasegen_tpu.infer.pipeline import build_infer_fn
from phasegen_tpu.train.state import create_train_state

T_SLICE = 65024


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Export the inference graph.")
    p.add_argument("--weight", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--hop", default=512, type=int)
    p.add_argument("--t_samples", default=T_SLICE, type=int)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--extra_depth", default=0, type=int)
    p.add_argument("--random_init", action="store_true")
    a = p.parse_args(argv)

    cfg = DemoConfig(n_fft=a.n_fft, hop=a.hop, weight=a.weight,
                     compute_dtype=a.compute_dtype,
                     extra_depth=a.extra_depth)
    model_cfg = cfg.model_config()

    if a.random_init or not a.weight:
        state = create_train_state(jax.random.PRNGKey(0), model_cfg)
        params, norm_state = state.params, state.norm_state
    else:
        from phasegen_tpu.cli.demo import load_weights

        params, norm_state = load_weights(a.weight, model_cfg)

    infer = build_infer_fn(model_cfg, a.n_fft, a.hop)

    @jax.jit
    def serve(wav):  # weights closed over -> baked into the artifact
        audio, _ = infer(params, norm_state, wav)
        return audio

    spec = jax.ShapeDtypeStruct((a.batch, a.t_samples), jnp.float32)
    exported = jax.export.export(serve)(spec)
    blob = exported.serialize()
    with open(a.out, "wb") as f:
        f.write(blob)
    print(f"wrote {a.out}: {len(blob) / 1e6:.1f} MB, "
          f"input {spec.shape}, platforms {exported.platforms}")

    # round-trip: reload and run
    reloaded = jax.export.deserialize(bytearray(blob))
    t = np.arange(a.t_samples) / 16000.0
    wav = jnp.asarray(np.stack(
        [np.sin(2 * np.pi * (300.0 + 40 * i) * t, dtype=np.float32)
         for i in range(a.batch)]))
    out = reloaded.call(wav)
    ok = bool(jnp.all(jnp.isfinite(out))) and out.shape == wav.shape
    print(f"round-trip execute: shape {out.shape}, finite={ok}")
    if not ok:
        raise SystemExit("exported artifact failed the round-trip check")


if __name__ == "__main__":
    main()
