"""Pick the best checkpoint of a fine-tune by whole-val-set MSE.

    python benchmarks/ckpt_select.py --run runs/wavft612m \
        --data dataset/synth_audio_val.npy [--refine_iters 2]

Evaluates every ``ckpt_*_light.npz`` in the run directory over the whole
val shard with ONE compiled validate graph (same shapes -> the graph and
its ragged-tail variant compile once; each further checkpoint is pure
compute + one ~1.2 GB H2D weight upload). GL here defaults to 8 iters:
LMSE/NOPMSE are model-independent, so the expensive GL-250 baseline is
left to the final `cli.evaluate` run on the winner.

Selection metric is pure-model MSE (reference train.py:103-108 semantics
via train/validate.py); MSE_refine{K} columns are reported alongside.
Prints one JSON line per checkpoint and a final ``best`` line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phasegen_tpu.cache import add_cache_flag, enable_unless_disabled
from phasegen_tpu.cli.demo import load_weights
from phasegen_tpu.config import DemoConfig
from phasegen_tpu.data.loader import NpyPatchLoader
from phasegen_tpu.obs.watchdog import device_liveness_probe
from phasegen_tpu.train.validate import build_validate_fn


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Select best fine-tune ckpt.")
    p.add_argument("--run", required=True, help="run dir with ckpt_*_light.npz")
    p.add_argument("--data", required=True, help="val .npy shard")
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--hop", default=512, type=int)
    p.add_argument("--gl_iters", default=8, type=int)
    p.add_argument("--refine_iters", default="2")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--extra_depth", default=0, type=int)
    p.add_argument("--out", default="", help="write the JSON report here too")
    p.add_argument("--serial_weights", action="store_true",
                   help="disable pipelined weight staging (one resident "
                        "weight set at a time — use for the 2.85B config)")
    add_cache_flag(p)
    from phasegen_tpu.obs.watchdog import add_wait_flag, gate_backend

    add_wait_flag(p)
    a = p.parse_args(argv)
    enable_unless_disabled(a)
    gate_backend(a)  # --wait_backend: recovery-gated start
    device_liveness_probe()  # fail fast on a wedged backend (600 s)
    refine = tuple(int(s) for s in a.refine_iters.split(",") if s.strip())

    ckpts = sorted(
        glob.glob(os.path.join(a.run, "ckpt_*_light.npz")),
        key=lambda f: int(re.search(r"ckpt_(\d+)_light", f).group(1)))
    if not ckpts:
        raise SystemExit(f"no ckpt_*_light.npz under {a.run}")

    cfg = DemoConfig(n_fft=a.n_fft, hop=a.hop,
                     compute_dtype=a.compute_dtype,
                     extra_depth=a.extra_depth)
    model_cfg = cfg.model_config()
    validate = build_validate_fn(model_cfg, a.n_fft, a.hop, a.gl_iters,
                                 refine_iters=refine, phase_err=False)

    # Pipelined weight staging: checkpoint i+1's disk load + H2D upload
    # run on a worker thread WHILE checkpoint i evaluates (two weight
    # sets resident: 2 x 1.2 GB bf16 at 612M — fine in 16 GB HBM next to
    # the val graph; pass --serial_weights for the 2.85B config, where
    # two 5.7 GB sets would crowd the activations). The first upload also
    # overlaps the val-graph compile/restore — the repo's biggest single
    # executable (GL-250 runs in-graph).
    from concurrent.futures import ThreadPoolExecutor

    def load_to_device(ck):
        # the serving load path: bf16-stored conv leaves stay bf16 all
        # the way to the upload — half the H2D bytes per checkpoint and
        # no host f32 round-trip; bit-identical bf16-compute outputs
        p, n = load_weights(ck, model_cfg, host_serving=True)
        return jax.device_put((p, n))

    pool = None if a.serial_weights else ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="ckpt-select-stage")
    pending = pool.submit(load_to_device, ckpts[0]) if pool else None

    rows = []
    for idx, ck in enumerate(ckpts):
        step = int(re.search(r"ckpt_(\d+)_light", ck).group(1))
        if pending is not None:
            params, norm_state = pending.result()
            pending = (pool.submit(load_to_device, ckpts[idx + 1])
                       if idx + 1 < len(ckpts) else None)
        else:
            params, norm_state = load_weights(ck, model_cfg)
        loader = NpyPatchLoader([a.data], batch_size=a.batch_size,
                                shuffle=False, prefetch=2, drop_ragged=False)
        sums: dict[str, float] = {}
        n_clips = 0
        for i, batch in enumerate(loader):
            out = validate(params, norm_state, batch,
                           jax.random.fold_in(jax.random.PRNGKey(0), i))
            b = int(batch.shape[0])
            for k, v in out.items():
                if getattr(v, "ndim", None) == 0:
                    sums[k] = sums.get(k, 0.0) + b * float(jax.device_get(v))
            n_clips += b
        row = {k: v / n_clips for k, v in sums.items()}
        row["step"] = step
        row["ckpt"] = ck
        rows.append(row)
        print(json.dumps(row), flush=True)
        # free this checkpoint's set; at most the evaluating + staged
        # sets are ever resident (serial mode: exactly one)
        del params, norm_state

    best = min(rows, key=lambda r: r["MSE"])
    result = {"best": best["ckpt"], "best_step": best["step"],
              "best_mse": best["MSE"], "gl_iters": a.gl_iters,
              "n_clips_each": n_clips, "rows": rows}
    print(json.dumps({"best": best["ckpt"], "best_step": best["step"],
                      "best_mse": best["MSE"]}))
    if a.out:
        with open(a.out, "w") as f:
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
