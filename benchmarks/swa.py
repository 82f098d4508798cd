"""Average light checkpoints (stochastic weight averaging / EMA-by-tail).

    python benchmarks/swa.py --ckpts runs/aw01_612m/ckpt_512_light.npz \
        runs/aw01_612m/ckpt_1024_light.npz --out runs/aw01_612m/swa

The wav-loss fine-tune reaches its optimum within ~512 steps and then
drifts (docs/NEXT.md lead #1); averaging the checkpoints along that
window is the offline equivalent of an in-loop parameter EMA and often
lands below every individual point. This operates purely at the npz
level (train/checkpoint.py:save_params_npz format): bf16-encoded leaves
(__bf16__ keys, uint16 views) are decoded to f32, averaged with the
given --weights (uniform by default), and re-encoded exactly as stored,
so the output is a normal ``ckpt_{step}_light.npz`` consumable by
cli/demo, cli/evaluate and benchmarks/ckpt_select.py. BN running stats
(__norm__ keys) average too — they are running means themselves.

The output step is the weighted mean of the input steps (rounded), so
select tables stay interpretable.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np


def average_npz(paths: list[str], weights: list[float] | None = None) -> dict:
    """Weighted mean of the arrays across ``paths``; returns the dict of
    arrays in the first file's encoding (bf16 keys re-encoded)."""
    import ml_dtypes

    if weights is None:
        weights = [1.0] * len(paths)
    if len(weights) != len(paths):
        raise ValueError(f"{len(weights)} weights for {len(paths)} ckpts")
    wsum = float(sum(weights))
    acc: dict[str, np.ndarray] = {}
    keys = None
    for path, w in zip(paths, weights):
        data = np.load(path)
        if keys is None:
            keys = set(data.files)
        elif set(data.files) != keys:
            raise ValueError(f"{path} has a different key set than {paths[0]}")
        for k in data.files:
            arr = data[k]
            if k.startswith("__bf16__"):
                arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
            else:
                arr = arr.astype(np.float32)
            acc[k] = acc.get(k, 0.0) + (w / wsum) * arr
    out = {}
    for k, arr in acc.items():
        if k.startswith("__bf16__"):
            out[k] = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
        else:
            out[k] = arr  # f32 leaves (step counters live outside the npz)
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Average light checkpoints.")
    p.add_argument("--ckpts", nargs="+", required=True,
                   help="ckpt_*_light.npz files to average")
    p.add_argument("--weights", nargs="*", type=float, default=None,
                   help="per-ckpt weights (default uniform)")
    p.add_argument("--out", required=True,
                   help="output DIRECTORY; writes ckpt_{meanstep}_light.npz")
    a = p.parse_args(argv)

    steps = []
    for f in a.ckpts:
        m = re.search(r"ckpt_(\d+)_light", os.path.basename(f))
        if not m:
            raise SystemExit(
                f"{f}: expected a ckpt_<step>_light.npz filename — the "
                f"output step (and select tables built on it) would be "
                f"meaningless otherwise")
        steps.append(int(m.group(1)))
    w = a.weights or [1.0] * len(a.ckpts)
    if sum(w) <= 0:
        raise SystemExit(f"--weights must sum to > 0, got {w}")
    mean_step = int(round(sum(s * x for s, x in zip(steps, w)) / sum(w)))

    arrays = average_npz(a.ckpts, a.weights)
    os.makedirs(a.out, exist_ok=True)
    path = os.path.join(a.out, f"ckpt_{mean_step}_light.npz")
    if os.path.exists(path):
        # e.g. --out pointed at the run dir itself and the mean step
        # collides with a REAL training checkpoint — never clobber one
        raise SystemExit(f"refusing to overwrite existing {path}; "
                         f"use a fresh --out directory")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    print(f"averaged {len(a.ckpts)} ckpts (steps {steps}) -> {path}")


if __name__ == "__main__":
    main()
