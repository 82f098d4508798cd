"""2.85B high-res config: sharded-training dryrun on the virtual mesh.

The high-res config (BASELINE.json configs[3]: stereo 2048-pt patches,
extra U-Net depth -> 2.85B params) cannot train on one 16 GB chip: the
f32 Adam state alone is ~34 GB. This script proves the training story on
an 8-device virtual CPU mesh at FULL parameter scale — the first case
where the (data, model) mesh is *necessary* rather than merely
equivalent:

  * the f32 TrainState (params + both Adam moments, ~34 GB) is created
    directly into its mesh sharding (jit + out_shardings: no single
    device ever holds the full tree),
  * the DP x TP train step (parallel/dp.py) runs ONE real optimizer step
    with remat'd U-Net stages,
  * per-device resident bytes are measured from the live sharded state
    (every leaf's addressable shards), giving the per-chip HBM budget
    table for BASELINE.md.

Run:  python benchmarks/dryrun_2850m.py [--data 2 --model 4 --batch 2]
Writes MULTICHIP_2850M.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must be set before jax initializes its backend
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def per_device_bytes(tree) -> dict[str, int]:
    """Sum of addressable-shard bytes per device for a sharded pytree."""
    out: dict[str, int] = {}
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for shard in leaf.addressable_shards:
            k = str(shard.device)
            out[k] = out.get(k, 0) + shard.data.nbytes
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=int, default=2)
    p.add_argument("--model", type=int, default=4)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--out", default="MULTICHIP_2850M.json")
    a = p.parse_args()

    from phasegen_tpu.models.unet import UNetConfig
    from phasegen_tpu.parallel.dp import build_dp_train_step
    from phasegen_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        state_shardings,
    )
    from phasegen_tpu.train.state import create_train_state, make_optimizer

    # the 2.85B high-res config: stereo 2048-pt (2*1024 stacked bins),
    # one extra U-Net stage, bf16 compute, remat'd stages
    cfg = UNetConfig(input_nc=2048, output_nc=4096, length=128,
                     extra_depth=1, compute_dtype=jnp.bfloat16, remat=True)
    opt = make_optimizer(1e-3)

    abstract = jax.eval_shape(
        lambda: create_train_state(jax.random.PRNGKey(0), cfg, opt))
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(abstract.params))
    state_bytes = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree.leaves(abstract) if hasattr(l, "shape"))
    print(f"config: {n_params / 1e9:.3f}B params, "
          f"f32 train state {state_bytes / 1e9:.1f} GB")

    mesh = make_mesh(n_data=a.data, n_model=a.model)
    st_shard = state_shardings(mesh, abstract)

    # initialize DIRECTLY into the sharding: with out_shardings set, XLA
    # partitions the init program itself — no device (and on this host,
    # no transient) ever materializes the unsharded 34 GB tree
    t0 = time.time()
    init = jax.jit(lambda k: create_train_state(k, cfg, opt),
                   out_shardings=st_shard)
    with mesh:
        state = init(jax.random.PRNGKey(0))
    jax.block_until_ready(state.params)
    t_init = time.time() - t0
    print(f"sharded init: {t_init:.1f}s")

    dev_bytes = per_device_bytes(state)
    for d in sorted(dev_bytes):
        print(f"  {d}: {dev_bytes[d] / 1e9:.2f} GB state resident")
    max_gb = max(dev_bytes.values()) / 1e9

    step = build_dp_train_step(cfg, opt, mesh, abstract, batch_ndim=4)
    batch = jax.device_put(
        np.random.default_rng(0)
        .normal(size=(a.batch, 2, 2048, 128)).astype(np.float32),
        batch_sharding(mesh, 4))

    t0 = time.time()
    state, metrics = step(state, batch)
    loss = float(jax.device_get(metrics["loss"]))
    t_step = time.time() - t0
    print(f"step 1 (compile+run): {t_step:.1f}s  loss={loss:.4f}")
    assert np.isfinite(loss), "non-finite loss in 2.85B sharded step"
    assert int(jax.device_get(state.step)) == 1

    report = {
        "config": "high-res stereo 2048-pt, extra_depth=1 (BASELINE "
                  "configs[3])",
        "n_params_b": round(n_params / 1e9, 3),
        "state_bytes_gb": round(state_bytes / 1e9, 2),
        "mesh": {"data": a.data, "model": a.model},
        "batch": a.batch,
        "remat": True,
        "per_device_state_gb": {d: round(b / 1e9, 3)
                                for d, b in sorted(dev_bytes.items())},
        "max_device_state_gb": round(max_gb, 3),
        "fits_16gb_chip": bool(max_gb < 12.0),  # leave room for acts/grads
        "init_s": round(t_init, 1),
        "step1_s": round(t_step, 1),
        "loss": loss,
        "ok": True,
    }
    with open(a.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in
                      ("n_params_b", "state_bytes_gb", "mesh",
                       "max_device_state_gb", "fits_16gb_chip", "ok")}))


if __name__ == "__main__":
    main()
