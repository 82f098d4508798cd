"""Convert a reference (torch) checkpoint to this framework's npz format.

The reference trains with torch and saves raw state_dicts as
``ckpt_{cnt}`` (reference: model.py:45-48, train.py:126-127). This CLI
converts such a file into the weights-only npz that every consumer here
accepts (``cli.demo --weight``, ``cli.evaluate --weight``,
``cli.train --init_from``, ``cli.stream --weight``):

    python -m phasegen_tpu.cli.import_torch \
        --weight unet_llr/ckpt_120000 --out unet_llr/ckpt_120000.npz

BatchNorm running statistics are carried over, so eval-mode inference
matches the torch model's eval mode (parity pinned in
tests/test_torch_import.py against a module-level torch oracle).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Import a reference torch U-Net checkpoint")
    p.add_argument("--weight", required=True,
                   help="torch checkpoint file (state_dict of UNetModel"
                        ".model, the reference's ckpt_{cnt} format)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--input_nc", type=int, default=1024)
    p.add_argument("--output_nc", type=int, default=2048)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--extra_depth", type=int, default=0)
    p.add_argument("--norm", default="batch",
                   choices=["batch", "instance", "none"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="npz storage dtype (bfloat16 halves the file)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import jax

    # Pure host-side format conversion — never claim the TPU for it.
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backends already initialized (e.g. under pytest)
    from phasegen_tpu.models.unet import UNetConfig, unet_param_count
    from phasegen_tpu.torch_ckpt import load_torch_checkpoint
    from phasegen_tpu.train.checkpoint import save_params_npz

    cfg = UNetConfig(input_nc=args.input_nc, output_nc=args.output_nc,
                     length=args.length, extra_depth=args.extra_depth,
                     norm=args.norm)
    params, norm_state = load_torch_checkpoint(args.weight, cfg)
    n_params = sum(int(np.asarray(x).size) for x in jax.tree.leaves(params))
    expected = unet_param_count(cfg)
    if n_params != expected:
        raise ValueError(f"imported {n_params:,} params but the "
                         f"architecture has {expected:,}")
    save_params_npz(args.out, params, norm_state, dtype=args.dtype)
    print(f"Imported {n_params:,} params from {args.weight} -> {args.out}")


if __name__ == "__main__":
    main()
