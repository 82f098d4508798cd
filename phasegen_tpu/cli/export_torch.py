"""Export trained weights back to the reference's torch checkpoint format.

The inverse of ``cli.import_torch``: weights trained in this framework
(npz or orbax checkpoint) become a state_dict file the reference's
``UNetModel.load`` accepts unchanged (reference: model.py:50-54) —
useful for cross-validating outputs against the torch implementation or
migrating gradually:

    python -m phasegen_tpu.cli.export_torch \
        --weight runs/aw01_612m/ckpt_512_light.npz --out ckpt_512_torch
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export weights to the reference torch format")
    p.add_argument("--weight", required=True,
                   help="weights npz / checkpoint dir from this framework")
    p.add_argument("--out", required=True, help="output torch file")
    p.add_argument("--input_nc", type=int, default=1024)
    p.add_argument("--output_nc", type=int, default=2048)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--extra_depth", type=int, default=0)
    p.add_argument("--norm", default="batch",
                   choices=["batch", "instance", "none"])
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")  # host-side conversion
    except RuntimeError:
        pass
    import numpy as np
    import torch

    from phasegen_tpu.cli.demo import load_weights
    from phasegen_tpu.models.unet import UNetConfig
    from phasegen_tpu.torch_ckpt import export_state_dict

    cfg = UNetConfig(input_nc=args.input_nc, output_nc=args.output_nc,
                     length=args.length, extra_depth=args.extra_depth,
                     norm=args.norm)
    params, norm_state = load_weights(args.weight, cfg, device=False)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, norm_state, cfg).items()}
    torch.save(sd, args.out)
    print(f"Exported {len(sd)} tensors from {args.weight} -> {args.out} "
          "(reference UNetModel.load format)")


if __name__ == "__main__":
    main()
