"""Import reference (torch) U-Net checkpoints into this framework.

The reference saves ``self.model.state_dict()`` — the raw tensor dict of
its nested ``UNetBlock`` recursion (reference: model.py:45-48, written as
``ckpt_{cnt}`` by train.py:126-127). This module maps that dict onto our
flat stage-indexed parameter pytree (models/unet.py) so a user migrating
from the reference can serve or fine-tune their existing trained weights
here without retraining:

    python -m phasegen_tpu.cli.import_torch --weight ckpt_120000 \
        --out ckpt_120000.npz
    python -m phasegen_tpu.cli.demo --weight ckpt_120000.npz ...

The mapping relies on two stable facts rather than on hardcoded key
strings:

1. ``state_dict`` iterates in module-registration order, and the
   reference registers depth-first: down-convs outermost->innermost,
   then up-convs innermost->outermost, with each BatchNorm immediately
   after the conv it normalizes (reference: model.py:77-104).
2. Torch's Conv1d weight layout (C_out, C_in, k) and ConvTranspose1d
   layout (C_in, C_out, k) are exactly the layouts our ``unet_init``
   allocates (models/unet.py:153-177), so tensors copy over unchanged.

Every tensor is shape-checked against the geometry derived by
``stage_specs`` before it is accepted, so a mismatched architecture
(wrong n_fft, missing extra_depth, a non-UNet checkpoint) fails loudly
with the stage and expected shape in the message.
"""

from __future__ import annotations

import numpy as np

from phasegen_tpu.models.unet import UNetConfig, stage_specs


def _to_numpy(v) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32/f-preserving np.ndarray."""
    if hasattr(v, "detach"):  # torch tensor, without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _group_modules(state_dict):
    """Group flat ``{key: tensor}`` items into per-module dicts, preserving
    first-appearance order. ``model.1.model.5.weight`` -> prefix
    ``model.1.model.5``, field ``weight``."""
    modules: dict[str, dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        prefix, _, field = key.rpartition(".")
        modules.setdefault(prefix, {})[field] = _to_numpy(val)
    return modules


def import_state_dict(state_dict, cfg: UNetConfig):
    """Reference ``UNetModel`` state_dict -> (params, norm_state) pytrees.

    Args:
      state_dict: mapping of parameter name -> tensor (torch tensors or
        arrays), in torch registration order (state_dict order).
      cfg: the architecture the checkpoint was trained with. The default
        ``UNetConfig()`` matches the reference's ``UNetModel(1024, 2048)``.

    Returns:
      (params, norm_state) in ``unet_init``'s structure, float32.
    """
    stages = stage_specs(cfg)
    n = len(stages)
    modules = _group_modules(state_dict)

    params = {"down": [None] * n, "down_norm": [None] * n,
              "up": [None] * n, "up_norm": [None] * n}
    norm_state = {"down": [None] * n, "up": [None] * n}

    # Walk modules in registration order, tracking which conv slot comes
    # next: downs 0..n-1, then ups n-1..0. A BatchNorm module always
    # belongs to the most recent conv.
    conv_order = [("down", i) for i in range(n)]
    conv_order += [("up", i) for i in range(n - 1, -1, -1)]
    conv_ptr = 0
    last_conv: tuple[str, int] | None = None

    for prefix, fields in modules.items():
        is_bn = "running_mean" in fields
        if not is_bn and "weight" not in fields:
            raise ValueError(f"module '{prefix}' has neither a conv weight "
                             f"nor BatchNorm stats: fields {sorted(fields)}")
        if is_bn:
            if last_conv is None:
                raise ValueError(f"BatchNorm module '{prefix}' appears "
                                 "before any conv")
            side, i = last_conv
            st = stages[i]
            expected_norm = st.down_norm if side == "down" else st.up_norm
            if not expected_norm or cfg.norm != "batch":
                raise ValueError(
                    f"unexpected BatchNorm after {side}-conv of stage {i} "
                    f"('{prefix}'): the {cfg.norm!r}-norm architecture has "
                    "no norm there")
            nc = st.c_out if side == "down" else st.up_c_out
            for field in ("weight", "bias", "running_mean", "running_var"):
                got = fields[field].shape
                if got != (nc,):
                    raise ValueError(
                        f"BatchNorm '{prefix}.{field}': shape {got}, "
                        f"expected ({nc},) at {side} stage {i}")
            params[side + "_norm"][i] = {
                "scale": fields["weight"].astype(np.float32),
                "bias": fields["bias"].astype(np.float32),
            }
            norm_state[side][i] = {
                "mean": fields["running_mean"].astype(np.float32),
                "var": fields["running_var"].astype(np.float32),
            }
            last_conv = None  # one norm per conv
            continue

        # conv module
        if conv_ptr >= len(conv_order):
            raise ValueError(f"extra conv module '{prefix}' beyond the "
                             f"{len(conv_order)} convs of this architecture")
        side, i = conv_order[conv_ptr]
        conv_ptr += 1
        st = stages[i]
        w = fields["weight"]
        expected = ((st.c_out, st.c_in, st.k) if side == "down"
                    else (st.up_c_in, st.up_c_out, st.up_k))
        if w.shape != expected:
            raise ValueError(
                f"conv '{prefix}': weight shape {w.shape}, expected "
                f"{expected} for {side} stage {i} (input_nc={cfg.input_nc}, "
                f"output_nc={cfg.output_nc}, extra_depth={cfg.extra_depth})")
        entry = {"w": w.astype(np.float32)}
        if "bias" in fields:
            if not cfg.use_bias:
                raise ValueError(
                    f"conv '{prefix}' carries a bias but the "
                    f"{cfg.norm!r}-norm architecture is bias-less "
                    "(reference model.py:65-69: bias only under "
                    "InstanceNorm) — template-based loaders downstream "
                    "would silently drop it")
            nc = st.c_out if side == "down" else st.up_c_out
            if fields["bias"].shape != (nc,):
                raise ValueError(
                    f"conv '{prefix}.bias': shape {fields['bias'].shape}, "
                    f"expected ({nc},)")
            entry["b"] = fields["bias"].astype(np.float32)
        params[side][i] = entry
        last_conv = (side, i)

    if conv_ptr != len(conv_order):
        missing = conv_order[conv_ptr:]
        raise ValueError(f"checkpoint ended early: missing convs {missing}")
    if cfg.norm == "batch":
        for side in ("down", "up"):
            for i, st in enumerate(stages):
                need = st.down_norm if side == "down" else st.up_norm
                if need and params[side + "_norm"][i] is None:
                    raise ValueError(
                        f"missing BatchNorm for {side} stage {i}")
    return params, norm_state


def load_torch_checkpoint(path: str, cfg: UNetConfig):
    """Load a reference ``ckpt_{cnt}`` file (torch.save of a state_dict)
    and convert it. Accepts either a bare state_dict or a wrapper dict
    holding one under a 'state_dict' key."""
    import pickle

    import torch

    try:
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except (pickle.UnpicklingError, RuntimeError):
        # torch-0.x-era pickles predate the weights_only format guard.
        # The fallback executes the file's pickle stream — fine for your
        # own checkpoints, so say what is happening rather than hide it.
        print(f"NOTE: {path} is not weights_only-loadable (legacy torch "
              "format); falling back to full unpickling")
        raw = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(raw, "keys") and "state_dict" in raw and not any(
            k.endswith(".weight") for k in raw.keys()):
        raw = raw["state_dict"]
    return import_state_dict(raw, cfg)


def _reference_key_layout(cfg: UNetConfig):
    """Key prefixes of the reference's nested Sequential, per stage.

    Returns (down_conv, down_norm, up_conv, up_norm) key-prefix lists
    indexed by stage (outermost = 0), reproducing the registration
    layout of reference model.py:85-105:

      outermost: [downconv, submodule, uprelu, upconv, upnorm]
      middle:    [lrelu, conv, norm, submodule, relu, convT, norm]
      innermost: [lrelu, conv, relu, convT, norm]
    """
    n = len(stage_specs(cfg))
    down, dnorm, up, unorm = [None] * n, [None] * n, [None] * n, [None] * n
    prefix = "model."
    for i in range(n):
        if i == 0:
            down[i] = prefix + "0"
            up[i] = prefix + "3"
            unorm[i] = prefix + "4"
            prefix += "1.model."
        elif i < n - 1:
            down[i] = prefix + "1"
            dnorm[i] = prefix + "2"
            up[i] = prefix + "5"
            unorm[i] = prefix + "6"
            prefix += "3.model."
        else:  # innermost
            down[i] = prefix + "1"
            up[i] = prefix + "3"
            unorm[i] = prefix + "4"
    return down, dnorm, up, unorm


def export_state_dict(params, norm_state, cfg: UNetConfig):
    """(params, norm_state) pytrees -> reference-format state_dict.

    The inverse of :func:`import_state_dict`: emits the exact key names
    and tensor layouts the reference's ``UNetModel.load`` expects
    (reference: model.py:50-54), so weights trained here can be loaded
    back into the torch implementation (torch not required — values are
    plain float32 numpy arrays; ``torch.save`` the result to ship it).
    Keys are ordered as torch registers them, norm follows its conv.
    """
    down, dnorm, up, unorm = _reference_key_layout(cfg)
    n = len(down)
    out: dict[str, np.ndarray] = {}

    def put_conv(prefix, entry):
        out[prefix + ".weight"] = np.asarray(entry["w"], np.float32)
        if "b" in entry:
            out[prefix + ".bias"] = np.asarray(entry["b"], np.float32)

    def put_norm(prefix, p, s):
        out[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
        out[prefix + ".bias"] = np.asarray(p["bias"], np.float32)
        out[prefix + ".running_mean"] = np.asarray(s["mean"], np.float32)
        out[prefix + ".running_var"] = np.asarray(s["var"], np.float32)
        # no num_batches_tracked: torch<=0.4 (the reference's era) has no
        # such buffer and strict-rejects unexpected keys; torch>=1.0
        # tolerates it missing even under strict=True

    # registration order: downs outer->inner (norm after conv), then ups
    # inner->outer — matches the walk import_state_dict expects, so an
    # export->import roundtrip is the identity.
    for i in range(n):
        put_conv(down[i], params["down"][i])
        if params["down_norm"][i] is not None:
            put_norm(dnorm[i], params["down_norm"][i], norm_state["down"][i])
    for i in range(n - 1, -1, -1):
        put_conv(up[i], params["up"][i])
        if params["up_norm"][i] is not None:
            put_norm(unorm[i], params["up_norm"][i], norm_state["up"][i])
    return out
