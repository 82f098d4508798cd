"""Int8 weight quantization for serving.

Per-output-channel symmetric int8 for every conv weight (the 612M-param
model is 2.4 GB f32 / 1.2 GB bf16; int8 + f32 scales is ~0.6 GB — the
serving footprint and the weight-load bandwidth at small batch, where
inference is weight-bound). Norm affine parameters and biases stay f32 —
they are ~25k parameters.

Dequantization happens inside the jitted graph (an elementwise multiply
XLA fuses into the conv's weight read); the conv math itself stays bf16
with MXU f32 accumulation, so this is storage/bandwidth quantization,
not int8 arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phasegen_tpu.models.unet import UNetConfig, unet_apply


def _quant_weight(w: jax.Array, channel_axis: int) -> dict:
    """Symmetric per-channel int8: scale = max|w| / 127 over the channel."""
    reduce_axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_params(params: dict) -> dict:
    """Conv weights -> int8 blocks; everything else passes through.

    Output channel axes: down conv (C_out, C_in, k) -> axis 0;
    up conv (C_in, C_out, k) -> axis 1.
    """
    out = {"down": [], "up": [],
           "down_norm": params["down_norm"], "up_norm": params["up_norm"]}
    for p in params["down"]:
        entry = {"w8": _quant_weight(p["w"], 0)}
        if "b" in p:
            entry["b"] = p["b"]
        out["down"].append(entry)
    for p in params["up"]:
        entry = {"w8": _quant_weight(p["w"], 1)}
        if "b" in p:
            entry["b"] = p["b"]
        out["up"].append(entry)
    return out


def dequantize_params(qparams: dict, dtype=jnp.bfloat16) -> dict:
    """int8 blocks -> dense weights in ``dtype`` (jit-fusable)."""
    def deq(entry):
        w = (entry["w8"]["q"].astype(jnp.float32)
             * entry["w8"]["scale"]).astype(dtype)
        out = {"w": w}
        if "b" in entry:
            out["b"] = entry["b"]
        return out

    return {
        "down": [deq(p) for p in qparams["down"]],
        "up": [deq(p) for p in qparams["up"]],
        "down_norm": qparams["down_norm"],
        "up_norm": qparams["up_norm"],
    }


def build_quantized_forward(cfg: UNetConfig):
    """jitted fn(qparams, norm_state, logmag) -> pred, dequantizing
    weights inside the graph."""

    @jax.jit
    def fwd(qparams, norm_state, x):
        params = dequantize_params(qparams, cfg.compute_dtype)
        pred, _ = unet_apply(params, norm_state, x, cfg, training=False)
        return pred

    return fwd


def quantized_size_bytes(qparams: dict) -> int:
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(qparams))
