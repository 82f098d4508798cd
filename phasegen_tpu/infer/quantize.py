"""Int8 quantization for serving: weight storage + int8 MXU arithmetic.

Per-output-channel symmetric int8 for every conv weight (the 612M-param
model is 2.4 GB f32 / 1.2 GB bf16; int8 + f32 scales is ~0.6 GB — the
serving footprint and the weight-load bandwidth at small batch, where
inference is weight-bound). Norm affine parameters and biases stay f32 —
they are ~25k parameters.

Two serving modes share the quantized format:

  * storage (``build_quantized_forward``): dequantize inside the jitted
    graph (an elementwise multiply XLA fuses into the conv's weight
    read); conv math stays bf16 with MXU f32 accumulation.
  * arithmetic (``build_int8_forward``): activations are dynamically
    quantized per tensor (scale = max|x|/127) and the convs run
    int8 x int8 -> int32 on the MXU (2x the bf16 MAC rate on v5e, half
    the weight bytes), with the per-channel dequant folded into the conv
    epilogue. Plugged into the model through ``unet_apply(conv_impl=...)``
    so the geometry is defined exactly once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from phasegen_tpu.models.unet import UNetConfig, unet_apply

_DIMSPEC = ("NCH", "OIH", "NCH")


def _quant_weight(w, channel_axis: int, xp=jnp, prep=lambda w: w) -> dict:
    """The ONE quantization policy: symmetric per-channel int8,
    scale = max|w|/127, clip to [-127, 127], round half-to-even.
    Parameterized over the array namespace so the host (numpy) and
    device (jnp) paths cannot drift — bit-identity is by construction,
    not just pinned by tests/test_quantize.py."""
    w = prep(w)
    reduce_axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    absmax = xp.max(xp.abs(w), axis=reduce_axes, keepdims=True)
    scale = xp.maximum(absmax, 1e-12) / 127.0
    q = xp.clip(xp.round(w / scale), -127, 127).astype(xp.int8)
    return {"q": q, "scale": scale.astype(xp.float32)}


def _quantize_tree(params: dict, xp, prep=lambda w: w) -> dict:
    """Apply ``_quant_weight`` over a param tree.

    Output channel axes: down conv (C_out, C_in, k) -> axis 0;
    up conv (C_in, C_out, k) -> axis 1.
    """
    out = {"down": [], "up": [],
           "down_norm": params["down_norm"], "up_norm": params["up_norm"]}
    for p in params["down"]:
        entry = {"w8": _quant_weight(p["w"], 0, xp, prep)}
        if "b" in p:
            entry["b"] = p["b"]
        out["down"].append(entry)
    for p in params["up"]:
        entry = {"w8": _quant_weight(p["w"], 1, xp, prep)}
        if "b" in p:
            entry["b"] = p["b"]
        out["up"].append(entry)
    return out


def quantize_params(params: dict) -> dict:
    """Conv weights -> int8 blocks on DEVICE; everything else passes
    through. See ``_quant_weight`` for the policy."""
    return _quantize_tree(params, jnp)


def quantize_params_host(params: dict) -> dict:
    """``quantize_params`` on HOST numpy arrays — no device round-trip.

    Cold-start cost at 612M is dominated by the weight H2D upload
    (~1.2 GB bf16 / 2.4 GB f32 over this tunnel, docs/NEXT.md lead #5);
    quantizing on the host first means only the int8 blocks + f32 scales
    (~0.6 GB) ever cross the link. Bit-identical to the device version
    BY CONSTRUCTION (one ``_quantize_tree`` policy; numpy and XLA both
    round half-to-even) and pinned by tests/test_quantize.py.
    """
    import numpy as np

    return _quantize_tree(params, np,
                          prep=lambda w: np.asarray(w, np.float32))


def quantize_for_serving(params: dict) -> dict:
    """Quantize + upload for the int8-store serving path, host or device.

    Host trees (load_weights(device=False)) quantize in numpy first so
    only int8 + scales cross the link; device trees (e.g. --random_init)
    quantize on device. Returns the quantized tree placed on device.
    One entry point so the three serving CLIs can't drift."""
    is_device = isinstance(jax.tree.leaves(params)[0], jax.Array)
    q = quantize_params(params) if is_device else quantize_params_host(params)
    return jax.device_put(q)


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


def _dyn_q8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8: scale from the live max|x|."""
    s = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _q8_act(h: jax.Array, entry: dict) -> tuple[jax.Array, jax.Array]:
    """Activation int8: static calibrated scale if present, else dynamic.

    A static scale (``calibrate_act_scales``) removes the per-conv
    max-reduction and makes the quant a single elementwise pass; values
    beyond the calibration range saturate at +-127 (symmetric clip).
    """
    if "a_scale" in entry:
        s = entry["a_scale"]
        q = jnp.clip(jnp.round(h.astype(jnp.float32) / s), -127, 127)
        return q.astype(jnp.int8), s
    return _dyn_q8(h)


def calibrate_act_scales(params, norm_state, batches, cfg: UNetConfig) -> dict:
    """Per-conv-input activation scales from calibration batches.

    Runs the DENSE forward eagerly (un-jitted: the recording closures
    must see concrete values, not tracers) with recording conv impls and
    returns {"down": [s0...], "up": [s0...]} float scales (max|h|/127,
    running max over batches), indexed like the param stage lists —
    downs are visited in stage order, ups in reverse (models/unet.py).

    Args:
      batches: iterable of (B, input_nc, length) logmag arrays.
    """
    n = len(params["down"])
    down_max = [0.0] * n
    up_max = [0.0] * n
    order = {"d": 0, "u": 0}

    def rec_down(h, p, st):
        i = order["d"]
        down_max[i] = max(down_max[i],
                          float(jnp.max(jnp.abs(h.astype(jnp.float32)))))
        order["d"] += 1
        return _default_impl[0](h, p, st)

    def rec_up(h, p, st):
        i = n - 1 - order["u"]  # up stages visited innermost-first
        up_max[i] = max(up_max[i],
                        float(jnp.max(jnp.abs(h.astype(jnp.float32)))))
        order["u"] += 1
        return _default_impl[1](h, p, st)

    from phasegen_tpu.models.unet import (
        _default_down_conv,
        _default_up_conv,
    )

    _default_impl = (_default_down_conv, _default_up_conv)
    for x in batches:
        order["d"] = order["u"] = 0
        unet_apply(params, norm_state, jnp.asarray(x), cfg,
                   training=False, conv_impl=(rec_down, rec_up))
    return {"down": [max(m, 1e-12) / 127.0 for m in down_max],
            "up": [max(m, 1e-12) / 127.0 for m in up_max]}


def attach_act_scales(qparams: dict, scales: dict) -> dict:
    """Bake calibrated activation scales into a quantized param tree."""
    out = dict(qparams)
    out["down"] = [dict(e, a_scale=jnp.float32(s))
                   for e, s in zip(qparams["down"], scales["down"])]
    out["up"] = [dict(e, a_scale=jnp.float32(s))
                 for e, s in zip(qparams["up"], scales["up"])]
    return out


def _int8_down_conv(h, entry, st):
    q = entry["w8"]["q"]                       # (C_out, C_in, k)
    s_w = entry["w8"]["scale"].reshape(-1)     # per C_out
    hq, s_x = _q8_act(h, entry)
    y = lax.conv_general_dilated(
        hq, q, window_strides=(st.s,), padding=[(st.p, st.p)],
        dimension_numbers=_DIMSPEC, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)[None, :, None]
    if "b" in entry:
        y = y + entry["b"].astype(jnp.float32)[None, :, None]
    return y.astype(h.dtype)


def _int8_up_conv(h, entry, st):
    q = entry["w8"]["q"]                       # (C_in, C_out, k)
    s_w = entry["w8"]["scale"].reshape(-1)     # per C_out (axis 1)
    k = q.shape[-1]
    # gradient-of-conv construction on the int8 weights (ops/conv.py)
    q_eff = jnp.flip(jnp.swapaxes(q, 0, 1), axis=-1)
    hq, s_x = _q8_act(h, entry)
    pad = k - 1 - st.p
    y = lax.conv_general_dilated(
        hq, q_eff, window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(st.s,), dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)[None, :, None]
    if "b" in entry:
        y = y + entry["b"].astype(jnp.float32)[None, :, None]
    return y.astype(h.dtype)


def _store_down_conv(h, entry, st):
    from phasegen_tpu.ops.conv import conv1d

    w = (entry["w8"]["q"].astype(jnp.float32)
         * entry["w8"]["scale"]).astype(h.dtype)
    return conv1d(h, w, entry.get("b"), stride=st.s, padding=st.p)


def _store_up_conv(h, entry, st):
    from phasegen_tpu.ops.conv import conv_transpose1d

    w = (entry["w8"]["q"].astype(jnp.float32)
         * entry["w8"]["scale"]).astype(h.dtype)
    return conv_transpose1d(h, w, entry.get("b"), stride=st.s, padding=st.p)


# conv_impl pairs for unet_apply / build_infer_fn: weights live in HBM as
# int8 either way; "store" dequantizes into the conv's weight read (bf16
# MXU math), "arith" runs int8 x int8 -> int32 on the MXU.
INT8_STORE_IMPL = (_store_down_conv, _store_up_conv)
INT8_ARITH_IMPL = (_int8_down_conv, _int8_up_conv)


def build_int8_forward(cfg: UNetConfig):
    """jitted fn(qparams, norm_state, logmag) -> pred with int8 MXU convs.

    The A/B against ``build_quantized_forward`` (bf16 math) lives in
    benchmarks/int8_ab.py; at small batch the forward is weight-bound, so
    halving weight bytes and doubling MAC rate is the candidate win.
    """

    @jax.jit
    def fwd(qparams, norm_state, x):
        pred, _ = unet_apply(qparams, norm_state, x, cfg, training=False,
                             conv_impl=(_int8_down_conv, _int8_up_conv))
        return pred

    return fwd
