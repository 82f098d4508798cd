"""Int8 weight quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.infer.quantize import (
    build_quantized_forward,
    dequantize_params,
    quantize_params,
    quantized_size_bytes,
)
from phasegen_tpu.models import UNetConfig, unet_apply, unet_init

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)


def test_quant_dequant_error_bounded():
    params, _ = unet_init(jax.random.PRNGKey(0), CFG)
    q = quantize_params(params)
    deq = dequantize_params(q, jnp.float32)
    for a, b in zip(params["down"], deq["down"]):
        w, w2 = np.asarray(a["w"]), np.asarray(b["w"])
        # per-channel scale: error bounded by scale/2 = absmax/254
        absmax = np.abs(w).max(axis=(1, 2), keepdims=True)
        assert np.all(np.abs(w - w2) <= absmax / 254 + 1e-8)


def test_quantized_forward_close_to_full():
    params, state = unet_init(jax.random.PRNGKey(1), CFG)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 128)),
                    jnp.float32)
    full, _ = unet_apply(params, state, x, CFG, training=False)
    qfwd = build_quantized_forward(CFG)
    quant = qfwd(quantize_params(params), state, x)
    full, quant = np.asarray(full), np.asarray(quant)
    err = np.abs(full - quant)
    scale = np.abs(full).std() + 1e-8
    # int8 weights: outputs agree to a few percent of the signal scale
    assert err.max() / scale < 0.2
    assert err.mean() / scale < 0.02


def test_size_reduction():
    params, _ = unet_init(jax.random.PRNGKey(2), CFG)
    full_bytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(params))
    q_bytes = quantized_size_bytes(quantize_params(params))
    assert q_bytes < full_bytes / 3.5  # ~4x minus scales/norms
