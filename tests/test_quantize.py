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


def test_int8_arithmetic_forward_close_to_full():
    """int8 MXU convs (dynamic activation quant) track the f32 forward.

    Looser than the storage path: activation quantization adds error on
    top of weight quantization, but outputs must stay within a few
    percent of the signal scale for the serving A/B to be meaningful."""
    from phasegen_tpu.infer.quantize import build_int8_forward

    params, state = unet_init(jax.random.PRNGKey(1), CFG)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 128)),
                    jnp.float32)
    full, _ = unet_apply(params, state, x, CFG, training=False)
    fwd8 = build_int8_forward(CFG)
    pred8 = fwd8(quantize_params(params), state, x)
    assert pred8.shape == full.shape
    full, pred8 = np.asarray(full), np.asarray(pred8)
    err = np.abs(full - pred8)
    scale = np.abs(full).std() + 1e-8
    assert err.max() / scale < 0.35
    assert err.mean() / scale < 0.05


def test_int8_up_conv_geometry_matches_dense():
    """The int8 gradient-of-conv construction must reproduce the exact
    torch ConvTranspose1d geometry, including the odd-length innermost
    step (reference: model.py:94)."""
    from phasegen_tpu.infer.quantize import _int8_up_conv
    from phasegen_tpu.models.unet import stage_specs
    from phasegen_tpu.ops.conv import conv_transpose1d

    st = stage_specs(CFG)[-1]  # innermost: k_up = 5, s2, p1 (14 -> 29)
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.standard_normal((2, st.up_c_in, st.l_out)),
                    jnp.float32)
    w = jnp.asarray(rng.standard_normal((st.up_c_in, st.up_c_out, st.up_k))
                    * 0.05, jnp.float32)
    dense = conv_transpose1d(h, w, stride=st.s, padding=st.p)
    from phasegen_tpu.infer.quantize import _quant_weight
    entry = {"w8": _quant_weight(w, 1)}
    q_out = _int8_up_conv(h, entry, st)
    assert q_out.shape == dense.shape
    err = np.abs(np.asarray(q_out) - np.asarray(dense))
    assert err.max() < 0.05 * (np.abs(np.asarray(dense)).std() + 1e-8) * 10


def test_demo_cli_quantize_modes(tmp_path):
    """--quantize store|arith drive the int8 serving paths end to end."""
    from phasegen_tpu.cli import demo as demo_cli
    from phasegen_tpu.data.audio_io import read_wav
    from phasegen_tpu.data.synth import synth_dataset

    d = synth_dataset(2, n_fft=32, hop=8, t_samples=127 * 8)
    np.save(tmp_path / "Pop_audio_val.npy", d)
    for mode in ("store", "arith"):
        out = tmp_path / f"demo_{mode}"
        demo_cli.main([
            "--genre", "Pop", "--n_songs", "1",
            "--n_fft", "32", "--hop", "8",
            "--weight", "unused", "--random_init",
            "--data_dir", str(tmp_path), "--out_dir", str(out),
            "--gl_iters", "2", "--compute_dtype", "float32",
            "--quantize", mode,
        ])
        audio, sr = read_wav(str(out / "unet_Pop_0.wav"))
        assert sr == 16000 and np.isfinite(audio).all()


def test_demo_cli_refine_iters(tmp_path):
    """--refine_iters polishes the predicted phase with warm-started GL
    and still writes finite WAVs."""
    from phasegen_tpu.cli import demo as demo_cli
    from phasegen_tpu.data.audio_io import read_wav
    from phasegen_tpu.data.synth import synth_dataset

    d = synth_dataset(2, n_fft=32, hop=8, t_samples=127 * 8)
    np.save(tmp_path / "Pop_audio_val.npy", d)
    out = tmp_path / "demo_refine"
    demo_cli.main([
        "--genre", "Pop", "--n_songs", "1",
        "--n_fft", "32", "--hop", "8",
        "--weight", "unused", "--random_init",
        "--data_dir", str(tmp_path), "--out_dir", str(out),
        "--gl_iters", "2", "--compute_dtype", "float32",
        "--refine_iters", "2",
    ])
    audio, sr = read_wav(str(out / "unet_Pop_0.wav"))
    assert sr == 16000 and np.isfinite(audio).all()


def test_size_reduction():
    params, _ = unet_init(jax.random.PRNGKey(2), CFG)
    full_bytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree.leaves(params))
    q_bytes = quantized_size_bytes(quantize_params(params))
    assert q_bytes < full_bytes / 3.5  # ~4x minus scales/norms


def test_static_act_scales_match_dynamic_on_calibration_batch():
    """Static calibrated scales must track the dynamic-quant forward.

    Calibration records DENSE-forward maxima while the int8 graph sees
    slightly different (weight-quantized) activations, so outputs are
    close, not identical. Layer scales differ by orders of magnitude, so
    this also pins the recorder's down/up stage-order mapping — a
    mis-indexed scale would blow the tolerance."""
    from phasegen_tpu.infer.quantize import (
        attach_act_scales,
        build_int8_forward,
        calibrate_act_scales,
        quantize_params,
    )

    params, state = unet_init(jax.random.PRNGKey(1), CFG)
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(2, 16, 128)).astype(np.float32))

    qp = quantize_params(params)
    fwd8 = build_int8_forward(CFG)
    dyn = fwd8(qp, state, x)

    scales = calibrate_act_scales(params, state, [x], CFG)
    assert len(scales["down"]) == len(params["down"])
    assert all(s > 0 for s in scales["down"] + scales["up"])
    qp_s = attach_act_scales(qp, scales)
    stat = fwd8(qp_s, state, x)
    dyn = np.asarray(dyn, np.float32)
    stat = np.asarray(stat, np.float32)
    err = np.abs(dyn - stat)
    scale = np.abs(dyn).std() + 1e-8
    assert err.max() / scale < 0.1, err.max() / scale
    assert err.mean() / scale < 0.02, err.mean() / scale


def test_static_act_scales_running_max_over_batches():
    from phasegen_tpu.infer.quantize import calibrate_act_scales

    params, state = unet_init(jax.random.PRNGKey(1), CFG)
    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.normal(size=(2, 16, 128)).astype(np.float32))
    x2 = jnp.asarray((3.0 * rng.normal(size=(2, 16, 128)))
                     .astype(np.float32))
    s1 = calibrate_act_scales(params, state, [x1], CFG)
    s12 = calibrate_act_scales(params, state, [x1, x2], CFG)
    # running max: adding a louder batch can only raise scales
    for a, b in zip(s1["down"] + s1["up"], s12["down"] + s12["up"]):
        assert b >= a - 1e-12


def test_host_quantize_matches_device():
    """quantize_params_host (numpy) is bit-identical to quantize_params
    (XLA) — the cold-start path must serve the same weights."""
    from phasegen_tpu.infer.quantize import quantize_params_host

    params, _ = unet_init(jax.random.PRNGKey(3), CFG)
    host_params = jax.tree.map(lambda x: np.asarray(x), params)
    q_dev = jax.device_get(quantize_params(params))
    q_host = quantize_params_host(host_params)
    dev_leaves = jax.tree.leaves(q_dev)
    host_leaves = jax.tree.leaves(q_host)
    assert len(dev_leaves) == len(host_leaves)
    for a, b in zip(dev_leaves, host_leaves):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
