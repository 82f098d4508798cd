"""Overlapped cold start: AOT executable warm-up + async weight upload.

Covers infer/stream.py ``warm()`` (shape-only lower+compile of the
serving executables), infer/upload.py ``device_put_async``, and the
``load_weights(host_serving=True)`` tier the stream CLI feeds them with.
No reference counterpart (the reference loads its torch module
synchronously before any forward — demo.py:20-28); this is the TPU-native
answer to a multi-GB H2D upload and XLA executable restore being two
serial cold-start costs that can run concurrently.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phasegen_tpu.infer.stream import build_stream_infer
from phasegen_tpu.infer.upload import device_put_async
from phasegen_tpu.models import UNetConfig, unet_init

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP = 32, 8


def _tone(t_samples, sr=16000):
    t = np.arange(t_samples) / sr
    return (0.5 * np.sin(2 * np.pi * 3000 * t)
            + 0.3 * np.sin(2 * np.pi * 4500 * t)).astype(np.float32)


def _streams(mode):
    base = build_stream_infer(CFG, N_FFT, HOP, overlap=64,
                              batch_patches=2, mode=mode)
    warmed = build_stream_infer(CFG, N_FFT, HOP, overlap=64,
                                batch_patches=2, mode=mode)
    return base, warmed


def test_warm_chunked_matches_unwarmed():
    params, state = unet_init(jax.random.PRNGKey(0), CFG)
    wav = jnp.asarray(_tone(3 * 127 * HOP + 100))
    base, warmed = _streams("chunked")
    warmed.warm(params, state, track_len=wav.shape[0])
    # fwd + per-bucket pre/post all pre-compiled
    assert set(warmed._warm_execs) >= {"fwd"}
    assert any(isinstance(k, tuple) and k[0] == "pre"
               for k in warmed._warm_execs)
    a = np.asarray(base(params, state, wav))
    b = np.asarray(warmed(params, state, wav))
    np.testing.assert_array_equal(a, b)
    # the warmed executables were actually HIT (a silent signature
    # mismatch would fall back to jit and regress to the serial compile)
    hits = warmed._warm_execs.hits
    assert hits["fwd"] > 0
    assert all(h > 0 for k, h in hits.items()
               if isinstance(k, tuple) and k[0] in ("pre", "post"))


def test_warm_fused_matches_and_requires_track_len():
    params, state = unet_init(jax.random.PRNGKey(1), CFG)
    wav = jnp.asarray(_tone(2 * 127 * HOP + 57))
    base, warmed = _streams("fused")
    with pytest.raises(ValueError, match="track_len"):
        warmed.warm(params, state)
    warmed.warm(params, state, track_len=wav.shape[0])
    a = np.asarray(base(params, state, wav))
    b = np.asarray(warmed(params, state, wav))
    np.testing.assert_array_equal(a, b)
    assert sum(warmed._warm_execs.hits.values()) > 0


def test_warm_from_host_tree_then_run_with_device_tree():
    """warm() needs only shapes: a HOST (numpy) tree must produce an
    executable the device-tree call then hits."""
    params, state = unet_init(jax.random.PRNGKey(2), CFG)
    host_params = jax.tree.map(np.asarray, params)
    host_state = jax.tree.map(np.asarray, state)
    wav = jnp.asarray(_tone(127 * HOP + 11))
    base, warmed = _streams("chunked")
    warmed.warm(host_params, host_state)
    dev_params, dev_state = jax.device_put((params, state))
    a = np.asarray(base(dev_params, dev_state, wav))
    b = np.asarray(warmed(dev_params, dev_state, wav))
    np.testing.assert_array_equal(a, b)
    assert warmed._warm_execs.hits["fwd"] > 0


def test_warm_signature_mismatch_falls_back():
    """A call whose dtypes differ from the warmed signature must silently
    take the ordinary jit path, not raise."""
    params, state = unet_init(jax.random.PRNGKey(3), CFG)
    wav = jnp.asarray(_tone(127 * HOP + 5))
    _, warmed = _streams("chunked")
    warmed.warm(params, state)
    bf16_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    out = np.asarray(warmed(bf16_params, state, wav))
    assert np.isfinite(out).all()
    assert warmed._warm_execs.hits.get("fwd", 0) == 0  # jit path taken


def test_warm_int8_store_tree():
    """warm() on the host-quantized int8 tree (the --quantize store
    serving path) compiles the int8-store executable."""
    from phasegen_tpu.infer.quantize import (
        INT8_STORE_IMPL,
        quantize_params_host,
    )

    params, state = unet_init(jax.random.PRNGKey(4), CFG)
    host_q = quantize_params_host(jax.tree.map(np.asarray, params))
    wav = jnp.asarray(_tone(127 * HOP + 3))
    warmed = build_stream_infer(CFG, N_FFT, HOP, overlap=64,
                                batch_patches=2, mode="chunked",
                                conv_impl=INT8_STORE_IMPL)
    warmed.warm(host_q, state)
    q_dev, state_dev = device_put_async((host_q, state)).result(timeout=120)
    out = np.asarray(warmed(q_dev, state_dev, wav))
    assert out.shape == wav.shape and np.isfinite(out).all()
    assert warmed._warm_execs.hits["fwd"] > 0


def test_device_put_async_roundtrip():
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": [np.ones(4, np.int8), np.float32(2.5)]}
    out = device_put_async(tree).result(timeout=120)
    assert isinstance(out["a"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["b"][0]), tree["b"][0])
    assert float(out["b"][1]) == 2.5


def test_load_weights_host_serving_matches_device_tree(tmp_path):
    """host_serving=True returns exactly the tree device=True uploads
    (same dtypes/values) — the contract the async upload path relies on."""
    from phasegen_tpu.cli.demo import load_weights
    from phasegen_tpu.train.checkpoint import save_params_npz
    from phasegen_tpu.train.state import create_train_state

    cfg = UNetConfig(input_nc=16, output_nc=32, length=128,
                     compute_dtype="bfloat16")
    state = create_train_state(jax.random.PRNGKey(5), cfg)
    path = str(tmp_path / "w_light.npz")
    save_params_npz(path, state.params, state.norm_state)

    host_p, host_n = load_weights(path, cfg, host_serving=True)
    dev_p, dev_n = load_weights(path, cfg, device=True)
    flat_h = jax.tree.leaves((host_p, host_n))
    flat_d = jax.tree.leaves((dev_p, dev_n))
    assert len(flat_h) == len(flat_d)
    for h, d in zip(flat_h, flat_d):
        assert jnp.result_type(h) == jnp.result_type(d)
        np.testing.assert_array_equal(np.asarray(h, np.float32),
                                      np.asarray(d, np.float32))
