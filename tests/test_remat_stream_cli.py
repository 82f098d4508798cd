"""Remat config, async checkpointing, NaN guard, and stream CLI tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phasegen_tpu.data.audio_io import read_wav, write_wav
from phasegen_tpu.data.synth import synth_dataset, synth_waveforms
from phasegen_tpu.models import UNetConfig, unet_init, unet_apply
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.checkpoint import latest_checkpoint, save_checkpoint_async
from phasegen_tpu.train.state import make_optimizer

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def test_remat_matches_no_remat():
    cfg_r = UNetConfig(input_nc=16, output_nc=32, length=128, remat=True)
    params, state = unet_init(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 128)),
                    jnp.float32)
    y0, _ = unet_apply(params, state, x, CFG, training=True)
    y1, _ = unet_apply(params, state, x, cfg_r, training=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)

    def loss(p, cfg):
        y, _ = unet_apply(p, state, x, cfg, training=True)
        return jnp.mean(y * y)

    g0 = jax.grad(loss)(params, CFG)
    g1 = jax.grad(loss)(params, cfg_r)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_async_checkpoint(tmp_path):
    opt = make_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    fut = save_checkpoint_async(str(tmp_path), state, step=7)
    path = fut.result(timeout=60)
    assert path.endswith("ckpt_7")
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_7")


def test_nan_guard_aborts(tmp_path):
    """Feed a NaN batch through the train CLI path and expect the guard."""
    from phasegen_tpu.cli import train as train_cli

    d = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    d[0] = np.nan
    p = tmp_path / "bad.npy"
    np.save(p, d)
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_cli.main([
            "--log_dir", str(tmp_path / "run"),
            "--train_paths", str(p), "--val_paths", str(p),
            "--batch_size", "8", "--val_batch_size", "2",
            "--n_fft", str(N_FFT), "--hop", str(HOP),
            "--val_every", "1", "--ckpt_every", "100", "--gl_iters", "1",
            "--max_steps", "2", "--compute_dtype", "float32",
            "--no_media", "--no_data_parallel", "--prefetch", "0",
        ])
    assert os.path.isdir(tmp_path / "run" / "nan_dump")


def test_stream_cli_roundtrip(tmp_path):
    from phasegen_tpu.cli import stream as stream_cli

    wav = synth_waveforms(1, t_samples=3 * T_SAMP, seed=4)[0]
    inp = str(tmp_path / "in.wav")
    out = str(tmp_path / "out.wav")
    write_wav(inp, wav, 16000)
    stream_cli.main([
        "--input", inp, "--output", out, "--random_init",
        "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--overlap", "64", "--batch_patches", "2",
        "--compute_dtype", "float32",
    ])
    audio, sr = read_wav(out)
    assert sr == 16000
    assert abs(len(audio) - len(wav)) <= 1
    assert np.isfinite(audio).all()
