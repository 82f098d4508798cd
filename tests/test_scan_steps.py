"""--scan_steps: K train steps per dispatch via lax.scan.

The scan path (train/step.py:build_train_step_scan) must be numerically
the same training as K sequential single-step dispatches — same Adam
math, same BN stat updates, same batch order — only the host/dispatch
boundary moves. Covers the synth-seed feed, the device-resident-gather
feed, the mesh (GSPMD) variant, and the loop-level cadence logic
(validation/checkpoint triggers by interval crossing).
"""

import functools
import json

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data.device_synth import corpus_stats, synth_patches
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.state import make_optimizer
from phasegen_tpu.train.step import build_train_step_scan

T, SR, NFFT, HOP = 1016, 4000, 32, 8
CFG = UNetConfig(input_nc=16, output_nc=32, length=128)


def _synth_setup(n=64):
    key = jax.random.PRNGKey(0)
    mean, std = corpus_stats(key, n, t_samples=T, sr=SR, n_fft=NFFT,
                             hop=HOP, sample=n, gen_batch=32)
    raw = functools.partial(synth_patches, t_samples=T, sr=SR, n_fft=NFFT,
                            hop=HOP, mean=mean, std=std)
    return key, raw


def test_scan_matches_sequential_steps():
    key, raw = _synth_setup()
    opt = make_optimizer(1e-3)
    k_steps, b = 4, 8
    seeds = np.arange(k_steps * b).reshape(k_steps, b)

    # K sequential single-step dispatches
    state_a = create_train_state(jax.random.PRNGKey(1), CFG, opt)
    step = build_train_step(CFG, opt)
    fn = jax.jit(raw)
    last = []
    for row in seeds:
        state_a, m = step(state_a, fn(key, jnp.asarray(row, jnp.int32)))
        last.append(m)

    # one scan dispatch over the same seed windows
    state_b = create_train_state(jax.random.PRNGKey(1), CFG, opt)
    scan = build_train_step_scan(CFG, opt, lambda data, s: raw(data, s))
    state_b, ms = scan(state_b, key, jnp.asarray(seeds, jnp.int32))

    assert int(state_b.step) == int(state_a.step) == k_steps
    pa = jax.device_get(state_a.params)
    pb = jax.device_get(state_b.params)
    for la, lb in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(la, lb, rtol=2e-4, atol=2e-5)
    # window metrics: mean over steps + the final step's loss
    seq_losses = [float(m["loss"]) for m in jax.device_get(last)]
    np.testing.assert_allclose(float(ms["loss"]), np.mean(seq_losses),
                               rtol=1e-3)
    np.testing.assert_allclose(float(ms["loss_last"]), seq_losses[-1],
                               rtol=1e-3)


def test_scan_device_resident_gather():
    """Device-resident feed: the dataset rides the scan carry unchanged
    and rows are gathered on device per step."""
    key, raw = _synth_setup(n=32)
    data = jax.jit(raw)(key, jnp.arange(32, dtype=jnp.int32))
    opt = make_optimizer(1e-3)
    scan = build_train_step_scan(
        CFG, opt, lambda d, idx: jnp.take(d, idx, axis=0))
    state = create_train_state(jax.random.PRNGKey(1), CFG, opt)
    idx = jnp.asarray(np.arange(16).reshape(2, 8), jnp.int32)
    state, ms = scan(state, data, idx)
    assert int(state.step) == 2
    assert np.isfinite(float(ms["loss"]))


def test_train_cli_scan_steps_mesh(tmp_path):
    """Loop-level: --scan_steps on the default (mesh) path; validation and
    checkpoint fire on interval crossings and the run completes."""
    from phasegen_tpu.cli import make_corpus, train as train_cli

    make_corpus.main([
        "--out_dir", str(tmp_path), "--n_train", "32", "--n_val", "4",
        "--sr", str(SR), "--n_fft", str(NFFT), "--hop", str(HOP),
        "--t_samples", str(T), "--gen_batch", "8", "--cpu",
    ])
    log_dir = tmp_path / "run"
    train_cli.main([
        "--log_dir", str(log_dir),
        "--synth_train", "32", "--synth_t_samples", str(T),
        "--val_paths", str(tmp_path / "synth_audio_val.npy"),
        "--batch_size", "8", "--val_batch_size", "2",
        "--sr", str(SR), "--n_fft", str(NFFT), "--hop", str(HOP),
        "--val_every", "4", "--ckpt_every", "8", "--gl_iters", "2",
        "--compute_dtype", "float32", "--no_media",
        "--scan_steps", "4", "--max_steps", "8",
    ])
    # 2 scan calls x 4 steps; ckpt crossing at step 8, val at 4 and 8
    assert (log_dir / "ckpt_8").exists()
    with open(log_dir / "log.json") as f:
        log = json.load(f)
    mse = log["scalar/MSE"]
    assert [n_iter for _, n_iter in mse] == [4, 8]


def test_scan_steps_exceeding_epoch_raises(tmp_path):
    """scan_steps larger than an epoch's step count would yield empty
    epochs and spin forever — must fail loudly instead."""
    import pytest

    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data.synth import synth_dataset
    from phasegen_tpu.train.loop import train

    shard = synth_dataset(4, n_fft=NFFT, hop=HOP, t_samples=T)
    np.save(tmp_path / "val.npy", shard)
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        val_paths=(str(tmp_path / "val.npy"),),
        synth_train=16, synth_t_samples=T, batch_size=8,
        sr=SR, n_fft=NFFT, hop=HOP,
        val_every=100, ckpt_every=0, gl_iters=2, max_steps=8,
        compute_dtype="float32", log_media=False, data_parallel=False,
        scan_steps=4,  # 16/8 = 2 steps/epoch < 4
    )
    with pytest.raises(ValueError, match="scan_steps"):
        train(cfg)


def test_scan_steps_falls_back_without_device_feed(tmp_path, capsys):
    """A host-fed loader can't scan; the loop warns and runs 1 step/call."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data.synth import synth_dataset
    from phasegen_tpu.train.loop import train

    shard = synth_dataset(12, n_fft=NFFT, hop=HOP, t_samples=T)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:4])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=SR, n_fft=NFFT, hop=HOP,
        val_every=100, ckpt_every=0, gl_iters=2, max_steps=2,
        compute_dtype="float32", log_media=False, data_parallel=False,
        device_data_gb=0.0, scan_steps=4, prefetch=0,
    )
    train(cfg)
    out = capsys.readouterr().out
    assert "scan_steps needs a device-side feed" in out


def test_scan_steps_auto_default(tmp_path, capsys):
    """scan_steps=0 (the default) auto-enables the scan dispatch for
    device-side feeds, clamped to one epoch's step count."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data.synth import synth_dataset
    from phasegen_tpu.train.loop import train

    assert TrainConfig().scan_steps == 0  # auto is the default

    shard = synth_dataset(4, n_fft=NFFT, hop=HOP, t_samples=T)
    np.save(tmp_path / "val.npy", shard)
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        val_paths=(str(tmp_path / "val.npy"),),
        synth_train=32, synth_t_samples=T, batch_size=8,
        sr=SR, n_fft=NFFT, hop=HOP,
        val_every=100, ckpt_every=0, gl_iters=2, max_steps=4,
        compute_dtype="float32", log_media=False, data_parallel=False,
    )
    train(cfg)
    out = capsys.readouterr().out
    # 32 clips / batch 8 = 4 steps/epoch -> auto clamps 8 -> 4
    assert "lax.scan over 4 steps/call" in out


def test_scan_steps_auto_host_fed_stays_sequential(tmp_path, capsys):
    """Auto mode must NOT warn or scan for a host-fed loader."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data.synth import synth_dataset
    from phasegen_tpu.train.loop import train

    shard = synth_dataset(8, n_fft=NFFT, hop=HOP, t_samples=T)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:2])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=SR, n_fft=NFFT, hop=HOP,
        val_every=100, ckpt_every=0, gl_iters=2, max_steps=2,
        compute_dtype="float32", log_media=False, data_parallel=False,
        device_data_gb=0.0, prefetch=0,
    )
    train(cfg)
    out = capsys.readouterr().out
    assert "scan_steps needs a device-side feed" not in out
    assert "lax.scan" not in out
