"""Evaluation CLI and training reproducibility tests."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.parallel.distributed import init_distributed, is_primary
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.state import make_optimizer

N_FFT, HOP, T_SAMP = 32, 8, 127 * 8
CFG = UNetConfig(input_nc=16, output_nc=32, length=128)


def test_evaluate_cli(tmp_path):
    from phasegen_tpu.cli import evaluate as eval_cli

    d = synth_dataset(6, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    npy = tmp_path / "val.npy"
    np.save(npy, d)
    out = tmp_path / "report.json"
    eval_cli.main([
        "--data", str(npy), "--random_init",
        "--batch_size", "2", "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--gl_iters", "2", "--compute_dtype", "float32",
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert report["n_batches"] == 3
    assert report["n_clips"] == 6
    for k in ("MSE", "NOPMSE", "LMSE", "snr_hybrid_db"):
        assert np.isfinite(report[k])


def test_evaluate_cli_covers_ragged_tail(tmp_path):
    """A shard size not divisible by batch_size must still report every
    clip (round-1 review: the tail was silently dropped)."""
    from phasegen_tpu.cli import evaluate as eval_cli

    d = synth_dataset(5, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP, seed=1)
    npy = tmp_path / "val.npy"
    np.save(npy, d)
    out = tmp_path / "report.json"
    eval_cli.main([
        "--data", str(npy), "--random_init",
        "--batch_size", "2", "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--gl_iters", "2", "--compute_dtype", "float32",
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert report["n_batches"] == 3  # 2 + 2 + 1
    assert report["n_clips"] == 5
    for k in ("MSE", "NOPMSE", "LMSE", "snr_hybrid_db"):
        assert np.isfinite(report[k])


def test_training_reproducible_given_seed():
    batch = jnp.asarray(synth_dataset(4, n_fft=N_FFT, hop=HOP,
                                      t_samples=T_SAMP, seed=3))

    def run():
        opt = make_optimizer(1e-3)
        state = create_train_state(jax.random.PRNGKey(42), CFG, opt)
        step = build_train_step(CFG, opt)
        losses = []
        for _ in range(3):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        return losses, state

    l1, s1 = run()
    l2, s2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_init_distributed_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() is False
    assert is_primary() is True
