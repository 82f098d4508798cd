"""StableHLO export CLI and LR-schedule tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phasegen_tpu.data import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.state import make_optimizer

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def test_export_cli_roundtrip(tmp_path):
    from phasegen_tpu.cli import export as export_cli

    out = tmp_path / "model.jaxexport"
    export_cli.main([
        "--out", str(out), "--random_init",
        "--batch", "2", "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--t_samples", str(T_SAMP), "--compute_dtype", "float32",
    ])
    assert out.exists() and out.stat().st_size > 1000
    # independent reload + execute (what a serving process would do)
    reloaded = jax.export.deserialize(bytearray(out.read_bytes()))
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, T_SAMP)).astype(np.float32))
    audio = reloaded.call(wav)
    assert audio.shape == (2, T_SAMP)
    assert bool(jnp.all(jnp.isfinite(audio)))


def test_cosine_schedule_trains_and_decays():
    batch = jnp.asarray(synth_dataset(4, n_fft=N_FFT, hop=HOP,
                                      t_samples=T_SAMP))
    opt = make_optimizer(1e-3, schedule="cosine", warmup_steps=2,
                         decay_steps=10)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = build_train_step(CFG, opt)
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_cosine_requires_decay_steps():
    with pytest.raises(ValueError, match="decay_steps"):
        make_optimizer(1e-3, schedule="cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        make_optimizer(1e-3, schedule="linear")
