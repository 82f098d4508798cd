"""benchmarks/swa.py: light-checkpoint averaging."""

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.config import DemoConfig
from phasegen_tpu.train.checkpoint import (
    load_params_npz,
    save_light_checkpoint,
)
from phasegen_tpu.train.state import create_train_state

N_FFT, HOP = 32, 8


def _make_ckpt(run, step, seed, model_cfg):
    state = create_train_state(jax.random.PRNGKey(seed), model_cfg)
    save_light_checkpoint(str(run), state, step=step)
    return state


def test_swa_uniform_average_matches_mean(tmp_path):
    import benchmarks.swa as swa

    model_cfg = DemoConfig(n_fft=N_FFT, hop=HOP,
                           compute_dtype="float32").model_config()
    run = tmp_path / "run"
    run.mkdir()
    s0 = _make_ckpt(run, 100, 0, model_cfg)
    s1 = _make_ckpt(run, 300, 1, model_cfg)

    out = tmp_path / "swa"
    swa.main(["--ckpts",
              str(run / "ckpt_100_light.npz"),
              str(run / "ckpt_300_light.npz"),
              "--out", str(out)])
    # output step is the mean of the input steps
    path = out / "ckpt_200_light.npz"
    assert path.exists()

    params, norm = load_params_npz(str(path), s0.params,
                                   norm_template=s0.norm_state)
    # averaged leaf == mean of the bf16-roundtripped sources, re-cast bf16
    want = jax.tree.map(
        lambda a, b: ((a.astype(jnp.bfloat16).astype(jnp.float32)
                       + b.astype(jnp.bfloat16).astype(jnp.float32)) / 2
                      ).astype(jnp.bfloat16).astype(jnp.float32),
        s0.params, s1.params)
    for got, exp in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=0, rtol=0)
    assert norm is not None  # BN stats averaged too


def test_swa_weighted_average(tmp_path):
    import benchmarks.swa as swa

    model_cfg = DemoConfig(n_fft=N_FFT, hop=HOP,
                           compute_dtype="float32").model_config()
    run = tmp_path / "run"
    run.mkdir()
    s0 = _make_ckpt(run, 100, 0, model_cfg)
    _make_ckpt(run, 200, 1, model_cfg)

    out = tmp_path / "swa"
    # weight 1,0 -> output equals the first checkpoint exactly
    swa.main(["--ckpts",
              str(run / "ckpt_100_light.npz"),
              str(run / "ckpt_200_light.npz"),
              "--weights", "1", "0", "--out", str(out)])
    path = out / "ckpt_100_light.npz"
    assert path.exists()
    params = load_params_npz(str(path), s0.params)
    want = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32), s0.params)
    for got, exp in zip(jax.tree.leaves(params), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   atol=0, rtol=0)
