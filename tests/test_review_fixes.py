"""Regression tests for the round-1 code-review findings."""

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.parallel import (
    batch_sharding,
    build_dp_train_step,
    make_mesh,
    shard_train_state,
)
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.checkpoint import load_params_npz, save_params_npz
from phasegen_tpu.train.state import make_optimizer

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def test_rng_key_replicated_under_tp4():
    """TP=4: the PRNG key (shape (2,)) must replicate, not shard."""
    mesh = make_mesh(n_data=2, n_model=4)
    opt = make_optimizer()
    state = shard_train_state(create_train_state(jax.random.PRNGKey(0), CFG,
                                                 opt), mesh)
    assert state.rng.sharding.spec == jax.sharding.PartitionSpec()
    # and a step still runs + matches single-chip loss
    dp_step = build_dp_train_step(CFG, opt, mesh, state)
    batch_np = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    batch = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh, 4))
    state, metrics = dp_step(state, batch)

    ref_state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    ref_step = build_train_step(CFG, opt)
    _, ref_metrics = ref_step(ref_state, jnp.asarray(batch_np))
    assert abs(float(metrics["loss"]) - float(ref_metrics["loss"])) < 1e-5


def test_npz_roundtrips_norm_state(tmp_path):
    state = create_train_state(jax.random.PRNGKey(3), CFG)
    # make the running stats distinguishable from fresh init
    ns = jax.tree.map(lambda x: x + 0.25, state.norm_state)
    p = str(tmp_path / "w.npz")
    save_params_npz(p, state.params, norm_state=ns)
    params, norm = load_params_npz(p, state.params,
                                   norm_template=state.norm_state)
    assert norm is not None
    np.testing.assert_allclose(np.asarray(norm["up"][0]["mean"]),
                               np.asarray(ns["up"][0]["mean"]))
    # legacy npz without stats -> (params, None)
    p2 = str(tmp_path / "legacy.npz")
    save_params_npz(p2, state.params)
    _, norm2 = load_params_npz(p2, state.params,
                               norm_template=state.norm_state)
    assert norm2 is None


def test_demo_loads_npz_with_stats(tmp_path, capsys):
    from phasegen_tpu.cli.demo import load_weights

    state = create_train_state(jax.random.PRNGKey(1), CFG)
    ns = jax.tree.map(lambda x: x + 0.5, state.norm_state)
    p = str(tmp_path / "w.npz")
    save_params_npz(p, state.params, norm_state=ns)
    params, norm = load_weights(p, CFG)
    np.testing.assert_allclose(np.asarray(norm["up"][0]["var"]),
                               np.asarray(ns["up"][0]["var"]))
    assert "WARNING" not in capsys.readouterr().out

    p2 = str(tmp_path / "legacy.npz")
    save_params_npz(p2, state.params)
    _, norm2 = load_weights(p2, CFG)
    assert "no BatchNorm running stats" in capsys.readouterr().out


def test_profiler_window_resume_safe(tmp_path):
    """--profile_steps must produce a trace even on a resumed run."""
    from phasegen_tpu.cli import train as train_cli

    d = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    p = tmp_path / "s.npy"
    np.save(p, d)
    common = [
        "--log_dir", str(tmp_path / "run"),
        "--train_paths", str(p), "--val_paths", str(p),
        "--batch_size", "4", "--val_batch_size", "2",
        "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--val_every", "1000", "--gl_iters", "1",
        "--compute_dtype", "float32", "--no_media",
        "--no_data_parallel", "--prefetch", "0",
    ]
    # first run creates a checkpoint at step 14
    train_cli.main(common + ["--max_steps", "14", "--ckpt_every", "14"])
    # resumed run starts at 14; profile window = [24, 26)
    train_cli.main(common + ["--max_steps", "30", "--ckpt_every", "0",
                             "--profile_steps", "2"])
    import glob
    assert glob.glob(str(tmp_path / "run" / "profile" / "**" / "*"),
                     recursive=True), "no profiler trace written on resume"


def test_load_weights_empty_dir_raises_clearly(tmp_path):
    """ADVICE r2: a directory with no checkpoints must raise
    FileNotFoundError naming the path, not an obscure orbax error."""
    import pytest

    from phasegen_tpu.cli.demo import load_weights
    from phasegen_tpu.models.unet import UNetConfig

    cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        load_weights(str(tmp_path), cfg)


def test_light_resume_only_rewrites_count_fields():
    """ADVICE r2: the light-resume fast-forward must touch only optax
    count fields, not arbitrary integer scalars in the opt state."""
    import jax
    import jax.numpy as jnp
    import optax

    from phasegen_tpu.train.checkpoint import (
        save_light_checkpoint,
        restore_latest,
    )
    from phasegen_tpu.train.state import create_train_state
    from phasegen_tpu.models.unet import UNetConfig

    cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
    # optimizer carrying a non-count integer scalar state (MultiSteps'
    # mini_step) that a blanket int-leaf rewrite would clobber
    opt = optax.MultiSteps(optax.adam(1e-3), every_k_schedule=2)
    state = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_light_checkpoint(d, state, step=123)
        restored = restore_latest(d, state)
    assert int(restored.step) == 123
    leaves_int = [x for x in jax.tree.leaves(restored.opt_state)
                  if hasattr(x, "dtype") and x.shape == ()
                  and jnp.issubdtype(x.dtype, jnp.integer)]
    # inner adam count fast-forwarded to 123; MultiSteps counters NOT
    vals = sorted(int(v) for v in leaves_int)
    assert 123 in vals
    assert 0 in vals, f"MultiSteps mini_step was clobbered: {vals}"
