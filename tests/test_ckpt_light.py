"""Lightweight (weights-only bf16 npz) checkpointing tests.

Round-1 review: full-state orbax saves are transfer-bound on slow links
(~25 min for 7.3 GB on the dev tunnel); --ckpt_light trades optimizer
state for ~6x fewer D2H bytes on periodic saves.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import build_train_step, create_train_state
from phasegen_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_latest,
    save_checkpoint,
    save_light_checkpoint,
    save_params_npz,
    load_params_npz,
)
from phasegen_tpu.train.state import make_optimizer

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def _trained_state(steps=2, seed=0):
    opt = make_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(seed), CFG, opt)
    step = build_train_step(CFG, opt)
    batch = jnp.asarray(synth_dataset(4, n_fft=N_FFT, hop=HOP,
                                      t_samples=T_SAMP, seed=seed))
    for _ in range(steps):
        state, _ = step(state, batch)
    return state


def test_bf16_npz_roundtrip(tmp_path):
    state = _trained_state()
    path = tmp_path / "w.npz"
    save_params_npz(str(path), state.params, state.norm_state,
                    dtype="bfloat16")
    params, norm = load_params_npz(str(path), state.params,
                                   norm_template=state.norm_state)
    assert norm is not None
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype  # restored to the template dtype (f32)
        # bf16 storage: 8-bit mantissa
        np.testing.assert_allclose(a, b, rtol=8e-3, atol=1e-6)
    # bf16 payload is ~half the f32 one
    path32 = tmp_path / "w32.npz"
    save_params_npz(str(path32), state.params, state.norm_state)
    assert path.stat().st_size < 0.6 * path32.stat().st_size


def test_light_checkpoint_resume(tmp_path):
    state = _trained_state(steps=3)
    p = save_light_checkpoint(str(tmp_path), state, step=3)
    assert p.endswith("ckpt_3_light.npz") and os.path.exists(p)

    opt = make_optimizer(1e-3)
    template = create_train_state(jax.random.PRNGKey(99), CFG, opt)
    restored = restore_latest(str(tmp_path), template)
    assert restored is not None
    assert int(jax.device_get(restored.step)) == 3
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=8e-3, atol=1e-6)
    # BN running stats came along
    for a, b in zip(jax.tree.leaves(restored.norm_state),
                    jax.tree.leaves(state.norm_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=8e-3, atol=1e-5)


def test_load_weights_from_schedule_trained_full_ckpt(tmp_path):
    """Inference weight loading must not depend on the training run's
    optimizer config: a full checkpoint saved with Adam+cosine schedule
    broke demo/evaluate restore (opt_state template mismatch, hit live
    after the 20k-step synth run)."""
    from phasegen_tpu.cli.demo import load_weights

    opt = make_optimizer(1e-3, schedule="cosine", warmup_steps=5,
                         decay_steps=50)
    state = create_train_state(jax.random.PRNGKey(3), CFG, opt)
    save_checkpoint(str(tmp_path), state, step=9)

    params, norm_state = load_weights(str(tmp_path), CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert norm_state is not None
    # direct path to the ckpt dir itself also works
    params2, _ = load_weights(str(tmp_path / "ckpt_9"), CFG)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(params2)[0]),
                                  np.asarray(jax.tree.leaves(params)[0]))


def test_init_from_warm_starts_fresh_run(tmp_path, capsys):
    """--init_from loads params/BN from any checkpoint into a step-0 run
    (fine-tuning); a resume checkpoint in log_dir still wins."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data import synth_dataset
    from phasegen_tpu.train.loop import train

    donor = _trained_state(steps=2)
    donor_path = save_light_checkpoint(str(tmp_path / "donor"), donor,
                                       step=2)

    shard = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:2])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=4000, n_fft=N_FFT, hop=HOP,
        val_every=100, ckpt_every=2, gl_iters=2, max_steps=2,
        compute_dtype="float32", log_media=False, data_parallel=False,
        device_data_gb=0.0, prefetch=0, init_from=donor_path,
        ckpt_light=True,
    )
    train(cfg)
    out = capsys.readouterr().out
    assert f"Warm-started params/BN stats from {donor_path}" in out
    # fine-tune ran from step 0 (fresh counter), saving ckpt_2
    assert os.path.exists(tmp_path / "run" / "ckpt_2_light.npz")
    # second invocation resumes from log_dir, ignoring init_from
    cfg2 = cfg.__class__(**{**cfg.__dict__, "max_steps": 4})
    train(cfg2)
    out = capsys.readouterr().out
    assert "Resumed from step 2" in out and "Warm-started" not in out
    assert os.path.exists(tmp_path / "run" / "ckpt_4_light.npz")


def test_light_resume_fast_forwards_lr_schedule(tmp_path):
    """A light-checkpoint resume must continue an LR schedule from the
    restored step, not replay warmup/decay from 0 — the fresh optimizer
    state's integer counts are fast-forwarded."""
    import optax

    state = _trained_state(steps=2)
    save_light_checkpoint(str(tmp_path), state, step=700)

    opt = make_optimizer(1e-3, schedule="cosine", warmup_steps=100,
                         decay_steps=1000)
    template = create_train_state(jax.random.PRNGKey(99), CFG, opt)
    restored = restore_latest(str(tmp_path), template)
    counts = [int(x) for x in jax.tree.leaves(restored.opt_state)
              if hasattr(x, "dtype") and x.shape == ()
              and jnp.issubdtype(x.dtype, jnp.integer)]
    assert counts and all(c == 700 for c in counts)
    # the next update applies the step-700 LR, deep in cosine decay —
    # not the warmup LR a count=0 state would use
    grads = jax.tree.map(jnp.ones_like, restored.params)
    updates, _ = opt.update(grads, restored.opt_state, restored.params)
    lr_fn = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 100, 1000)
    applied = float(np.abs(np.asarray(
        jax.tree.leaves(updates)[0])).max())
    # unit grads into fresh moments at count 700 -> 701 after update:
    # m_hat = 0.1/(1-0.9^701), v_hat = 0.001/(1-0.999^701)
    m_hat = 0.1 / (1 - 0.9**701)
    v_hat = 0.001 / (1 - 0.999**701)
    expected = float(lr_fn(700)) * m_hat / (np.sqrt(v_hat) + 1e-8)
    np.testing.assert_allclose(applied, expected, rtol=0.02)


def test_full_checkpoint_wins_step_ties(tmp_path):
    state = _trained_state(steps=1)
    save_light_checkpoint(str(tmp_path), state, step=5)
    save_checkpoint(str(tmp_path), state, step=5)
    p = latest_checkpoint(str(tmp_path), include_light=True)
    assert p is not None and not p.endswith("_light.npz")
    # newer light beats older full
    save_light_checkpoint(str(tmp_path), state, step=9)
    p = latest_checkpoint(str(tmp_path), include_light=True)
    assert p.endswith("ckpt_9_light.npz")
    # full-only scan ignores light saves
    p = latest_checkpoint(str(tmp_path))
    assert p.endswith("ckpt_5")


def test_train_cli_ckpt_light_then_resume(tmp_path):
    """--ckpt_light: periodic saves are light npz, exit save is full
    orbax, and a later run resumes from the newest checkpoint."""
    from phasegen_tpu.cli import train as train_cli

    d = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    train_npy, val_npy = tmp_path / "t.npy", tmp_path / "v.npy"
    np.save(train_npy, d)
    np.save(val_npy, d[:2])
    log_dir = tmp_path / "run"
    common = [
        "--log_dir", str(log_dir),
        "--train_paths", str(train_npy), "--val_paths", str(val_npy),
        "--batch_size", "4", "--val_batch_size", "2",
        "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--val_every", "10", "--ckpt_every", "2", "--gl_iters", "2",
        "--compute_dtype", "float32", "--no_media",
        "--no_data_parallel", "--prefetch", "0", "--device_data_gb", "0",
        "--ckpt_light",
    ]
    train_cli.main(common + ["--max_steps", "4"])
    assert (log_dir / "ckpt_2_light.npz").exists()
    assert (log_dir / "ckpt_4_light.npz").exists()
    assert (log_dir / "ckpt_4").exists()  # exit save is the full state

    # resumes (from the full ckpt_4, step ties prefer full) and continues
    train_cli.main(common + ["--max_steps", "6"])
    assert (log_dir / "ckpt_6_light.npz").exists()
    assert (log_dir / "ckpt_6").exists()
    with open(log_dir / "log.json") as f:
        json.load(f)


def test_no_final_ckpt_skips_exit_full_save(tmp_path):
    """final_ckpt=False (--no_final_ckpt): periodic light saves happen,
    but no full orbax state is written at run end (sweep-run mode; the
    exit save costs ~7 min of D2H at 612M on the tunnel)."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data import synth_dataset
    from phasegen_tpu.train.loop import train

    shard = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:2])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=4000, n_fft=N_FFT, hop=HOP,
        val_every=100, ckpt_every=2, gl_iters=2, max_steps=2,
        compute_dtype="float32", log_media=False, data_parallel=False,
        device_data_gb=0.0, prefetch=0, ckpt_light=True, final_ckpt=False,
    )
    train(cfg)
    assert os.path.exists(tmp_path / "run" / "ckpt_2_light.npz")
    assert not os.path.exists(tmp_path / "run" / "ckpt_2")


def test_serving_upload_cast_is_bit_identical(tmp_path):
    # Serving (load_weights device=True) casts conv tensors to the
    # compute dtype before upload — half the dense upload bytes for
    # bf16, and bit-identical outputs because conv1d/conv_transpose1d
    # cast the weight to the activation dtype at use anyway.
    from phasegen_tpu.cli.demo import load_weights
    from phasegen_tpu.models.unet import unet_apply

    state = _trained_state()
    path = tmp_path / "w.npz"
    save_params_npz(str(path), state.params, state.norm_state,
                    dtype="bfloat16")

    cfg_bf16 = UNetConfig(input_nc=16, output_nc=32, length=128,
                          compute_dtype=jnp.bfloat16)
    p16, n16 = load_weights(str(path), cfg_bf16)
    for side in ("down", "up"):
        for e in p16[side]:
            assert all(v.dtype == jnp.bfloat16 for v in e.values())
        for e in p16[side + "_norm"]:
            if e is not None:  # norm params stay f32 (f32 norm math)
                assert all(v.dtype == jnp.float32 for v in e.values())
    assert all(v.dtype == jnp.float32
               for v in jax.tree.leaves(n16))

    # f32-template load of the same npz, forwarded at bf16 compute,
    # must produce the exact same bits as the pre-cast tree
    tmpl_params, tmpl_norm = load_params_npz(str(path), state.params,
                                             norm_template=state.norm_state)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16, 128)).astype(np.float32))
    y16, _ = unet_apply(p16, n16, x, cfg_bf16, training=False)
    y32, _ = unet_apply(tmpl_params, tmpl_norm, x, cfg_bf16, training=False)
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))

    # f32 compute: no cast (nothing to shrink, full precision preserved)
    p32, _ = load_weights(str(path), CFG)
    assert all(v.dtype == jnp.float32
               for e in p32["down"] for v in e.values())


def test_keep_bf16_for_skips_f32_roundtrip(tmp_path):
    # Serving fast path: bf16-stored leaves selected by keep_bf16_for
    # come back as bf16 views (no host f32 materialization — ~15 s of
    # the 612M cold start), value-identical to the f32 round-trip the
    # default path performs.
    import ml_dtypes

    state = _trained_state()
    path = tmp_path / "w.npz"
    save_params_npz(str(path), state.params, state.norm_state,
                    dtype="bfloat16")
    keep = lambda key: key.startswith(("['down'][", "['up']["))
    kept, _ = load_params_npz(str(path), state.params,
                              norm_template=state.norm_state,
                              keep_bf16_for=keep)
    full, _ = load_params_npz(str(path), state.params,
                              norm_template=state.norm_state)
    for side in ("down", "up"):
        for e_k, e_f in zip(kept[side], full[side]):
            for k in e_k:
                assert e_k[k].dtype == ml_dtypes.bfloat16
                assert e_f[k].dtype == np.float32
                np.testing.assert_array_equal(
                    e_k[k].astype(np.float32), e_f[k])
        # unselected leaves (norm scale/bias) still take the f32 path
        for e_k in kept[side + "_norm"]:
            if e_k is not None:
                assert all(v.dtype == np.float32 for v in e_k.values())


def test_init_from_keeps_f32_masters_under_bf16_compute(tmp_path):
    """--init_from must load FULL-PRECISION (f32) master params into the
    train state even when the checkpoint stores bf16 and compute is bf16
    — a serving-dtype (bf16) load here would quantize every optimizer
    update to 8 mantissa bits (r3x fix: train/loop.py _load_init_f32)."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data import synth_dataset
    from phasegen_tpu.train.checkpoint import restore_weights
    from phasegen_tpu.train.loop import train

    donor = _trained_state(steps=1)
    donor_path = save_light_checkpoint(str(tmp_path / "donor"), donor,
                                       step=1)  # bf16-stored npz

    shard = synth_dataset(8, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:2])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=4000, n_fft=N_FFT, hop=HOP,
        val_every=100, ckpt_every=2, gl_iters=2, max_steps=2,
        compute_dtype="bfloat16", log_media=False, data_parallel=False,
        device_data_gb=0.0, prefetch=0, init_from=donor_path,
        ckpt_light=False,  # full-state save preserves master dtypes
    )
    train(cfg)
    params, _ = restore_weights(str(tmp_path / "run" / "ckpt_2"))
    dtypes = {str(jnp.result_type(l)) for l in jax.tree.leaves(params)}
    assert dtypes == {"float32"}, dtypes
