"""Train step, loss, loader, synthetic data, and checkpoint tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from phasegen_tpu.data import NpyPatchLoader, get_spec_and_angle, synth_dataset
from phasegen_tpu.data.synth import np_stft
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import (
    build_eval_step,
    build_train_step,
    create_train_state,
    phase_mag_loss,
)
from phasegen_tpu.train.checkpoint import (
    latest_checkpoint,
    load_params_npz,
    restore_latest,
    save_checkpoint,
    save_params_npz,
)
from phasegen_tpu.train.state import make_optimizer
from phasegen_tpu.train.step import ri_to_logmag_phase

CFG = UNetConfig(input_nc=16, output_nc=32, length=128)
N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def _dataset(n=8, seed=0):
    return synth_dataset(n, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP, seed=seed)


def test_synth_dataset_layout():
    d = _dataset(4)
    assert d.shape == (4, 2, 16, 128)
    assert d.dtype == np.float32
    # standardized like the reference preproc (preproc_mdb.py:182)
    assert abs(d.mean()) < 1e-4 and abs(d.std() - 1.0) < 1e-4


def test_np_stft_matches_jax_stft():
    from phasegen_tpu.ops import stft
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    golden = np.asarray(stft(jnp.asarray(x), 512, 128))
    ours = np_stft(x, 512, 128)
    np.testing.assert_allclose(ours, golden, atol=1e-3 * np.abs(golden).max())


def test_loss_matches_torch_formula():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((2, 32, 128)).astype(np.float32)
    logmag = rng.standard_normal((2, 16, 128)).astype(np.float32)
    phase = (rng.uniform(-np.pi, np.pi, (2, 16, 128))).astype(np.float32)

    tp, tl, tph = map(torch.from_numpy, (pred, logmag, phase))
    mse = torch.nn.MSELoss()
    pred_p, pred_m = tp[:, :16], tp[:, 16:]
    ang = mse(torch.cos(pred_p), tph.cos()) + mse(torch.sin(pred_p), tph.sin())
    golden = (ang + 0.2 * mse(pred_m, tl)).item()

    loss, metrics = phase_mag_loss(jnp.asarray(pred), jnp.asarray(logmag),
                                   jnp.asarray(phase), n_bins=16)
    assert abs(float(loss) - golden) < 1e-5
    assert abs(float(metrics["ang_loss"]) - ang.item()) < 1e-5


def test_mag2_weighted_loss_properties():
    """mag2 weighting: mean-1 weights (uniform magnitude == reference
    loss), and the reported ang_loss metric stays the unweighted value."""
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.standard_normal((2, 32, 128)), jnp.float32)
    phase = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 16, 128)), jnp.float32)

    # uniform magnitude -> weights are exactly 1 -> loss == reference loss
    logmag_u = jnp.full((2, 16, 128), 0.7, jnp.float32)
    l_ref, m_ref = phase_mag_loss(pred, logmag_u, phase, 16)
    l_w, m_w = phase_mag_loss(pred, logmag_u, phase, 16,
                              ang_weighting="mag2")
    assert abs(float(l_ref) - float(l_w)) < 1e-4  # f32 weight rounding

    # non-uniform magnitude: total loss differs, ang_loss metric doesn't
    logmag = jnp.asarray(np.abs(rng.standard_normal((2, 16, 128))),
                         jnp.float32)
    l0, m0 = phase_mag_loss(pred, logmag, phase, 16)
    l1, m1 = phase_mag_loss(pred, logmag, phase, 16, ang_weighting="mag2")
    assert abs(float(m0["ang_loss"]) - float(m1["ang_loss"])) < 1e-6
    assert abs(float(l0) - float(l1)) > 1e-4
    with pytest.raises(ValueError):
        phase_mag_loss(pred, logmag, phase, 16, ang_weighting="bogus")


def test_ri_to_logmag_phase_matches_reference_formula():
    d = _dataset(3)
    golden = get_spec_and_angle(d)
    lm, ph = ri_to_logmag_phase(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(lm), golden[:, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ph), golden[:, 1], atol=1e-5)


def test_train_step_descends():
    opt = make_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = build_train_step(CFG, opt)
    batch = jnp.asarray(_dataset(4))

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    # on a fixed batch, Adam must make clear progress
    assert losses[-1] < losses[0] * 0.9, losses


def test_wav_loss_zero_at_true_phase_and_matches_validate():
    """hybrid_wav_mae == 0 for perfect phase; equals validate's MSE else."""
    from phasegen_tpu.train.losses import hybrid_wav_mae
    from phasegen_tpu.train.validate import build_validate_fn

    batch = jnp.asarray(_dataset(3, seed=2))
    logmag, phase = ri_to_logmag_phase(batch)
    zero = hybrid_wav_mae(phase, logmag, phase, N_FFT, HOP)
    assert float(zero) < 1e-6

    # against the validation graph: same reconstruction, same metric
    state = create_train_state(jax.random.PRNGKey(1), CFG)
    val = build_validate_fn(CFG, N_FFT, HOP, gl_iters=1)
    out = val(state.params, state.norm_state, batch, jax.random.PRNGKey(0))
    from phasegen_tpu.models.unet import unet_apply

    pred, _ = unet_apply(state.params, state.norm_state, logmag, CFG,
                         training=False)
    mae = hybrid_wav_mae(pred[:, :CFG.input_nc].astype(jnp.float32),
                         logmag, phase, N_FFT, HOP)
    np.testing.assert_allclose(float(mae), float(out["MSE"]), rtol=1e-4)


def test_wav_loss_in_step_descends_metric():
    """With wav_weight on, the train step reports and reduces wav_loss."""
    opt = make_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = build_train_step(CFG, opt, wav_weight=1.0, n_fft=N_FFT, hop=HOP)
    batch = jnp.asarray(_dataset(4))

    wavs = []
    for _ in range(8):
        state, metrics = step(state, batch)
        assert "wav_loss" in metrics
        wavs.append(float(metrics["wav_loss"]))
    assert wavs[-1] < wavs[0], wavs


def test_eval_step_deterministic():
    state = create_train_state(jax.random.PRNGKey(0), CFG)
    ev = build_eval_step(CFG)
    batch = jnp.asarray(_dataset(2, seed=5))
    p1, m1 = ev(state, batch)
    p2, m2 = ev(state, batch)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    assert p1.shape == (2, 32, 128)


def test_loader_batching_and_drop_ragged(tmp_path):
    d = _dataset(10)
    p = tmp_path / "shard.npy"
    np.save(p, d)
    loader = NpyPatchLoader([str(p)], batch_size=4, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4, ragged 2 dropped (train.py:38-39)
    assert all(b.shape == (4, 2, 16, 128) for b in batches)
    assert len(loader) == 2


def test_loader_labels_and_precon(tmp_path):
    d = _dataset(4)
    p = tmp_path / "shard.npy"
    np.save(p, d)
    loader = NpyPatchLoader([str(p)], labels=[7], batch_size=2, precon=True,
                            shuffle=False, prefetch=0)
    batch, lab = next(iter(loader))
    assert np.all(np.asarray(lab) == 7)
    np.testing.assert_allclose(np.asarray(batch),
                               get_spec_and_angle(d)[:2], atol=1e-6)


def test_loader_shuffle_differs_between_epochs(tmp_path):
    d = _dataset(8)
    p = tmp_path / "shard.npy"
    np.save(p, d)
    loader = NpyPatchLoader([str(p)], batch_size=8, seed=3)
    e1 = np.asarray(next(iter(loader)))
    e2 = np.asarray(next(iter(loader)))
    assert not np.allclose(e1, e2)  # different order
    np.testing.assert_allclose(np.sort(e1.ravel()), np.sort(e2.ravel()),
                               atol=1e-6)  # same content


def test_checkpoint_roundtrip(tmp_path):
    opt = make_optimizer()
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = build_train_step(CFG, opt)
    batch = jnp.asarray(_dataset(2))
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_2")

    template = create_train_state(jax.random.PRNGKey(1), CFG, opt)
    restored = restore_latest(str(tmp_path), template)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training must continue seamlessly from the restored state
    restored, metrics = step(restored, batch)
    assert int(restored.step) == 3
    assert np.isfinite(float(metrics["loss"]))


def test_params_npz_roundtrip(tmp_path):
    state = create_train_state(jax.random.PRNGKey(2), CFG)
    p = str(tmp_path / "w.npz")
    save_params_npz(p, state.params)
    loaded = load_params_npz(p, state.params)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wav_loss_stacked_channels_unstacks_per_source():
    """(B, C*F, T) stacked-stereo inputs: hybrid_wav_mae must ISTFT each
    source channel separately — equal to the mean of per-channel MAEs."""
    from phasegen_tpu.train.losses import hybrid_wav_mae

    d = jnp.asarray(np.concatenate([_dataset(2, seed=3),
                                    _dataset(2, seed=4)], axis=2))
    # (2, 2, 32, 128): treat the 2x16 bins as C=2 stacked sources
    logmag, phase = ri_to_logmag_phase(d)
    assert logmag.shape == (2, 32, 128)
    rng = np.random.default_rng(0)
    pred = jnp.asarray(phase + 0.3 * rng.standard_normal(phase.shape)
                       .astype(np.float32))
    stacked = float(hybrid_wav_mae(pred, logmag, phase, N_FFT, HOP))
    per_c = [float(hybrid_wav_mae(pred[:, i * 16:(i + 1) * 16],
                                  logmag[:, i * 16:(i + 1) * 16],
                                  phase[:, i * 16:(i + 1) * 16],
                                  N_FFT, HOP)) for i in range(2)]
    np.testing.assert_allclose(stacked, np.mean(per_c), rtol=1e-5)


def test_validate_stacked_channels_per_source_istft():
    """Stacked-channel validate (r3 review): MSE must match the per-source
    ISTFT semantics of hybrid_wav_mae, and the audio banks come out
    (B, C, T) — not one ISTFT over the concatenated C*F bin axis."""
    from phasegen_tpu.models import unet_apply, unet_init
    from phasegen_tpu.ops.dft import istft_ri, polar_to_ri
    from phasegen_tpu.ops.stft import add_dc, normalize_inf
    from phasegen_tpu.train.validate import build_validate_fn

    cfg2 = UNetConfig(input_nc=32, output_nc=64, length=128)
    d = jnp.asarray(np.concatenate([_dataset(2, seed=5),
                                    _dataset(2, seed=6)], axis=2))
    params, norm = unet_init(jax.random.PRNGKey(0), cfg2)
    val = build_validate_fn(cfg2, N_FFT, HOP, gl_iters=2, phase_err=False)
    out = val(params, norm, d, jax.random.PRNGKey(1))
    t_len = HOP * (128 - 1)
    assert out["orig"].shape == (2, 2, t_len)
    assert out["hybrid"].shape == (2, 2, t_len)

    # manual per-channel hybrid MAE == reported MSE
    logmag, phase = ri_to_logmag_phase(d)
    pred, _ = unet_apply(params, norm, logmag, cfg2, training=False)
    pp = pred[:, :32].astype(jnp.float32)

    def audio(lm, ph):
        re, im = polar_to_ri(lm, ph)
        w = istft_ri(add_dc(re), add_dc(im), N_FFT, HOP, length=t_len)
        return normalize_inf(w, axis=-1)

    shape = (2, 2, 16, 128)
    orig = audio(jnp.reshape(logmag, shape), jnp.reshape(phase, shape))
    hyb = audio(jnp.reshape(logmag, shape), jnp.reshape(pp, shape))
    want = float(jnp.mean(jnp.abs(orig - hyb)))
    np.testing.assert_allclose(float(out["MSE"]), want, rtol=1e-5)


def test_ang_weight_scales_angle_term_only():
    """--ang_weight scales the cos/sin term in the total loss while the
    reported ang_loss metric stays the unweighted reference value."""
    from phasegen_tpu.train.losses import phase_mag_loss

    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    logmag = jnp.abs(jnp.asarray(
        rng.standard_normal((2, 16, 16)).astype(np.float32)))
    phase = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (2, 16, 16)).astype(np.float32))

    l1, m1 = phase_mag_loss(pred, logmag, phase, 16, mag_weight=0.2)
    l0, m0 = phase_mag_loss(pred, logmag, phase, 16, mag_weight=0.2,
                            ang_weight=0.0)
    lh, mh = phase_mag_loss(pred, logmag, phase, 16, mag_weight=0.2,
                            ang_weight=0.5)
    # ang_weight=0 leaves only the magnitude term
    np.testing.assert_allclose(float(l0), 0.2 * float(m0["mag_loss"]),
                               rtol=1e-6)
    # metric stays unweighted; the total interpolates linearly
    assert float(m0["ang_loss"]) == float(m1["ang_loss"])
    np.testing.assert_allclose(float(lh), (float(l0) + float(l1)) / 2,
                               rtol=1e-6)


def test_sc_loss_zero_at_true_phase_and_positive_else():
    """spectral_sin2 ~ 0 for the true (consistent) phase, clearly
    positive for zero phase, with finite gradients everywhere."""
    from phasegen_tpu.train.losses import spectral_sin2

    batch = jnp.asarray(_dataset(3, seed=3))
    logmag, phase = ri_to_logmag_phase(batch)
    at_true = float(spectral_sin2(phase, logmag, N_FFT, HOP))
    # not exactly 0 at this TINY geometry: the zeroed DC row is 1/17 of
    # the band here and projects back with window-sidelobe leakage
    # (measured 0.022; at the production 2048-pt geometry the same
    # probe is exactly 0.0 vs 0.64 for zero phase)
    assert at_true < 0.05, at_true
    at_zero = float(spectral_sin2(jnp.zeros_like(phase), logmag,
                                  N_FFT, HOP))
    assert at_zero > 5 * at_true, (at_true, at_zero)

    g = jax.grad(lambda p: spectral_sin2(p, logmag, N_FFT, HOP))(phase)
    assert np.isfinite(np.asarray(g)).all()


def test_sc_loss_in_step_descends_metric():
    """With sc_weight on, the train step reports and reduces sc_loss."""
    opt = make_optimizer(1e-3)
    state = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    step = build_train_step(CFG, opt, sc_weight=1.0, n_fft=N_FFT, hop=HOP)
    batch = jnp.asarray(_dataset(4))

    scs = []
    for _ in range(8):
        state, metrics = step(state, batch)
        assert "sc_loss" in metrics
        scs.append(float(metrics["sc_loss"]))
    assert scs[-1] < scs[0], scs
