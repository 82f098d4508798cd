"""Reference-compat API layer + high-res/stereo config tests."""

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu import compat
from phasegen_tpu.data.loader import flatten_sources
from phasegen_tpu.data.synth import np_stft, synth_waveforms
from phasegen_tpu.infer import build_infer_fn
from phasegen_tpu.models import UNetConfig, unet_init

N_FFT, HOP = 32, 8
T = 127 * HOP


def _spec(seed=0):
    w = synth_waveforms(1, t_samples=T, seed=seed)[0]
    return np_stft(w, N_FFT, HOP)[1:]  # DC dropped (F, T)


def test_generate_audio_stacked_and_complex():
    s = _spec()
    a1 = compat.generate_audio(np.stack([s.real, s.imag]), sr=16000,
                               hop_length=HOP)
    a2 = compat.generate_audio(s, sr=16000, hop_length=HOP, is_stft=True)
    np.testing.assert_allclose(a1, a2, atol=1e-6)
    assert np.abs(a1).max() <= 1.0 + 1e-5


def test_compat_griffin_lim_triple():
    mag = np.abs(_spec(seed=2))
    audio, final, loss = compat.griffin_lim(mag, n_fft=N_FFT,
                                            hop_length=HOP, n_iter=8)
    assert audio.ndim == 1 and np.isfinite(audio).all()
    assert final.shape == mag.shape and np.iscomplexobj(final)
    assert loss >= 0


def test_griffin_lim_warm_start_preserves_fixed_point():
    """griffin_lim(init=...) seeded with the exact-phase reconstruction
    must stay at the fixed point (true mag + true phase is GL-stationary),
    while a random start at the same iteration count is far away."""
    from phasegen_tpu.ops.dft import istft_ri, polar_to_ri
    from phasegen_tpu.ops.griffin_lim import griffin_lim
    from phasegen_tpu.ops.stft import add_dc, normalize_inf

    s = _spec(seed=5)
    mag = jnp.asarray(np.abs(s))
    logmag = jnp.log1p(mag)
    phase = jnp.asarray(np.angle(s))
    re, im = polar_to_ri(logmag, phase)
    exact = istft_ri(add_dc(re), add_dc(im), N_FFT, HOP)
    orig = np.asarray(normalize_inf(exact))

    warm, _, _ = griffin_lim(mag, N_FFT, HOP, n_iter=4, init=exact)
    cold, _, _ = griffin_lim(mag, N_FFT, HOP, n_iter=4)
    mae_warm = float(np.mean(np.abs(orig - np.asarray(warm))))
    mae_cold = float(np.mean(np.abs(orig - np.asarray(cold))))
    assert mae_warm < 5e-3, mae_warm
    assert mae_warm < 0.1 * mae_cold, (mae_warm, mae_cold)


def test_energy_loss_formula():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 2, 8, 4)).astype(np.float32)
    b = rng.standard_normal((2, 2, 8, 4)).astype(np.float32)
    loss = float(compat.EnergyLoss()(a, b))
    amp = lambda v: np.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2 + 1e-10)
    golden = np.mean((amp(a) - amp(b)) ** 2)
    assert abs(loss - golden) < 1e-6


def test_compat_loader(tmp_path):
    from phasegen_tpu.data import synth_dataset

    d = synth_dataset(4, n_fft=N_FFT, hop=HOP, t_samples=T)
    p = tmp_path / "s.npy"
    np.save(p, d)
    loader = compat.get_fft_npy_loader([str(p)], labels=[1], batch_size=2)
    batch, lab = next(iter(loader))
    assert batch.shape == (2, 2, 16, 128)
    assert int(lab[0]) == 1


def test_spec_img_compat():
    s = _spec(seed=1)
    img = compat.generate_spec_img(np.stack([s.real, s.imag]))
    assert img.dtype == np.uint8 and img.shape[-1] == 3


def test_flatten_sources():
    x = np.arange(2 * 3 * 2 * 4 * 5, dtype=np.float32).reshape(2, 3, 2, 4, 5)
    y = flatten_sources(x)
    assert y.shape == (2, 2, 12, 5)
    # source s, channel c, freq f lands at channel c, row s*4+f
    np.testing.assert_array_equal(y[1, 0, 4:8], x[1, 1, 0])
    np.testing.assert_array_equal(y[0, 1, 8:], x[0, 2, 1])


def test_stereo_infer_pipeline():
    cfg = UNetConfig(input_nc=32, output_nc=64, length=128)  # 2ch * 16 bins
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    infer = build_infer_fn(cfg, N_FFT, HOP, channels=2)
    wav = jnp.asarray(np.stack([
        synth_waveforms(2, t_samples=T, seed=i) for i in range(2)
    ]))  # (B=2, C=2, T)
    out, phase = infer(params, state, wav)
    assert out.shape == wav.shape
    assert phase.shape == (2, 32, 128)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_highres_deeper_train_config():
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.models.unet import stage_specs

    cfg = TrainConfig(n_fft=64, channels=2, extra_depth=1,
                      compute_dtype="bfloat16")
    mc = cfg.model_config()
    assert mc.input_nc == 64 and mc.output_nc == 128
    assert len(stage_specs(mc)) == 5  # extra stage present


def test_stereo_normalize_preserves_channel_balance():
    """channels=2 inference with normalize=True must normalize per CLIP:
    a per-channel peak normalization would force L and R to equal peaks,
    destroying the stereo image (r3x review finding)."""
    cfg = UNetConfig(input_nc=2 * (N_FFT // 2), output_nc=4 * (N_FFT // 2),
                     length=128)
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    infer = build_infer_fn(cfg, N_FFT, HOP, channels=2, normalize=True)
    mono = synth_waveforms(1, t_samples=T, seed=3)[0]
    wav = jnp.asarray(np.stack([0.8 * mono, 0.2 * mono])[None])  # (1,2,T)
    out, _ = infer(params, state, wav)
    out = np.asarray(out)
    assert out.shape == (1, 2, T)
    peaks = np.abs(out).max(axis=-1)[0]
    assert np.isclose(peaks.max(), 1.0, atol=1e-3)  # clip peak hits 1.0
    # the quiet channel must stay well below the loud one (true-magnitude
    # resynthesis preserves the ~4x energy ratio; the old bug made both 1.0)
    assert peaks.min() < 0.6 * peaks.max()


def test_batched_griffin_lim_normalizes_per_clip():
    """Batched GL output must peak-normalize each clip independently —
    a global batch max under-scales quiet clips relative to the per-clip
    normalized references, biasing LMSE (r3x review fix)."""
    from phasegen_tpu.ops.griffin_lim import griffin_lim

    loud = np.abs(_spec(seed=4))
    quiet = 0.25 * loud
    mag = jnp.asarray(np.stack([loud, quiet]))
    audio, _, _ = griffin_lim(mag, n_fft=N_FFT, hop=HOP, n_iter=4)
    peaks = np.abs(np.asarray(audio)).max(axis=-1)
    np.testing.assert_allclose(peaks, 1.0, atol=1e-5)  # each clip at peak
    # and batched == per-clip single runs (same key per... keys differ by
    # construction; compare the quiet clip against its own single run)
    single, _, _ = griffin_lim(jnp.asarray(quiet), n_fft=N_FFT, hop=HOP,
                               n_iter=4)
    assert np.abs(np.asarray(single)).max() <= 1.0 + 1e-5
