"""End-to-end workflow tests: preproc CLI -> train CLI -> demo CLI.

Runs the full reference user journey on tiny geometry (n_fft=32 -> a
16-bin U-Net) with synthetic WAVs, all on the CPU test backend.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phasegen_tpu.data.audio_io import read_wav, resample, write_wav
from phasegen_tpu.data.synth import synth_dataset, synth_waveforms
from phasegen_tpu.obs import Logger, amplitude_to_db, spec_image
from phasegen_tpu.train.validate import build_validate_fn

N_FFT, HOP = 32, 8
T_SLICE = 127 * HOP  # 1016 samples -> exactly 128 frames
CHUNK_S = T_SLICE / 16000.0


def test_wav_roundtrip(tmp_path):
    x = synth_waveforms(1, t_samples=4000, seed=1)[0]
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_resample_preserves_tone():
    sr0, sr1 = 44100, 16000
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, sr0, sr1)
    assert abs(len(y) - sr1) <= 1
    # the resampled tone keeps its frequency: zero crossings per second
    zc = np.sum(np.abs(np.diff(np.sign(y[100:-100])))) / 2
    assert abs(zc / (len(y[100:-100]) / sr1) - 2000) < 50


def test_amplitude_to_db_range():
    mag = np.abs(np.random.default_rng(0).standard_normal((16, 32)))
    db = amplitude_to_db(mag)
    assert db.max() <= 0.0 + 1e-5
    assert db.min() >= db.max() - 80.0 - 1e-5


def test_spec_image_renders():
    img = spec_image(np.abs(np.random.default_rng(0).standard_normal((16, 128))))
    assert img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8


def test_logger_scalar_json(tmp_path):
    log_dir = str(tmp_path / "logs")
    logger = Logger(log_dir)
    logger.log(1, {"MSE": 0.5, "LMSE": 0.7})
    logger.log(2, {"MSE": 0.4})
    logger.write()
    logger.flush()
    with open(os.path.join(log_dir, "log.json")) as f:
        data = json.load(f)
    assert data["scalar/MSE"] == [[0.5, 1], [0.4, 2]]
    logger.close()


def test_logger_audio_without_soundfile(tmp_path, monkeypatch):
    """tensorboardX.add_audio needs the soundfile module, absent in this
    image — audio logs must fall back to WAV files, not crash the run
    (hit live in the 612M training run's first validation)."""
    import builtins

    real_import = builtins.__import__

    def no_soundfile(name, *a, **k):
        if name == "soundfile":
            raise ModuleNotFoundError("No module named 'soundfile'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_soundfile)
    log_dir = str(tmp_path / "logs")
    logger = Logger(log_dir)
    wav = np.sin(np.linspace(0, 100, 1600, dtype=np.float32))
    logger.log(3, {"val/hybrid": wav}, log_type="audio", sr=16000)
    logger.log(4, {"val/hybrid": wav}, log_type="audio", sr=16000)
    # non-finite audio is skipped with a warning, never raises
    logger.log(5, {"val/bad": np.full(16, np.nan)}, log_type="audio",
               sr=16000)
    logger.close()
    import glob

    wavs = sorted(glob.glob(os.path.join(log_dir, "audio", "*.wav")))
    names = [os.path.basename(p) for p in wavs]
    assert "val_hybrid_3.wav" in names and "val_hybrid_4.wav" in names
    assert not any("bad" in n for n in names)


def test_logger_rejects_bad_type(tmp_path):
    logger = Logger(str(tmp_path / "logs"))
    with pytest.raises(ValueError):
        logger.log(1, {}, log_type="video")
    with pytest.raises(ValueError):
        logger.log(1, {"a": np.zeros(10)}, log_type="audio")  # no sr


def test_validate_fn_metrics():
    from phasegen_tpu.models import UNetConfig
    from phasegen_tpu.train import create_train_state

    cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    batch = jnp.asarray(synth_dataset(2, n_fft=N_FFT, hop=HOP,
                                      t_samples=T_SLICE))
    fn = build_validate_fn(cfg, N_FFT, HOP, gl_iters=4)
    out = fn(state.params, state.norm_state, batch, jax.random.PRNGKey(1))
    assert out["orig"].shape == out["hybrid"].shape
    for k in ("MSE", "NOPMSE", "LMSE"):
        v = float(out[k])
        assert np.isfinite(v) and v >= 0
    # with an untrained net, true-phase recon must beat predicted phase
    assert float(out["MSE"]) > 0
    assert float(out["snr_hybrid_db"]) < 60  # untrained: far from perfect


@pytest.mark.slow
def test_full_cli_workflow(tmp_path):
    """preproc -> train (ckpt+resume) -> demo, through the real CLIs."""
    from phasegen_tpu.cli import demo as demo_cli
    from phasegen_tpu.cli import preproc as preproc_cli
    from phasegen_tpu.cli import train as train_cli

    # --- stage WAVs for two "genres" ---
    wav_dir = tmp_path / "wavs"
    for genre, seed in (("Pop", 0), ("Jazz", 1)):
        os.makedirs(wav_dir / genre)
        for i in range(2):
            w = synth_waveforms(1, t_samples=3 * T_SLICE, seed=seed * 10 + i)[0]
            write_wav(str(wav_dir / genre / f"t{i}.wav"), w, 16000)

    # --- preproc CLI ---
    out_dir = tmp_path / "output"
    preproc_cli.main([
        "--genres", "Pop",
        "--n_fft", str(N_FFT), "--hop_length", str(HOP),
        "--chunk", str(CHUNK_S), "--n_random", "3",
        "--n_val", "4", "--wav_dir", str(wav_dir),
        "--out_dir", str(out_dir),
    ])
    train_npy = out_dir / "Pop_audio_train.npy"
    val_npy = out_dir / "Pop_audio_val.npy"
    d = np.load(train_npy)
    assert d.ndim == 4 and d.shape[1:3] == (2, N_FFT // 2)
    assert d.shape[-1] == 128
    assert np.load(val_npy).shape[0] == 4

    # --- train CLI: 6 steps, val@2, ckpt@4 ---
    log_dir = tmp_path / "run"
    common = [
        "--log_dir", str(log_dir),
        "--train_paths", str(train_npy), "--val_paths", str(val_npy),
        "--batch_size", "4", "--val_batch_size", "2",
        "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--val_every", "2", "--ckpt_every", "4", "--gl_iters", "2",
        "--compute_dtype", "float32", "--no_media",
        "--no_data_parallel", "--prefetch", "0",
    ]
    train_cli.main(common + ["--max_steps", "4"])
    assert (log_dir / "ckpt_4").exists()
    # resume and continue to step 6
    train_cli.main(common + ["--max_steps", "6"])
    assert (log_dir / "ckpt_6").exists()
    with open(log_dir / "log.json") as f:
        scalars = json.load(f)
    assert "scalar/MSE" in scalars

    # --- demo CLI on the checkpoint ---
    demo_out = tmp_path / "demo"
    demo_cli.main([
        "--genre", "Pop", "--n_songs", "2",
        "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--weight", str(log_dir / "ckpt_6"),
        "--data_dir", str(out_dir), "--out_dir", str(demo_out),
        "--gl_iters", "2", "--compute_dtype", "float32",
    ])
    for c in range(2):
        for prefix in ("unet", "gl"):
            wav_path = demo_out / f"{prefix}_Pop_{c}.wav"
            assert wav_path.exists()
            audio, sr = read_wav(str(wav_path))
            assert sr == 16000 and np.isfinite(audio).all()
