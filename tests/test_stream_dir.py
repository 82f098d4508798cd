"""Folder-batch streaming CLI mode."""

import os

import numpy as np
import pytest

from phasegen_tpu.data.audio_io import read_wav, write_wav
from phasegen_tpu.data.synth import synth_waveforms

HOP = 8


def test_stream_input_dir(tmp_path):
    from phasegen_tpu.cli import stream as stream_cli

    in_dir = tmp_path / "stems"
    out_dir = tmp_path / "out"
    os.makedirs(in_dir)
    for i in range(3):
        w = synth_waveforms(1, t_samples=2 * 127 * HOP, seed=i)[0]
        write_wav(str(in_dir / f"s{i}.wav"), w, 16000)

    stream_cli.main([
        "--input_dir", str(in_dir), "--output_dir", str(out_dir),
        "--random_init", "--n_fft", "32", "--hop", str(HOP),
        "--overlap", "64", "--batch_patches", "2",
        "--compute_dtype", "float32",
    ])
    for i in range(3):
        audio, sr = read_wav(str(out_dir / f"regen_s{i}.wav"))
        assert sr == 16000 and np.isfinite(audio).all()
        assert len(audio) == 2 * 127 * HOP


def test_stream_input_dir_empty(tmp_path):
    from phasegen_tpu.cli import stream as stream_cli

    os.makedirs(tmp_path / "empty")
    with pytest.raises(FileNotFoundError, match="no .wav files"):
        stream_cli.main([
            "--input_dir", str(tmp_path / "empty"), "--random_init",
            "--n_fft", "32", "--hop", str(HOP),
        ])


def test_stream_requires_io_args():
    from phasegen_tpu.cli import stream as stream_cli

    with pytest.raises(SystemExit):
        stream_cli.main(["--random_init", "--n_fft", "32", "--hop", "8"])


def test_stream_serve_mode(tmp_path, monkeypatch):
    """--serve processes 'IN OUT' stdin jobs with resident weights; bad
    lines and unreadable files are reported, not fatal."""
    import io

    from phasegen_tpu.cli import stream as stream_cli

    w = synth_waveforms(1, t_samples=2 * 127 * HOP, seed=0)[0]
    write_wav(str(tmp_path / "a.wav"), w, 16000)
    write_wav(str(tmp_path / "b.wav"), w, 16000)
    jobs = (
        f"{tmp_path}/a.wav {tmp_path}/a_out.wav\n"
        "not-a-valid-job-line\n"
        f"{tmp_path}/missing.wav {tmp_path}/m_out.wav\n"
        f"{tmp_path}/b.wav {tmp_path}/b_out.wav\n"
        "\n"  # blank line stops the server
        f"{tmp_path}/a.wav {tmp_path}/never.wav\n"
    )
    monkeypatch.setattr("sys.stdin", io.StringIO(jobs))
    stream_cli.main([
        "--serve", "--random_init", "--n_fft", "32", "--hop", str(HOP),
        "--overlap", "64", "--batch_patches", "2",
        "--compute_dtype", "float32",
    ])
    for name in ("a_out.wav", "b_out.wav"):
        audio, sr = read_wav(str(tmp_path / name))
        assert sr == 16000 and np.isfinite(audio).all()
    assert not os.path.exists(tmp_path / "m_out.wav")
    assert not os.path.exists(tmp_path / "never.wav")
