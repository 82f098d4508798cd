"""Preprocessing unit tests: chunk offsets, padding, multi-source shapes."""

import numpy as np
import pytest

from phasegen_tpu.data.preproc import (
    batched_stft_ri,
    chunk_offsets,
    gather_chunks,
)


def test_chunk_offsets_sequential_plus_random():
    rng = np.random.default_rng(0)
    a_len, t_slice, n_random = 10_000, 3_000, 4
    offs = chunk_offsets(a_len, t_slice, n_random, rng)
    # ceil(10000/3000)=4 sequential positions, each with 4 random crops
    assert len(offs) == 4 * (1 + n_random)
    seq = offs[:: 1 + n_random]
    assert seq == [0, 3000, 6000, 9000]
    bnd = int(a_len - t_slice // 1.3)  # reference bound (preproc_mdb.py:70)
    rand = [o for i, o in enumerate(offs) if i % (1 + n_random)]
    assert all(0 <= o < bnd for o in rand)


def test_gather_chunks_zero_pads_tail():
    audio = np.arange(20, dtype=np.float32).reshape(1, 20)
    out = gather_chunks(audio, [0, 15], t_slice=8)
    assert out.shape == (2, 1, 8)
    np.testing.assert_array_equal(out[0, 0], np.arange(8))
    np.testing.assert_array_equal(out[1, 0, :5], np.arange(15, 20))
    np.testing.assert_array_equal(out[1, 0, 5:], 0)


def test_batched_stft_numpy_fallback_matches_device():
    rng = np.random.default_rng(1)
    chunks = rng.standard_normal((3, 2, 127 * 8)).astype(np.float32)
    dev = batched_stft_ri(chunks, 32, 8, device=True, batch=2)
    host = batched_stft_ri(chunks, 32, 8, device=False)
    assert dev.shape == host.shape == (3, 2, 2, 16, 128)
    np.testing.assert_allclose(dev, host, atol=1e-4)


def test_stft_backend_auto_selection(monkeypatch):
    """device=None auto-selects per backend: device GEMM-STFT everywhere
    except the D2H-bound axon tunnel (VERDICT r3 #8; BASELINE.md r3x
    measured host numpy 2x faster there)."""
    import phasegen_tpu.data.preproc as pp

    # under the test CPU backend the auto pick is the device path
    assert pp._auto_device_stft() is True
    rng = np.random.default_rng(2)
    chunks = rng.standard_normal((2, 1, 127 * 8)).astype(np.float32)
    auto = batched_stft_ri(chunks, 32, 8)  # device=None -> auto
    host = batched_stft_ri(chunks, 32, 8, device=False)
    np.testing.assert_allclose(auto, host, atol=1e-4)

    class _FakeDev:
        platform = "axon"

    import jax

    monkeypatch.setattr(jax, "devices", lambda: [_FakeDev()])
    assert pp._auto_device_stft() is False


def test_preproc_cli_stft_flag_tristate():
    from phasegen_tpu.cli.preproc import build_parser

    p = build_parser()
    base = ["--genres", "Pop"]
    assert p.parse_args(base).stft == "auto"
    assert p.parse_args(base + ["--stft", "host"]).stft == "host"
    assert p.parse_args(base + ["--no_device_stft"]).no_device_stft
