"""Measure the CPU reference baseline: torch-CPU U-Net forward + host ISTFT.

Reproduces the reference demo's per-clip path (reference: demo.py:33-44)
on CPU: forward the log-magnitude patch through a torch implementation of
the exact reference architecture, rebuild the complex spectrogram from
true magnitude + predicted phase, ISTFT on the host. The measured
audio-seconds/sec becomes the ``vs_baseline`` denominator in bench.py.

Run once per machine:  python benchmarks/cpu_reference.py [n_clips]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

torch.set_num_threads(torch.get_num_threads())  # default: all cores

N_FFT, HOP, SR = 2048, 512, 16000
T_SLICE = 65024  # 4.064 s
C = 1024


def torch_reference_forward(x: torch.Tensor, ws: dict) -> torch.Tensor:
    """Literal reference architecture (reference: model.py:27-34,85-113)."""
    lr = lambda v: F.leaky_relu(v, 0.2)

    def bn(v):
        return F.batch_norm(v, torch.zeros(v.shape[1]), torch.ones(v.shape[1]),
                            training=False, eps=1e-5)

    d0 = F.conv1d(x, ws["d0"], stride=2, padding=16)
    d1 = bn(F.conv1d(lr(d0), ws["d1"], stride=1, padding=2))
    d2 = bn(F.conv1d(lr(d1), ws["d2"], stride=2, padding=1))
    d3 = F.conv1d(lr(d2), ws["d3"], stride=2, padding=1)
    u3 = bn(F.conv_transpose1d(F.relu(d3), ws["u3"], stride=2, padding=1))
    c3 = torch.cat([d2, u3], 1)
    u2 = bn(F.conv_transpose1d(F.relu(c3), ws["u2"], stride=2, padding=1))
    c2 = torch.cat([d1, u2], 1)
    u1 = bn(F.conv_transpose1d(F.relu(c2), ws["u1"], stride=1, padding=2))
    c1 = torch.cat([d0, u1], 1)
    return bn(F.conv_transpose1d(F.relu(c1), ws["u0"], stride=2, padding=16))


def host_istft(spec: np.ndarray, hop: int) -> np.ndarray:
    """numpy ISTFT with window-sum normalization (librosa convention)."""
    n_fft = 2 * (spec.shape[0] - 1)
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = np.fft.irfft(spec.T, n=n_fft, axis=-1) * w
    out = np.zeros(hop * (spec.shape[1] - 1) + n_fft, np.float64)
    wsum = np.zeros_like(out)
    for i in range(spec.shape[1]):
        out[i * hop : i * hop + n_fft] += frames[i]
        wsum[i * hop : i * hop + n_fft] += w * w
    good = wsum > 1e-38
    out[good] /= wsum[good]
    return out[n_fft // 2 : -n_fft // 2].astype(np.float32)


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    rng = np.random.default_rng(0)
    g = torch.Generator().manual_seed(0)

    def w(shape):
        return torch.randn(*shape, generator=g) * 0.02

    ws = {
        "d0": w((2 * C, C, 32)), "d1": w((2 * C, 2 * C, 8)),
        "d2": w((2 * C, 2 * C, 8)), "d3": w((4 * C, 2 * C, 4)),
        "u3": w((4 * C, 2 * C, 5)), "u2": w((4 * C, 2 * C, 8)),
        "u1": w((4 * C, 2 * C, 8)), "u0": w((4 * C, 2 * C, 32)),
    }

    t = np.arange(T_SLICE) / SR
    clips = [
        (0.5 * np.sin(2 * np.pi * (300 + 50 * i) * t)).astype(np.float32)
        for i in range(n_clips)
    ]

    # host STFT -> logmag (preproc contract)
    def stft(x):
        xp = np.pad(x, N_FFT // 2, mode="reflect")
        nf = 1 + (len(xp) - N_FFT) // HOP
        idx = np.arange(nf)[:, None] * HOP + np.arange(N_FFT)[None, :]
        win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
        return np.fft.rfft(xp[idx] * win, axis=-1).T[1:]  # drop DC

    times = []
    with torch.no_grad():
        # warmup (allocators, thread pools)
        spec0 = stft(clips[0])
        lm0 = torch.from_numpy(np.log1p(np.abs(spec0))[None].astype(np.float32))
        torch_reference_forward(lm0, ws)
        for clip in clips:
            start = time.time()
            spec = stft(clip)
            logmag = np.log1p(np.abs(spec)).astype(np.float32)
            pred = torch_reference_forward(
                torch.from_numpy(logmag[None]), ws).numpy()[0]
            phase = pred[:C]
            rebuilt = (np.exp(logmag) - 1) * np.exp(1j * phase)
            full = np.concatenate(
                [np.zeros((1, rebuilt.shape[1]), np.complex64), rebuilt])
            audio = host_istft(full, HOP)
            times.append(time.time() - start)

    sec_per_clip = float(np.mean(times))
    clip_sec = T_SLICE / SR
    print(f"CPU reference: {sec_per_clip:.3f} sec/clip "
          f"-> {clip_sec / sec_per_clip:.4f} audio-seconds/sec")


if __name__ == "__main__":
    main()
