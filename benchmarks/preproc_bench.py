"""Preprocessing throughput: device GEMM-STFT vs host numpy fallback.

The reference's preproc is its heaviest CPU stage — a per-chunk
librosa.stft loop over ~31x crop-augmented coverage of every track
(reference: preproc_mdb.py:66-97, SURVEY.md call stack 3.1). Here the
chunk gather happens on host but all STFTs run as ONE batched device
GEMM per track (data/preproc.py:batched_stft_ri). This benchmark
measures the end-to-end `compute_feature` wall time both ways on
synthetic WAV tracks and reports audio-seconds-of-STFT-coverage per
second (chunks * 4.064 s / elapsed).

    python benchmarks/preproc_bench.py [--tracks 4 --seconds 90 --host_only]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phasegen_tpu.config import PreprocConfig
from phasegen_tpu.data.audio_io import write_wav
from phasegen_tpu.data.preproc import compute_feature


def make_tracks(wav_dir: str, n: int, seconds: float, sr: int) -> float:
    """Synthesize n tonal tracks; returns total audio seconds."""
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        f0 = 110.0 * (2.0 ** rng.uniform(0, 2))
        x = sum(rng.uniform(0.1, 0.5) / (k + 1)
                * np.sin(2 * np.pi * f0 * (k + 1) * t + rng.uniform(0, 6.28))
                for k in range(4))
        x = (0.8 * x / np.max(np.abs(x))).astype(np.float32)
        write_wav(os.path.join(wav_dir, f"genre_track{i}.wav"), x, sr)
    return n * seconds


def run_once(wav_dir: str, out_dir: str, device: bool) -> dict:
    cfg = PreprocConfig(genres="genre", wav_dir=wav_dir, out_dir=out_dir,
                        device_stft=device)
    t0 = time.time()
    written = compute_feature(cfg)
    elapsed = time.time() - t0
    arr = np.load(written["genre"]["audio_train"], mmap_mode="r")
    n_val = np.load(written["genre"]["audio_val"], mmap_mode="r").shape[0]
    n_clips = arr.shape[0] + n_val
    clip_s = 4.064
    return {"device_stft": device, "elapsed_s": round(elapsed, 2),
            "clips": int(n_clips),
            "stft_audio_sec_per_sec": round(n_clips * clip_s / elapsed, 1)}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tracks", type=int, default=4)
    p.add_argument("--seconds", type=float, default=90.0)
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--host_only", action="store_true",
                   help="skip the device run (e.g. no TPU available)")
    a = p.parse_args(argv)

    tmp = tempfile.mkdtemp(prefix="preproc_bench_")
    try:
        wav_dir = os.path.join(tmp, "wavs")
        os.makedirs(os.path.join(wav_dir, "genre"))  # per-genre subdir
        total = make_tracks(os.path.join(wav_dir, "genre"), a.tracks,
                            a.seconds, a.sr)
        print(f"{a.tracks} tracks, {total:.0f} audio-sec raw "
              f"(~31x STFT coverage via crop augmentation)")
        rows = [run_once(wav_dir, os.path.join(tmp, "out_host"),
                         device=False)]
        if not a.host_only:
            from phasegen_tpu.obs.watchdog import device_liveness_probe

            device_liveness_probe()
            # warm once (compile + first upload), then measure
            run_once(wav_dir, os.path.join(tmp, "out_warm"), device=True)
            rows.append(run_once(wav_dir, os.path.join(tmp, "out_dev"),
                                 device=True))
        for r in rows:
            print(json.dumps(r))
        if len(rows) == 2:
            print(f"device/host speedup: "
                  f"{rows[1]['stft_audio_sec_per_sec'] / rows[0]['stft_audio_sec_per_sec']:.2f}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
