"""TensorBoard logging with the reference Logger's exact surface.

Same API as the reference (reference: logger.py:6-46): ``log(n_iter,
report, log_type, sr, text)`` for scalar/audio/image OrderedDicts,
``write()`` exporting scalars to ``log.json``, ``flush()``, ``close()``.
Backed by tensorboardX when available; otherwise a no-op writer that
still keeps the JSON scalar export working (so headless/benchmark runs
never fail on observability).
"""

from __future__ import annotations

import json
import os

import numpy as np

LOG_TYPE = ("scalar", "audio", "image")

try:
    from tensorboardX import SummaryWriter

    _HAS_TBX = True
except Exception:  # pragma: no cover - tensorboardX is in the image
    _HAS_TBX = False


class Logger:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.writer = SummaryWriter(log_dir) if _HAS_TBX else None
        self._scalars: dict[str, list] = {}
        self._no_tb_audio = False

    def log(self, n_iter: int, report, log_type: str = "scalar",
            sr: int | None = None, text: bool = False) -> None:
        if log_type not in LOG_TYPE:
            raise ValueError(f"Wrong data type for logger: {log_type!r}")

        if log_type == "scalar":
            if text:
                self._print_scalars(n_iter, report)
            for k, v in report.items():
                tag = f"scalar/{k}"
                self._scalars.setdefault(tag, []).append(
                    [float(v), int(n_iter)])
                if self.writer:
                    self.writer.add_scalar(tag, float(v), n_iter)
        elif log_type == "audio":
            if sr is None:
                raise ValueError("Sample rate is required for audio logs.")
            for k, v in report.items():
                if self.writer and not self._no_tb_audio:
                    try:
                        self.writer.add_audio(k, np.asarray(v), n_iter,
                                              sample_rate=sr)
                        continue
                    except ModuleNotFoundError:
                        # tensorboardX's audio encoder needs soundfile,
                        # which this image lacks — fall back to plain WAVs
                        # under log_dir/audio/ instead of crashing the run
                        self._no_tb_audio = True
                        print("Logger: no soundfile module; audio logs "
                              f"go to {self.log_dir}/audio/*.wav")
                self._write_wav_fallback(k, np.asarray(v), n_iter, sr)
        elif log_type == "image":
            if self.writer:
                for k, v in report.items():
                    # HWC uint8 arrays (reference convention)
                    self.writer.add_image(k, np.asarray(v), n_iter,
                                          dataformats="HWC")

    def _write_wav_fallback(self, tag: str, wav: np.ndarray, n_iter: int,
                            sr: int) -> None:
        from phasegen_tpu.data.audio_io import write_wav

        out_dir = os.path.join(self.log_dir, "audio")
        os.makedirs(out_dir, exist_ok=True)
        safe = tag.replace("/", "_")
        try:
            write_wav(os.path.join(out_dir, f"{safe}_{n_iter}.wav"),
                      wav.astype(np.float32).squeeze(), sr)
        except ValueError as e:  # non-finite clip: log, don't kill the run
            print(f"Logger: skipped audio {tag}@{n_iter}: {e}")

    def _print_scalars(self, n_iter: int, report) -> None:
        print("---------------------------")
        print(f"n_iter : {n_iter}")
        for k, v in report.items():
            print(f"{k} : {float(v):.4f}")
        print("---------------------------")

    def write(self) -> None:
        """Export accumulated scalars to ``log.json`` (reference:
        logger.py:37-40)."""
        path = os.path.join(self.log_dir, "log.json")
        with open(path, "w") as f:
            json.dump(self._scalars, f)

    def flush(self) -> None:
        if self.writer:
            self.writer.flush()

    def close(self) -> None:
        if self.writer:
            self.writer.close()
