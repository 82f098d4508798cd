"""Loader prefetch error propagation."""

import numpy as np
import pytest

from phasegen_tpu.data import NpyPatchLoader
from phasegen_tpu.data.synth import synth_dataset


def test_prefetch_propagates_producer_errors(tmp_path, monkeypatch):
    d = synth_dataset(4, n_fft=32, hop=8, t_samples=127 * 8)
    p = tmp_path / "s.npy"
    np.save(p, d)
    loader = NpyPatchLoader([str(p)], batch_size=2, prefetch=2, native=False)

    def boom(rows):
        raise OSError("disk on fire")

    monkeypatch.setattr(loader, "_gather", boom)
    with pytest.raises(OSError, match="disk on fire"):
        list(loader)


def test_prefetch_zero_propagates_directly(tmp_path, monkeypatch):
    d = synth_dataset(4, n_fft=32, hop=8, t_samples=127 * 8)
    p = tmp_path / "s.npy"
    np.save(p, d)
    loader = NpyPatchLoader([str(p)], batch_size=2, prefetch=0, native=False)
    monkeypatch.setattr(loader, "_gather",
                        lambda rows: (_ for _ in ()).throw(OSError("x")))
    with pytest.raises(OSError):
        list(loader)
