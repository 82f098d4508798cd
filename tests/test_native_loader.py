"""Native C++ shard loader: build, parse, gather parity, loader integration."""

import numpy as np
import pytest

from phasegen_tpu.data import NpyPatchLoader
from phasegen_tpu.data.native_loader import NativeShardGather, build_native


@pytest.fixture(scope="module")
def lib_path():
    path = build_native()
    if path is None:
        pytest.skip("g++ unavailable")
    return path


def _shard(tmp_path, name, n, shape=(2, 16, 8), seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.standard_normal((n, *shape)).astype(np.float32)
    p = tmp_path / name
    np.save(p, arr)
    return str(p), arr


def test_gather_matches_numpy(lib_path, tmp_path):
    p1, a1 = _shard(tmp_path, "a.npy", 7, seed=1)
    p2, a2 = _shard(tmp_path, "b.npy", 5, seed=2)
    g = NativeShardGather([p1, p2])
    assert g.total_rows == 12
    assert g.row_shape == (2, 16, 8)
    ref = np.concatenate([a1, a2])
    rows = np.array([0, 6, 7, 11, 3, 7], np.int64)
    np.testing.assert_array_equal(g.gather(rows), ref[rows])
    g.close()


def test_gather_large_batch_threads(lib_path, tmp_path):
    p, a = _shard(tmp_path, "c.npy", 256, shape=(2, 32, 16), seed=3)
    g = NativeShardGather([p], n_threads=8)
    rows = np.random.default_rng(0).permutation(256).astype(np.int64)
    np.testing.assert_array_equal(g.gather(rows), a[rows])
    g.close()


def test_gather_bounds_check(lib_path, tmp_path):
    p, _ = _shard(tmp_path, "d.npy", 4)
    g = NativeShardGather([p])
    with pytest.raises(IndexError):
        g.gather(np.array([4], np.int64))
    g.close()


def test_rejects_non_f32(lib_path, tmp_path):
    p = tmp_path / "f64.npy"
    np.save(p, np.zeros((3, 2), np.float64))
    with pytest.raises(RuntimeError, match="f4"):
        NativeShardGather([str(p)])


def test_loader_uses_native_and_matches_python(lib_path, tmp_path):
    p, a = _shard(tmp_path, "e.npy", 10, seed=5)
    nat = NpyPatchLoader([p], batch_size=4, seed=7, prefetch=0, native=True)
    pyl = NpyPatchLoader([p], batch_size=4, seed=7, prefetch=0, native=False)
    assert nat._native is not None
    assert pyl._native is None
    for b_nat, b_py in zip(nat, pyl):
        np.testing.assert_array_equal(np.asarray(b_nat), np.asarray(b_py))
