"""npy shard loading with shuffled batching and device prefetch.

Replaces the reference's mmap-defeating host pipeline (reference:
data.py:7-28: precon materializes every shard in RAM, then a torch
DataLoader copies per step). Here shards stay memory-mapped on the host;
a background thread gathers shuffled batches and ``jax.device_put``s them
ahead of consumption (double buffering), so the TPU never waits on the
host. The raw real/imag -> (logmag, phase) conversion runs *on device*
inside the train step (train/step.py:ri_to_logmag_phase) instead of at
load time.

``get_spec_and_angle`` is kept as the host-side parity function
(reference: data.py:39-47) for tests and for precon=True compatibility.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Sequence

import jax
import numpy as np


def flatten_sources(data: np.ndarray) -> np.ndarray:
    """(N, n_src, 2, F, T) multi-source shards -> (N, 2, n_src*F, T).

    The reference only squeezes the source axis when n_src == 1
    (reference: preproc_mdb.py:179-180) and its training loop cannot
    consume multi-source shards; here extra sources (melody/bass stems,
    stereo channels) stack along the frequency-channel axis so the
    high-res U-Net configs train on them directly.
    """
    if data.ndim != 5:
        return np.asarray(data)
    n, n_src, two, f, t = data.shape
    return np.ascontiguousarray(
        np.swapaxes(data, 1, 2).reshape(n, two, n_src * f, t))


def get_spec_and_angle(data: np.ndarray) -> np.ndarray:
    """(N, 2, F, T) real/imag -> (N, 2, F, T) [log1p-mag, phase], host-side.

    Numerically identical to the reference's loader conversion
    (reference: data.py:39-47).
    """
    re = data[:, 0].astype(np.float32)
    im = data[:, 1].astype(np.float32)
    mag = np.log1p(np.sqrt(re * re + im * im))
    ang = np.arctan2(im, re)
    return np.stack([mag, ang], axis=1)


class NpyPatchLoader:
    """Shuffled, batched, device-prefetching loader over npy shards.

    Args:
      paths: npy files of shape (N, 2, F, T) (reference preproc layout).
      labels: optional per-path integer label (reference: data.py:16-24);
        yielded alongside the batch when given.
      batch_size: patches per batch.
      precon: convert to (logmag, phase) on host at load (reference
        ``precon=True`` semantics). Default False: raw real/imag goes to
        the device and conversion fuses into the train step.
      drop_ragged: drop the final smaller batch, like the reference's
        ``if d[0].size(0) < batch_size: continue`` (reference:
        train.py:38-39). Keeps shapes static for jit.
      prefetch: number of batches to stage on device ahead of use
        (0 disables the background thread).
      device: placement target for batches — a Device, or a
        jax.sharding.Sharding (e.g. the mesh batch sharding), in which
        case batches land directly in their final mesh placement with no
        default-device bounce. Under multi-process JAX, each process
        feeds its local shard via make_array_from_process_local_data.
    """

    def __init__(
        self,
        paths: Sequence[str] | str,
        labels: Sequence[int] | None = None,
        batch_size: int = 1,
        precon: bool = False,
        shuffle: bool = True,
        drop_ragged: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        device=None,
        native: bool = True,
    ):
        if isinstance(paths, str):
            paths = [paths]
        self.arrays = [np.load(p, mmap_mode="r") for p in paths]
        if any(a.ndim == 5 for a in self.arrays):
            # multi-source shards: stack sources along frequency channels
            self.arrays = [flatten_sources(np.asarray(a)) for a in self.arrays]
            native = False
        if precon:
            self.arrays = [get_spec_and_angle(np.asarray(a)) for a in self.arrays]
        self.labels = list(labels) if labels is not None else None
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_ragged = drop_ragged
        self.prefetch = prefetch
        self.device = device
        self._rng = np.random.default_rng(seed)
        # global index: (array_idx, row_idx)
        self._index = np.concatenate([
            np.stack([np.full(len(a), i), np.arange(len(a))], axis=1)
            for i, a in enumerate(self.arrays)
        ])
        self._offsets = np.cumsum([0] + [len(a) for a in self.arrays])

        # native C++ gather tier (mmap + worker-pool row copies); falls
        # back to numpy on any failure (non-f32 shards, no compiler, ...)
        self._native = None
        if native and not precon:
            try:
                from phasegen_tpu.data.native_loader import NativeShardGather

                # os.fspath: pathlib.Path entries have no .encode and
                # would escape the fallback as AttributeError (r3x review)
                gather = NativeShardGather([os.fspath(p) for p in paths])
                if (gather.total_rows == len(self._index)
                        and gather.row_shape == self.arrays[0].shape[1:]):
                    self._native = gather
            except (RuntimeError, OSError, IndexError):
                self._native = None

    def __len__(self) -> int:
        n = len(self._index)
        return n // self.batch_size if self.drop_ragged else -(-n // self.batch_size)

    def _place(self, a):
        """Host batch -> device(s): one placement, no re-placement later."""
        if (isinstance(self.device, jax.sharding.Sharding)
                and jax.process_count() > 1):
            # multi-host: this process holds only its shard of the batch
            return jax.make_array_from_process_local_data(self.device, a)
        return jax.device_put(a, self.device)

    def _gather(self, rows: np.ndarray) -> np.ndarray:
        if self._native is not None:
            global_rows = self._offsets[rows[:, 0]] + rows[:, 1]
            return self._native.gather(global_rows)
        parts = []
        for ai, ri in rows:
            parts.append(np.asarray(self.arrays[ai][ri]))
        return np.stack(parts).astype(np.float32)

    def _batches_host(self) -> Iterator:
        order = np.arange(len(self._index))
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        stop = len(order) - (len(order) % bs) if self.drop_ragged else len(order)
        for s in range(0, stop, bs):
            rows = self._index[order[s : s + bs]]
            batch = self._gather(rows)
            if self.labels is not None:
                lab = np.array([self.labels[ai] for ai, _ in rows], np.int32)
                yield batch, lab
            else:
                yield batch

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            for b in self._batches_host():
                yield jax.tree.map(self._place, b)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        error: list[BaseException] = []
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that notices consumer abandonment (e.g. a train
            # loop breaking at max_steps) so prefetched device batches
            # don't stay pinned in HBM for the rest of the process
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self._batches_host():
                    if not _put(jax.tree.map(self._place, b)):
                        return
            except BaseException as e:  # re-raised on the consumer side
                error.append(e)
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
        finally:
            stop.set()
            while not q.empty():  # release pinned device batches
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
        if error:
            raise error[0]
