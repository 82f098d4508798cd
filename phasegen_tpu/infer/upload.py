"""Asynchronous host→device weight upload for cold-start overlap.

The serving cold start on this class of hosts is dominated by two serial
costs: the multi-GB H2D weight transfer and the first executable
compile/restore (BASELINE.md "Streaming cold start" — ~52 s second-process
first call at 612M, upload-dominated). They use disjoint resources
(link bandwidth vs compiler CPU), so running them concurrently collapses
the cold start to max(upload, restore):

    fut = device_put_async((params, norm_state))   # transfer starts
    stream.warm(params, norm_state)                # AOT compile/restore
    params, norm_state = fut.result()              # join

``jax.device_put`` is thread-safe; the worker thread only drives the
transfer while the caller lowers/compiles from shapes (infer/stream.py
``warm``). No reference counterpart — torch serving uploads lazily per
tensor at first use (reference: demo.py:20-28 loads the whole module
synchronously before any forward).
"""

from __future__ import annotations

from concurrent.futures import Future, ThreadPoolExecutor

import jax


def device_put_async(tree, device=None) -> Future:
    """Start ``jax.device_put(tree[, device])`` on a worker thread.

    Returns a ``concurrent.futures.Future`` whose ``.result()`` is the
    device tree (upload errors re-raise there). The single-use executor
    is shut down without waiting — its non-daemon worker still finishes
    the transfer, and process exit joins it.
    """
    ex = ThreadPoolExecutor(max_workers=1,
                            thread_name_prefix="phasegen-upload")
    fut = (ex.submit(jax.device_put, tree) if device is None
           else ex.submit(jax.device_put, tree, device))
    ex.shutdown(wait=False)
    return fut
