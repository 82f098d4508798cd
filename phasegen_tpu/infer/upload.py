"""Asynchronous host→device weight upload for cold-start overlap.

The serving cold start on this class of hosts is dominated by two serial
costs: the multi-GB H2D weight transfer and the first executable
compile/restore (BASELINE.md "Streaming cold start"). ``jax.device_put``
dispatches asynchronously — it returns with the transfer in flight — so
enqueuing it BEFORE the shape-only AOT warm (infer/stream.py ``warm``)
overlaps the two:

    fut = device_put_async((params, norm_state))   # transfer starts
    stream.warm(params, norm_state)                # compile/restore
    params, norm_state = fut.result()              # join (cheap)

Design note: an earlier version issued the ``device_put`` from a worker
thread; the async dispatch makes that redundant (the calling-thread
enqueue returns with the transfer in flight), so this helper enqueues
on the caller and wraps the result in a future-shaped object for API
symmetry — simpler, and immune to any thread-affinity behavior of the
backend client. No reference counterpart — torch serving loads the
whole module synchronously before any forward (reference: demo.py:20-28).
"""

from __future__ import annotations

import jax


class _Done:
    """Future-shaped wrapper over an already-enqueued device tree."""

    __slots__ = ("_val",)

    def __init__(self, val):
        self._val = val

    def result(self, timeout=None):
        return self._val


def device_put_async(tree, device=None) -> _Done:
    """Enqueue ``jax.device_put(tree[, device])`` and return a
    future-shaped handle whose ``.result()`` is the device tree.

    The enqueue happens on the calling thread (async dispatch: the
    transfer proceeds in the background while the caller keeps running —
    e.g. AOT-compiling executables). Device-side consumers simply queue
    behind the in-flight bytes.
    """
    out = (jax.device_put(tree) if device is None
           else jax.device_put(tree, device))
    return _Done(out)
