"""Full train-state checkpointing with resume.

The reference checkpoints model weights only, via a CPU round-trip, and
never resumes — a crash loses optimizer state and the step counter
(reference: model.py:45-54, train.py:126-127). Here the entire
``TrainState`` pytree (params, Adam moments, BN running stats, step, PRNG
key) saves atomically through orbax and restores on launch
(restart-from-latest).
"""

from __future__ import annotations

import concurrent.futures
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from phasegen_tpu.train.state import TrainState

_STEP_RE = re.compile(r"^ckpt_(\d+)$")
_SAVE_POOL = concurrent.futures.ThreadPoolExecutor(
    max_workers=1, thread_name_prefix="ckpt-save")


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int | None = None) -> str:
    """Save ``state`` under ``ckpt_dir/ckpt_{step}`` (reference naming
    parity: train.py:127). Returns the checkpoint path."""
    if step is None:
        step = int(jax.device_get(state.step))
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{step}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def save_checkpoint_async(ckpt_dir: str, state: TrainState,
                          step: int | None = None):
    """Fetch the state to host synchronously (cheap next to the write),
    then serialize off the step path. Returns a Future of the ckpt path.

    The reference's save blocks training on a device->CPU round-trip plus
    the disk write (reference: model.py:45-48); here only the D2H copy is
    on the critical path.
    """
    if step is None:
        step = int(jax.device_get(state.step))
    host_state = jax.device_get(state)
    return _SAVE_POOL.submit(save_checkpoint, ckpt_dir, host_state, step)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best, best_step = name, int(m.group(1))
    return os.path.join(ckpt_dir, best) if best else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (shapes/dtypes checked)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        target = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape") else x,
            jax.device_get(template),
        )
        restored = ckptr.restore(os.path.abspath(path), item=target)
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored


def restore_latest(ckpt_dir: str, template: TrainState) -> TrainState | None:
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return None
    return restore_checkpoint(path, template)


def save_params_npz(path: str, params, norm_state=None) -> None:
    """Lightweight weights-only export (flat npz) for demo/inference use.

    Pass ``norm_state`` to include the BatchNorm running statistics —
    eval-mode inference is wrong without them.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(k): np.asarray(jax.device_get(v))
              for k, v in flat}
    if norm_state is not None:
        flat_ns, _ = jax.tree_util.tree_flatten_with_path(norm_state)
        for k, v in flat_ns:
            arrays["__norm__" + jax.tree_util.keystr(k)] = np.asarray(
                jax.device_get(v))
    np.savez(path, **arrays)


def load_params_npz(path: str, template, norm_template=None):
    """Load a weights-only npz back into ``template``'s structure.

    With ``norm_template`` given, returns (params, norm_state_or_None) —
    norm_state is None when the file predates the BN-stats export.
    """
    data = np.load(path)

    def fill(tmpl, prefix=""):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
        leaves = []
        for k, v in flat:
            arr = data[prefix + jax.tree_util.keystr(k)]
            if hasattr(v, "shape") and tuple(arr.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch for {jax.tree_util.keystr(k)}: "
                    f"{arr.shape} vs {v.shape}")
            leaves.append(arr.astype(v.dtype) if hasattr(v, "dtype") else arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = fill(template)
    if norm_template is None:
        return params
    has_norm = any(k.startswith("__norm__") for k in data.files)
    norm_state = fill(norm_template, "__norm__") if has_norm else None
    return params, norm_state
