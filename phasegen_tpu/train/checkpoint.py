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
_LIGHT_RE = re.compile(r"^ckpt_(\d+)_light\.npz$")
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


def save_light_checkpoint(ckpt_dir: str, state: TrainState,
                          step: int | None = None) -> str:
    """Weights-only periodic save: params + BN stats as bf16 npz
    (``ckpt_{step}_light.npz``) — ~6x fewer D2H bytes than the full
    orbax state (no f32 params, no Adam moments), for environments where
    checkpoint time is transfer-bound. Resume from it restores weights
    and the step counter; the optimizer restarts fresh.
    """
    if step is None:
        step = int(jax.device_get(state.step))
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{step}_light.npz"))
    tmp = path + ".tmp.npz"
    save_params_npz(tmp, state.params, state.norm_state, dtype="bfloat16")
    os.replace(tmp, path)  # atomic, like the orbax saves
    return path


def save_light_checkpoint_async(ckpt_dir: str, state: TrainState,
                                step: int | None = None):
    """D2H fetch on the caller (bf16-cast on device first), write off
    the step path. Returns a Future of the checkpoint path."""
    if step is None:
        step = int(jax.device_get(state.step))
    import jax.numpy as jnp

    host = jax.device_get(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x,
        (state.params, state.norm_state)))
    host_state = TrainState(host[0], None, host[1], state.step, state.rng)
    return _SAVE_POOL.submit(save_light_checkpoint, ckpt_dir, host_state,
                             step)


def latest_checkpoint(ckpt_dir: str, include_light: bool = False):
    """Newest checkpoint path; with include_light, light npz saves compete
    by step (ties go to the full checkpoint)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step, best_light = None, -1, False
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        light = False
        if not m and include_light:
            m = _LIGHT_RE.match(name)
            light = True
        if not m:
            continue
        s = int(m.group(1))
        if s > best_step or (s == best_step and best_light and not light):
            best, best_step, best_light = name, s, light
    return os.path.join(ckpt_dir, best) if best else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of ``template`` (shapes/dtypes checked).

    The target is built from shapes/dtypes alone — no ``device_get`` of
    the live template (that fetched the full ~7.35 GB state D2H on every
    resume, ~15 min on this tunnel, to read two attributes per leaf).
    Restored leaves are host numpy arrays; the caller places them.
    """
    with ocp.PyTreeCheckpointer() as ckptr:
        target = jax.tree.map(
            lambda x: (jax.ShapeDtypeStruct(x.shape, x.dtype)
                       if hasattr(x, "shape") else x),
            template,
        )
        restored = ckptr.restore(os.path.abspath(path), item=target)
    return TrainState(*restored) if not isinstance(restored, TrainState) else restored


def restore_weights(path: str):
    """Restore only (params, norm_state) from a full checkpoint.

    Inference loaders must not need to reconstruct the training run's
    optimizer: a full TrainState restore requires a structurally
    identical opt_state template (Adam vs Adam+schedule differ), which
    broke demo/evaluate on schedule-trained checkpoints. The raw orbax
    tree is field-keyed, so the weight subtrees restore standalone.
    """
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    return raw["params"], raw["norm_state"]


def restore_latest(ckpt_dir: str, template: TrainState,
                   include_light: bool = True) -> TrainState | None:
    """Restore the newest checkpoint. A light (weights-only) checkpoint
    restores params/BN stats/step; the optimizer state restarts fresh
    (still strictly better than the reference, which restores nothing)."""
    path = latest_checkpoint(ckpt_dir, include_light=include_light)
    if path is None:
        return None
    if path.endswith("_light.npz"):
        import jax.numpy as jnp

        step = int(_LIGHT_RE.match(os.path.basename(path)).group(1))
        params, norm_state = load_params_npz(path, template.params,
                                             norm_template=template.norm_state)
        print(f"Resuming weights from light checkpoint {path}; "
              f"optimizer moments restart fresh")
        # Fast-forward the step counters of the fresh optimizer state so
        # an LR schedule resumes at the restored step instead of replaying
        # warmup/decay from 0. Moments restart at zero; with count=step
        # the bias correction is ~mature, i.e. plain fresh moments.
        # Only the `count` field of the optax states we build
        # (train/state.py: scale_by_adam / scale_by_schedule) is rewritten
        # — a blanket "every scalar int leaf" rewrite would clobber e.g.
        # optax.MultiSteps' mini-step counter if the optimizer ever grows.
        import optax

        def _ffwd(node):
            if isinstance(node, (optax.ScaleByAdamState,
                                 optax.ScaleByScheduleState)):
                return node._replace(
                    count=jnp.asarray(step, node.count.dtype))
            return node

        opt_state = jax.tree.map(
            _ffwd, template.opt_state,
            is_leaf=lambda n: isinstance(n, (optax.ScaleByAdamState,
                                             optax.ScaleByScheduleState)))
        return TrainState(
            params=params,
            opt_state=opt_state,
            norm_state=(norm_state if norm_state is not None
                        else template.norm_state),
            step=jnp.asarray(step, jnp.int32),
            rng=template.rng,
        )
    return restore_checkpoint(path, template)


def save_params_npz(path: str, params, norm_state=None,
                    dtype: str = "float32") -> None:
    """Lightweight weights-only export (flat npz) for demo/inference use.

    Pass ``norm_state`` to include the BatchNorm running statistics —
    eval-mode inference is wrong without them.

    ``dtype="bfloat16"`` casts weights on-device before the fetch —
    halving D2H bytes, which dominates save time on slow links (this
    tunnel moves ~8 MB/s; a real TPU host does the same save in seconds).
    numpy's npz format cannot store bf16, so bf16 leaves are written as
    uint16 bit patterns under a ``__bf16__`` key prefix and viewed back
    on load.
    """
    import jax.numpy as jnp

    def fetch(prefix, tree):
        out = {}
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for k, v in flat:
            key = prefix + jax.tree_util.keystr(k)
            if dtype == "bfloat16" and getattr(v, "dtype", None) == jnp.float32:
                v = v.astype(jnp.bfloat16)
            host = np.asarray(jax.device_get(v))
            if host.dtype == jnp.bfloat16:  # ml_dtypes.bfloat16 on host
                out["__bf16__" + key] = host.view(np.uint16)
            else:
                out[key] = host
        return out

    arrays = fetch("", params)
    if norm_state is not None:
        arrays.update(fetch("__norm__", norm_state))
    np.savez(path, **arrays)


def load_params_npz(path: str, template, norm_template=None,
                    keep_bf16_for=None):
    """Load a weights-only npz back into ``template``'s structure.

    With ``norm_template`` given, returns (params, norm_state_or_None) —
    norm_state is None when the file predates the BN-stats export.

    ``keep_bf16_for(keystr) -> bool`` opts leaves OUT of the host f32
    round-trip: a bf16-stored leaf whose template dtype is f32 is
    returned as a zero-copy bf16 view instead of bf16→f32(→caller's
    bf16) conversions. Value-identical for any consumer that computes
    in bf16 anyway (serving), and saves ~2/3 of the host load time of a
    612M light checkpoint on this single-core host (~15 s measured).
    """
    data = np.load(path)

    def fill(tmpl, prefix=""):
        import ml_dtypes

        flat, treedef = jax.tree_util.tree_flatten_with_path(tmpl)
        leaves = []
        for k, v in flat:
            key = prefix + jax.tree_util.keystr(k)
            if "__bf16__" + key in data.files:
                arr = data["__bf16__" + key].view(ml_dtypes.bfloat16)
                if not (keep_bf16_for is not None and keep_bf16_for(key)
                        and getattr(v, "dtype", None) == np.float32):
                    arr = arr.astype(np.float32)
            else:
                arr = data[key]
            if hasattr(v, "shape") and tuple(arr.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch for {jax.tree_util.keystr(k)}: "
                    f"{arr.shape} vs {v.shape}")
            if hasattr(v, "dtype") and arr.dtype != ml_dtypes.bfloat16:
                arr = arr.astype(v.dtype, copy=False)
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = fill(template)
    if norm_template is None:
        return params
    has_norm = any(k.startswith(("__norm__", "__bf16____norm__"))
                   for k in data.files)
    norm_state = fill(norm_template, "__norm__") if has_norm else None
    return params, norm_state
