"""Data-parallel (+ optional tensor-parallel) train step over a mesh.

GSPMD-style: the same pure train step as train/step.py, jitted with
explicit in/out shardings. The batch is split over the 'data' axis; conv
weights over the 'model' axis; XLA inserts the per-step gradient
all-reduce over ICI (the TPU-native replacement for the reference's
DataParallel scatter/gather, reference: model.py:40-41).

BatchNorm note: batch statistics are computed *globally* — the mean/var
reductions over (B, L) become cross-replica collectives under GSPMD —
which is mathematically the single-chip semantics, strictly better than
torch DataParallel's per-shard BN stats.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh

from phasegen_tpu.models.unet import UNetConfig
from phasegen_tpu.parallel.mesh import batch_sharding, state_shardings
from phasegen_tpu.train.state import TrainState
from phasegen_tpu.train.step import loss_fn, ri_to_logmag_phase


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState onto the mesh according to the sharding rules."""
    shardings = state_shardings(mesh, state)
    return jax.tree.map(jax.device_put, state, shardings)


def build_dp_train_step(
    cfg: UNetConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    state_template: TrainState,
    mag_weight: float = 0.2,
    raw_ri: bool = True,
    batch_ndim: int = 4,
    ang_weighting: str = "none",
    wav_weight: float = 0.0,
    sc_weight: float = 0.0,
    n_fft: int = 2048,
    hop: int = 512,
    ang_weight: float = 1.0,
):
    """Returns jitted fn(state, batch) -> (state, metrics), SPMD over mesh.

    ``state_template`` provides the pytree structure for sharding
    annotations (abstract values are fine).
    """
    st_shard = state_shardings(mesh, state_template)
    b_shard = batch_sharding(mesh, batch_ndim)

    def step(state: TrainState, batch):
        if raw_ri:
            logmag, phase = ri_to_logmag_phase(batch)
        else:
            logmag, phase = batch
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_norm_state)), grads = grad_fn(
            state.params, state.norm_state, logmag, phase, cfg, mag_weight,
            True, ang_weighting, wav_weight, n_fft, hop, ang_weight,
            sc_weight)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt_state, new_norm_state,
                               state.step + 1, state.rng)
        return new_state, metrics

    return jax.jit(
        step,
        in_shardings=(st_shard, b_shard),
        out_shardings=(st_shard, None),
        donate_argnums=(0,),
    )
