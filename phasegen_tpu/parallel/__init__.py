from phasegen_tpu.parallel.mesh import make_mesh, batch_sharding, state_shardings
from phasegen_tpu.parallel.dp import build_dp_train_step, shard_train_state

__all__ = [
    "make_mesh",
    "batch_sharding",
    "state_shardings",
    "build_dp_train_step",
    "shard_train_state",
]
