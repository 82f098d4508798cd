"""Train state: a single pytree carrying everything a step needs.

Unlike the reference — which checkpoints only model weights and loses
optimizer/step/RNG state on a crash (reference: model.py:45-54,
train.py:126-127) — the full state here is one pytree: params, optimizer
state, batch-norm running stats, step counter, and PRNG key. The whole
thing checkpoints and restores atomically (train/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from phasegen_tpu.models.unet import UNetConfig, unet_init


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    norm_state: Any
    step: jax.Array      # int32 scalar
    rng: jax.Array       # PRNG key


def make_optimizer(lr: float = 1e-3, mu_dtype=None, schedule: str = "constant",
                   warmup_steps: int = 0,
                   decay_steps: int = 0) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters (reference: train.py:26-27):
    lr=1e-3, torch defaults betas=(0.9, 0.999), eps=1e-8.

    mu_dtype: dtype of the first moment (e.g. jnp.bfloat16 halves the
    optimizer's HBM traffic for the 612M model; the scale-sensitive
    second moment stays f32). None = f32, exact reference parity.
    schedule: "constant" (reference parity) or "cosine" (with optional
    linear warmup over ``warmup_steps``, decaying over ``decay_steps``).
    """
    if schedule == "cosine":
        if decay_steps <= 0:
            raise ValueError("cosine schedule needs decay_steps > 0")
        lr_fn = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=decay_steps,
        )
    elif schedule == "constant":
        lr_fn = lr
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    return optax.adam(lr_fn, b1=0.9, b2=0.999, eps=1e-8, mu_dtype=mu_dtype)


def create_train_state(
    key: jax.Array,
    cfg: UNetConfig,
    optimizer: optax.GradientTransformation | None = None,
) -> TrainState:
    if optimizer is None:
        optimizer = make_optimizer()
    init_key, rng = jax.random.split(key)
    params, norm_state = unet_init(init_key, cfg)
    opt_state = optimizer.init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        norm_state=norm_state,
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
