"""The 1-D phase-generation U-Net, as a pure functional JAX model.

Re-designed from the reference's nested ``UNetBlock`` recursion
(reference: model.py:22-113) into an explicit encoder/decoder with a
flat parameter pytree — idiomatic for jit/grad/shard_map and easy to
annotate with shardings.

Geometry is identical to the reference for the default config
(``UNetModel(1024, 2048)``, reference: train.py:15, model.py:27-34):

  stage 0 (outermost): down Conv(C -> 2C, k32, s2, p16)           [no act, no norm]
                       up   ReLU -> ConvT(4C -> out, k32,s2,p16) -> BN
  stage 1:             down LReLU(0.2) -> Conv(2C->2C, k8,s1,p2) -> BN
                       up   ReLU -> ConvT(4C -> 2C, k8,s1,p2) -> BN
  stage 2:             down LReLU -> Conv(2C->2C, k8,s2,p1) -> BN
                       up   ReLU -> ConvT(4C -> 2C, k8,s2,p1) -> BN
  stage 3 (innermost): down LReLU -> Conv(2C->4C, k4,s2,p1)        [no norm]
                       up   ReLU -> ConvT(4C -> 2C, k5,s2,p1) -> BN

Skip connections concatenate the *input* of each inner stage with its
up-path output along channels (reference: model.py:112-113), so every
non-innermost up-conv sees 4C input channels. The innermost up kernel is
k+1 to make the odd-length 14 -> 29 transpose arithmetic land (reference:
model.py:94); here up kernels are *derived* from the length chain
(k_up = L_in - (L_down - 1)*s + 2p), which reproduces that trick and
generalizes it to the deeper configs.

Length chain (default, L=128): 128 -> 65 -> 62 -> 29 -> 14 -> 29 -> 62
-> 65 -> 128. Parameter count: 612,392,960 (pinned in tests).

TPU notes: channel counts are multiples of 1024 and lengths <= 128, so
every conv lowers to large MXU GEMMs. ``compute_dtype=bfloat16`` runs
conv math in bf16 with f32 accumulation; params and BN stats stay f32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from phasegen_tpu.models.norm import batch_norm, init_norm_state, instance_norm
from phasegen_tpu.ops.conv import (
    conv1d,
    conv1d_output_length,
    conv_transpose1d,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static model configuration (hashable: usable as a jit static arg)."""

    input_nc: int = 1024      # frequency bins (channels of the 1-D conv)
    output_nc: int = 2048     # phase (first input_nc) + magnitude (rest)
    length: int = 128         # time frames per patch
    extra_depth: int = 0      # extra middle stages (high-res "deeper U-Net")
    norm: str = "batch"       # "batch" | "instance" | "none"
    init: str = "torch"       # "torch" (default torch conv init) | "dcgan"
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    remat: bool = False       # jax.checkpoint each stage (trade FLOPs
                              # for activation memory at high-res widths)

    @property
    def use_bias(self) -> bool:
        # The reference only gives convs a bias under InstanceNorm
        # (reference: model.py:65-69).
        return self.norm != "batch"


@dataclasses.dataclass(frozen=True)
class _Stage:
    c_in: int
    c_out: int        # down-conv output channels
    k: int
    s: int
    p: int
    up_c_in: int
    up_c_out: int
    up_k: int
    l_in: int
    l_out: int
    down_act: bool    # LeakyReLU before down conv
    down_norm: bool
    up_norm: bool


def stage_specs(cfg: UNetConfig) -> list[_Stage]:
    """Derive the full encoder/decoder geometry (outermost first)."""
    C = cfg.input_nc
    # (k, s, p, c_in, c_out, down_act, down_norm) outermost -> innermost
    downs = [(32, 2, 16, cfg.input_nc, 2 * C, False, False),
             (8, 1, 2, 2 * C, 2 * C, True, True),
             (8, 2, 1, 2 * C, 2 * C, True, True)]
    downs += [(8, 2, 1, 2 * C, 2 * C, True, True)] * cfg.extra_depth
    downs += [(4, 2, 1, 2 * C, 4 * C, True, False)]  # innermost

    stages = []
    L = cfg.length
    n = len(downs)
    for i, (k, s, p, ci, co, act, dnorm) in enumerate(downs):
        l_out = conv1d_output_length(L, k, s, p)
        if l_out < 1:
            raise ValueError(
                f"length {cfg.length} too short for depth {n}: stage {i} "
                f"would output {l_out} frames"
            )
        up_k = L - (l_out - 1) * s + 2 * p  # exact mirror of the down conv
        innermost = i == n - 1
        up_c_in = co if innermost else 4 * C  # skip-concat doubles channels
        up_c_out = cfg.output_nc if i == 0 else 2 * C
        stages.append(_Stage(ci, co, k, s, p, up_c_in, up_c_out, up_k,
                             L, l_out, act, dnorm, True))
        L = l_out
    return stages


def _torch_conv_init(key, shape, fan_in, dtype):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def fresh_norm_state(cfg: UNetConfig) -> dict:
    """Fresh BN running stats (mean=0, var=1) for every normed stage.

    The norm_state half of :func:`unet_init` without the param
    allocations — cheap enough for abstract-template restores (cli/demo
    falls back to this when an npz predates the BN-stats export).
    """
    use_norm = cfg.norm == "batch"
    stages = stage_specs(cfg)
    return {
        "down": [init_norm_state(st.c_out)
                 if (st.down_norm and use_norm) else None for st in stages],
        "up": [init_norm_state(st.up_c_out)
               if (st.up_norm and use_norm) else None for st in stages],
    }


def unet_init(key: jax.Array, cfg: UNetConfig) -> tuple[dict, dict]:
    """Initialize (params, norm_state) pytrees."""
    stages = stage_specs(cfg)
    params = {"down": [], "down_norm": [], "up": [], "up_norm": []}
    state = fresh_norm_state(cfg)
    use_norm = cfg.norm == "batch"

    for st in stages:
        key, kd, kdb, ku, kub, kn1, kn2 = jax.random.split(key, 7)
        # down conv: torch Conv1d layout (C_out, C_in, k), fan_in = C_in*k
        w_shape = (st.c_out, st.c_in, st.k)
        if cfg.init == "dcgan":
            wd = 0.02 * jax.random.normal(kd, w_shape, cfg.param_dtype)
        else:
            wd = _torch_conv_init(kd, w_shape, st.c_in * st.k, cfg.param_dtype)
        down = {"w": wd}
        if cfg.use_bias:
            down["b"] = _torch_conv_init(kdb, (st.c_out,), st.c_in * st.k,
                                         cfg.param_dtype)
        params["down"].append(down)

        # up conv: torch ConvTranspose1d layout (C_in, C_out, k),
        # torch fan_in for this layout = C_out * k
        wu_shape = (st.up_c_in, st.up_c_out, st.up_k)
        if cfg.init == "dcgan":
            wu = 0.02 * jax.random.normal(ku, wu_shape, cfg.param_dtype)
        else:
            wu = _torch_conv_init(ku, wu_shape, st.up_c_out * st.up_k,
                                  cfg.param_dtype)
        up = {"w": wu}
        if cfg.use_bias:
            up["b"] = _torch_conv_init(kub, (st.up_c_out,), st.up_c_out * st.up_k,
                                       cfg.param_dtype)
        params["up"].append(up)

        def norm_params(k_, nc):
            if cfg.init == "dcgan":
                scale = 1.0 + 0.02 * jax.random.normal(k_, (nc,), cfg.param_dtype)
            else:
                scale = jnp.ones((nc,), cfg.param_dtype)
            return {"scale": scale, "bias": jnp.zeros((nc,), cfg.param_dtype)}

        params["down_norm"].append(
            norm_params(kn1, st.c_out) if (st.down_norm and use_norm) else None
        )
        params["up_norm"].append(
            norm_params(kn2, st.up_c_out) if (st.up_norm and use_norm) else None
        )
    return params, state


def _apply_norm(cfg, x, norm_p, norm_s, training):
    if cfg.norm == "batch" and norm_p is not None:
        return batch_norm(x, norm_p["scale"], norm_p["bias"], norm_s, training)
    if cfg.norm == "instance":
        return instance_norm(x), norm_s
    return x, norm_s


def _default_down_conv(h, p_conv, st):
    return conv1d(h, p_conv["w"], p_conv.get("b"), stride=st.s, padding=st.p)


def _default_up_conv(h, p_conv, st):
    return conv_transpose1d(h, p_conv["w"], p_conv.get("b"), stride=st.s,
                            padding=st.p)


def unet_apply(
    params: dict,
    state: dict,
    x: jax.Array,
    cfg: UNetConfig,
    training: bool = False,
    conv_impl=None,
) -> tuple[jax.Array, dict]:
    """Forward pass.

    Args:
      x: (B, input_nc, length) log-magnitude spectrogram patch.
      conv_impl: optional (down_fn, up_fn) pair replacing the conv
        arithmetic, each ``fn(h, params_entry, stage) -> h`` — the int8
        serving path (infer/quantize.py) plugs in here so the model
        geometry is defined exactly once.
    Returns:
      (y, new_state): y is (B, output_nc, length) — phase in the first
      input_nc channels, magnitude in the rest (reference: train.py:45).
    """
    stages = stage_specs(cfg)
    n = len(stages)
    h = x.astype(cfg.compute_dtype)
    new_state = {"down": list(state["down"]), "up": list(state["up"])}
    down_conv, up_conv = conv_impl or (_default_down_conv, _default_up_conv)

    def down_stage(i, st, p_conv, p_norm, s_norm, h):
        if st.down_act:
            h = jax.nn.leaky_relu(h, 0.2)
        h = down_conv(h, p_conv, st)
        if st.down_norm:
            return _apply_norm(cfg, h, p_norm, s_norm, training)
        return h, s_norm

    def up_stage(i, st, p_conv, p_norm, s_norm, h):
        h = jax.nn.relu(h)
        h = up_conv(h, p_conv, st)
        return _apply_norm(cfg, h, p_norm, s_norm, training)

    if cfg.remat:
        down_stage = jax.checkpoint(down_stage, static_argnums=(0, 1))
        up_stage = jax.checkpoint(up_stage, static_argnums=(0, 1))

    skips = []
    for i, st in enumerate(stages):
        h, new_state["down"][i] = down_stage(
            i, st, params["down"][i], params["down_norm"][i],
            state["down"][i], h)
        if i < n - 1:
            skips.append(h)  # input to the next (inner) stage = skip source

    for i in range(n - 1, -1, -1):
        st = stages[i]
        h, new_state["up"][i] = up_stage(
            i, st, params["up"][i], params["up_norm"][i], state["up"][i], h)
        if i > 0:
            # cat([block input, upsampled], channel axis)
            # (reference: model.py:112-113)
            h = jnp.concatenate([skips[i - 1], h], axis=1)

    return h, new_state


def unet_param_count(cfg: UNetConfig) -> int:
    """Total parameter count, computed without materializing arrays."""
    shapes = jax.eval_shape(lambda k: unet_init(k, cfg)[0],
                            jax.ShapeDtypeStruct((2,), jnp.uint32))
    return sum(x.size for x in jax.tree.leaves(shapes))


@functools.partial(jax.jit, static_argnames=("cfg", "training"))
def unet_apply_jit(params, state, x, cfg: UNetConfig, training: bool = False):
    return unet_apply(params, state, x, cfg, training)
