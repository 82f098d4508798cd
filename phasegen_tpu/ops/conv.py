"""1-D convolution primitives with torch-compatible geometry, TPU-first.

The U-Net's compute is entirely strided Conv1d / ConvTranspose1d over
(batch, channels, length) tensors with channel counts of 1024-4096 and
length <= 128 (reference: model.py:77-78, 88-102). On TPU both lower to
MXU matmuls through XLA's convolution emitter; we express them with
``lax.conv_general_dilated`` using NCH layouts and f32 accumulation so
bf16 inputs still contract at full precision on the MXU.

Geometry contracts (verified against torch.nn.functional in tests):
  conv1d:            L_out = floor((L + 2p - k) / s) + 1
  conv_transpose1d:  L_out = (L - 1) * s - 2p + k
The transpose convolution is built as the standard gradient-of-conv
construction: input dilation by ``s``, symmetric padding of ``k - 1 - p``,
and a spatially flipped, (in, out)-transposed kernel. This reproduces
torch semantics exactly, including the odd-length 14 -> 29 step of the
innermost U-Net block (reference: model.py:94).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# NCH input/output, OIH kernel: cross-correlation, same as torch.
_DIMSPEC = ("NCH", "OIH", "NCH")


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """torch-compatible Conv1d (cross-correlation).

    bf16 inputs contract on the MXU with its native f32 accumulation
    (XLA default for bf16 on TPU). An explicit f32
    ``preferred_element_type`` would be equivalent but breaks the conv
    VJP under mixed dtypes (found on-TPU), so it is deliberately absent.

    Args:
      x: (B, C_in, L)
      w: (C_out, C_in, k) — torch Conv1d weight layout.
      b: optional (C_out,)
    Returns:
      (B, C_out, L_out) in x.dtype.
    """
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=_DIMSPEC,
    )
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """torch-compatible ConvTranspose1d.

    Args:
      x: (B, C_in, L)
      w: (C_in, C_out, k) — torch ConvTranspose1d weight layout.
      b: optional (C_out,)
    Returns:
      (B, C_out, (L-1)*stride - 2*padding + k) in x.dtype.
    """
    k = w.shape[-1]
    # Gradient-of-conv construction: flip spatially, swap in/out channels.
    w_eff = jnp.flip(jnp.swapaxes(w, 0, 1), axis=-1)
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        w_eff.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMSPEC,
    )
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def conv1d_output_length(length: int, k: int, stride: int, padding: int) -> int:
    return (length + 2 * padding - k) // stride + 1


def conv_transpose1d_output_length(length: int, k: int, stride: int, padding: int) -> int:
    return (length - 1) * stride - 2 * padding + k
