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
    subpixel: bool = False,
) -> jax.Array:
    """torch-compatible ConvTranspose1d.

    ``subpixel=True`` decomposes a stride-2 transposed conv into two
    dense stride-1 convs on parity-split kernels (no zero-dilation MAC
    waste). Controlled A/B on the v5e showed XLA's dilated lowering is
    already as fast or faster at production batch sizes (fused infer
    B=128: 92 ms dilated vs 105 ms sub-pixel), so the dilated path stays
    the default; the decomposition is kept (parity-tested vs torch and
    vs the dilated path, grads included) for future geometries where
    dilation does hurt.

    Args:
      x: (B, C_in, L)
      w: (C_in, C_out, k) — torch ConvTranspose1d weight layout.
      b: optional (C_out,)
    Returns:
      (B, C_out, (L-1)*stride - 2*padding + k) in x.dtype.
    """
    k = w.shape[-1]
    # Gradient-of-conv construction: flip spatially, swap in/out channels.
    w_eff = jnp.flip(jnp.swapaxes(w, 0, 1), axis=-1).astype(x.dtype)
    if stride == 2 and subpixel:
        y = _conv_transpose1d_stride2(x, w_eff, k, padding)
    else:
        pad = k - 1 - padding
        y = lax.conv_general_dilated(
            x,
            w_eff,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(stride,),
            dimension_numbers=_DIMSPEC,
        )
    if b is not None:
        y = y + b.astype(y.dtype)[None, :, None]
    return y


def _conv_transpose1d_stride2(x: jax.Array, w_eff: jax.Array, k: int,
                              padding: int) -> jax.Array:
    """Sub-pixel stride-2 transposed conv.

    With q = k-1-padding, the dilated formulation gives
      y[j] = sum_m w_eff[m] * x[(j+m-q)/2]   over m with (j+m-q) even,
    so each output parity P uses the kernel taps w_eff[(q-P)%2::2] as a
    dense stride-1 correlation of x at offset (P + r - q)/2. The two
    parity streams interleave back to y.
    """
    bsz, _, L = x.shape
    c_out = w_eff.shape[0]
    l_out = (L - 1) * 2 - 2 * padding + k
    q = k - 1 - padding

    streams = []
    for P in (0, 1):
        n_out = (l_out - P + 1) // 2
        if n_out <= 0:
            streams.append(jnp.zeros((bsz, c_out, 0), x.dtype))
            continue
        r = (q - P) % 2
        sub = w_eff[:, :, r::2]
        ks = sub.shape[-1]
        off = (P + r - q) // 2  # x index of the first tap for n = 0
        lo_pad = -off
        hi_pad = (n_out - 1) + off + ks - 1 - (L - 1)
        y = lax.conv_general_dilated(
            x, sub, window_strides=(1,), padding=[(lo_pad, hi_pad)],
            dimension_numbers=_DIMSPEC,
        )
        streams.append(y)

    n0 = streams[0].shape[-1]
    n1 = streams[1].shape[-1]
    if n1 < n0:  # odd l_out: pad the odd stream for a clean interleave
        streams[1] = jnp.pad(streams[1], ((0, 0), (0, 0), (0, n0 - n1)))
    y = jnp.stack(streams, axis=-1).reshape(bsz, c_out, 2 * n0)
    return y[..., :l_out]


def conv1d_output_length(length: int, k: int, stride: int, padding: int) -> int:
    return (length + 2 * padding - k) // stride + 1


def conv_transpose1d_output_length(length: int, k: int, stride: int, padding: int) -> int:
    return (length - 1) * stride - 2 * padding + k
