"""Conv1d / ConvTranspose1d parity vs torch.nn.functional (CPU golden).

Covers every (k, stride, padding) combination the U-Net uses
(reference: model.py:27-34,94), including the odd-length innermost
14 -> 29 transpose step.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from phasegen_tpu.ops import conv1d, conv_transpose1d
from phasegen_tpu.ops.conv import (
    conv1d_output_length,
    conv_transpose1d_output_length,
)

# (C_in, C_out, k, stride, padding, L) — the U-Net's conv geometry at 1/64 width
CONV_CASES = [
    (16, 32, 32, 2, 16, 128),  # outermost down
    (32, 32, 8, 1, 2, 65),     # level 3 down
    (32, 32, 8, 2, 1, 62),     # level 2 down
    (32, 64, 4, 2, 1, 29),     # innermost down
]
# (C_in, C_out, k, stride, padding, L)
CONVT_CASES = [
    (64, 32, 5, 2, 1, 14),     # innermost up (k+1 trick, odd-length 14->29)
    (64, 32, 8, 2, 1, 29),     # level 2 up
    (64, 32, 8, 1, 2, 62),     # level 3 up
    (64, 32, 32, 2, 16, 65),   # outermost up
]


@pytest.mark.parametrize("cin,cout,k,s,p,L", CONV_CASES)
def test_conv1d_matches_torch(cin, cout, k, s, p, L):
    rng = np.random.default_rng(k * 7 + s)
    x = rng.standard_normal((2, cin, L)).astype(np.float32)
    w = (rng.standard_normal((cout, cin, k)) * 0.05).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    golden = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                      torch.from_numpy(b), stride=s, padding=p).numpy()
    ours = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=s, padding=p))
    assert ours.shape == golden.shape
    assert golden.shape[-1] == conv1d_output_length(L, k, s, p)
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("cin,cout,k,s,p,L", CONVT_CASES)
def test_conv_transpose1d_matches_torch(cin, cout, k, s, p, L):
    rng = np.random.default_rng(k * 13 + s)
    x = rng.standard_normal((2, cin, L)).astype(np.float32)
    w = (rng.standard_normal((cin, cout, k)) * 0.05).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    golden = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                                torch.from_numpy(b), stride=s, padding=p).numpy()
    ours = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                       jnp.asarray(b), stride=s, padding=p))
    assert ours.shape == golden.shape
    assert golden.shape[-1] == conv_transpose1d_output_length(L, k, s, p)
    np.testing.assert_allclose(ours, golden, atol=1e-3, rtol=1e-4)


def test_unet_length_chain():
    """Pin the encoder/decoder length chain 128->65->62->29->14->29->62->65->128."""
    L = 128
    downs = [(32, 2, 16), (8, 1, 2), (8, 2, 1), (4, 2, 1)]
    chain = [L]
    for k, s, p in downs:
        L = conv1d_output_length(L, k, s, p)
        chain.append(L)
    assert chain == [128, 65, 62, 29, 14]
    ups = [(5, 2, 1), (8, 2, 1), (8, 1, 2), (32, 2, 16)]
    for k, s, p in ups:
        L = conv_transpose1d_output_length(L, k, s, p)
        chain.append(L)
    assert chain == [128, 65, 62, 29, 14, 29, 62, 65, 128]
