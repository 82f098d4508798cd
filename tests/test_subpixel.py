"""Sub-pixel stride-2 transposed conv vs the dilated reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from phasegen_tpu.ops import conv_transpose1d


@pytest.mark.parametrize("cin,cout,k,p,L", [
    (8, 4, 32, 16, 65),   # outermost geometry (scaled channels)
    (16, 8, 5, 1, 14),    # innermost odd-length k+1 geometry
    (8, 8, 8, 1, 29),     # level-2 geometry
    (4, 4, 4, 1, 7),      # tiny
    (4, 4, 7, 3, 9),      # odd kernel
    (4, 4, 6, 0, 5),      # zero padding
    (4, 4, 3, 1, 4),      # small kernel, small input
])
def test_subpixel_matches_dilated(cin, cout, k, p, L):
    rng = np.random.default_rng(k * 31 + p)
    x = jnp.asarray(rng.standard_normal((2, cin, L)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cin, cout, k)) * 0.1, jnp.float32)
    fast = conv_transpose1d(x, w, stride=2, padding=p, subpixel=True)
    ref = conv_transpose1d(x, w, stride=2, padding=p, subpixel=False)
    assert fast.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_subpixel_grad_matches():
    import jax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 65)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 4, 32)) * 0.1, jnp.float32)

    def loss(sub):
        def f(x, w):
            return jnp.sum(conv_transpose1d(x, w, stride=2, padding=16,
                                            subpixel=sub) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, w)

    g_fast = loss(True)
    g_ref = loss(False)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-4)
