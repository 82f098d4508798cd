"""U-Net geometry, parameter-count, and full forward parity vs a torch oracle.

The torch oracle below is an independent, literal transcription of the
reference architecture (reference: model.py:27-34,85-113) using
torch.nn.functional ops — NOT built from this package's stage specs — so
it cross-checks both the geometry derivation and the forward wiring.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from phasegen_tpu.models import UNetConfig, unet_apply, unet_init, unet_param_count
from phasegen_tpu.models.norm import batch_norm, init_norm_state
from phasegen_tpu.models.unet import stage_specs

CFG_SMALL = UNetConfig(input_nc=16, output_nc=32, length=128)
CFG_FULL = UNetConfig(input_nc=1024, output_nc=2048, length=128)


def test_param_count_pin():
    # The reference UNetModel(1024, 2048): 612,368,384 conv weights + 6
    # BatchNorms (down-norms at stages 1-2, up-norms at all 4 stages,
    # reference: model.py:85-105) * 2*2048 affine = 612,392,960 exactly.
    assert unet_param_count(CFG_FULL) == 612_392_960


def test_length_chain():
    chain = [s.l_in for s in stage_specs(CFG_FULL)] + [stage_specs(CFG_FULL)[-1].l_out]
    assert chain == [128, 65, 62, 29, 14]


def test_up_kernels_derived():
    ks = [s.up_k for s in stage_specs(CFG_FULL)]
    # outermost..innermost: 32, 8, 8, 5 — the innermost is the reference's
    # k+1 trick (reference: model.py:94), derived here instead of hardcoded.
    assert ks == [32, 8, 8, 5]


def test_forward_shape_and_state():
    params, state = unet_init(jax.random.PRNGKey(0), CFG_SMALL)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 128)),
                    jnp.float32)
    y, new_state = unet_apply(params, state, x, CFG_SMALL, training=True)
    assert y.shape == (2, 32, 128)
    # training mode must update running stats
    old = np.asarray(state["up"][0]["mean"])
    new = np.asarray(new_state["up"][0]["mean"])
    assert not np.allclose(old, new)
    # eval mode must not
    _, same_state = unet_apply(params, state, x, CFG_SMALL, training=False)
    np.testing.assert_array_equal(np.asarray(same_state["up"][0]["mean"]), old)


def test_extra_depth_geometry():
    cfg = UNetConfig(input_nc=8, output_nc=16, length=128, extra_depth=1)
    stages = stage_specs(cfg)
    assert len(stages) == 5
    params, state = unet_init(jax.random.PRNGKey(1), cfg)
    x = jnp.zeros((1, 8, 128))
    y, _ = unet_apply(params, state, x, cfg, training=False)
    assert y.shape == (1, 16, 128)


def test_batch_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 8, 32)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    state = init_norm_state(8)

    # torch training-mode BN with running-stat update
    tm = torch.zeros(8)
    tv = torch.ones(8)
    golden = F.batch_norm(torch.from_numpy(x), tm, tv,
                          torch.from_numpy(scale), torch.from_numpy(bias),
                          training=True, momentum=0.1, eps=1e-5).numpy()
    y, new_state = batch_norm(jnp.asarray(x), jnp.asarray(scale),
                              jnp.asarray(bias), state, training=True)
    np.testing.assert_allclose(np.asarray(y), golden, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]), tm.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]), tv.numpy(), atol=1e-4)


class _TorchOracle:
    """Literal reference architecture at reduced width (C = input_nc)."""

    def __init__(self, params, C, out_nc):
        def t(a):
            return torch.from_numpy(np.asarray(a).copy())

        self.dw = [t(p["w"]) for p in params["down"]]
        self.uw = [t(p["w"]) for p in params["up"]]
        self.dn = [None if p is None else (t(p["scale"]), t(p["bias"]))
                   for p in params["down_norm"]]
        self.un = [(t(p["scale"]), t(p["bias"])) for p in params["up_norm"]]
        self.C, self.out_nc = C, out_nc

    def bn(self, x, sb, training):
        scale, bias = sb
        return F.batch_norm(x, torch.zeros(x.shape[1]), torch.ones(x.shape[1]),
                            scale, bias, training=training, eps=1e-5)

    def __call__(self, x, training=False):
        lr = lambda v: F.leaky_relu(v, 0.2)
        # encoder (reference: model.py:85-105 down paths)
        d0 = F.conv1d(x, self.dw[0], stride=2, padding=16)
        d1 = self.bn(F.conv1d(lr(d0), self.dw[1], stride=1, padding=2),
                     self.dn[1], training)
        d2 = self.bn(F.conv1d(lr(d1), self.dw[2], stride=2, padding=1),
                     self.dn[2], training)
        d3 = F.conv1d(lr(d2), self.dw[3], stride=2, padding=1)
        # decoder with skip concats (reference: model.py:109-113)
        u3 = self.bn(F.conv_transpose1d(F.relu(d3), self.uw[3], stride=2,
                                        padding=1), self.un[3], training)
        c3 = torch.cat([d2, u3], 1)
        u2 = self.bn(F.conv_transpose1d(F.relu(c3), self.uw[2], stride=2,
                                        padding=1), self.un[2], training)
        c2 = torch.cat([d1, u2], 1)
        u1 = self.bn(F.conv_transpose1d(F.relu(c2), self.uw[1], stride=1,
                                        padding=2), self.un[1], training)
        c1 = torch.cat([d0, u1], 1)
        out = self.bn(F.conv_transpose1d(F.relu(c1), self.uw[0], stride=2,
                                         padding=16), self.un[0], training)
        return out


def test_full_forward_matches_torch_oracle():
    params, state = unet_init(jax.random.PRNGKey(42), CFG_SMALL)
    oracle = _TorchOracle(params, 16, 32)
    x = np.random.default_rng(7).standard_normal((2, 16, 128)).astype(np.float32)

    for training in (False, True):
        golden = oracle(torch.from_numpy(x), training=training).detach().numpy()
        ours, _ = unet_apply(params, state, jnp.asarray(x), CFG_SMALL,
                             training=training)
        scale = np.abs(golden).max()
        np.testing.assert_allclose(np.asarray(ours), golden,
                                   atol=3e-4 * max(scale, 1.0), rtol=1e-3)


def test_grad_flows_through_model():
    params, state = unet_init(jax.random.PRNGKey(5), CFG_SMALL)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((2, 16, 128)),
                    jnp.float32)

    def loss(p):
        y, _ = unet_apply(p, state, x, CFG_SMALL, training=True)
        return jnp.mean(y * y)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_bf16_compute_path():
    cfg = UNetConfig(input_nc=16, output_nc=32, length=128,
                     compute_dtype=jnp.bfloat16)
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1, 16, 128), jnp.float32)
    y, ns = unet_apply(params, state, x, cfg, training=True)
    assert y.dtype == jnp.bfloat16
    # BN stats must remain f32
    assert ns["up"][0]["mean"].dtype == jnp.float32
