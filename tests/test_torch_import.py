"""Reference-checkpoint import: state_dict -> pytree mapping parity.

The oracle below is a literal nn.Module transcription of the reference's
nested UNetBlock construction (reference: model.py:22-113) at reduced
width — the only way to genuinely verify that torch's state_dict
registration order matches what phasegen_tpu/torch_ckpt.py assumes.
``nn.BatchNorm1d`` stands in for the torch-0.x-era ``BatchNorm2d``-on-3D
idiom (modern torch rejects 3-D input to BatchNorm2d; the state_dict
keys and semantics are identical — see models/norm.py docstring).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from phasegen_tpu.models import UNetConfig, unet_apply
from phasegen_tpu.torch_ckpt import import_state_dict

C, OUT = 16, 32
CFG = UNetConfig(input_nc=C, output_nc=OUT, length=128)


class _RefBlock(nn.Module):
    """Transcription of reference model.py:57-113 (BatchNorm path)."""

    def __init__(self, outer_nc, inner_nc, k, s, p, input_nc=None,
                 cat_nc=None, submodule=None, pos=None):
        super().__init__()
        self.outermost = pos == "outermost"
        input_nc = outer_nc if input_nc is None else input_nc
        cat_nc = inner_nc * 2 if cat_nc is None else cat_nc
        downconv = nn.Conv1d(input_nc, inner_nc, k, stride=s, padding=p,
                             bias=False)
        downrelu = nn.LeakyReLU(0.2, True)
        downnorm = nn.BatchNorm1d(inner_nc)
        uprelu = nn.ReLU(True)
        upnorm = nn.BatchNorm1d(outer_nc)
        if pos == "outermost":
            upconv = nn.ConvTranspose1d(cat_nc, outer_nc, k, stride=s,
                                        padding=p, bias=False)
            model = [downconv, submodule, uprelu, upconv, upnorm]
        elif pos == "innermost":
            upconv = nn.ConvTranspose1d(inner_nc, outer_nc, k + 1, stride=s,
                                        padding=p, bias=False)
            model = [downrelu, downconv, uprelu, upconv, upnorm]
        else:
            upconv = nn.ConvTranspose1d(cat_nc, outer_nc, k, stride=s,
                                        padding=p, bias=False)
            model = [downrelu, downconv, downnorm, submodule, uprelu,
                     upconv, upnorm]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        f = self.model(x)
        return f if self.outermost else torch.cat([x, f], 1)


def _build_reference_model(C, out_nc):
    # reference model.py:27-34 construction, width C
    blk = _RefBlock(C * 2, C * 4, 4, 2, 1, pos="innermost")
    blk = _RefBlock(C * 2, C * 2, 8, 2, 1, cat_nc=C * 4, submodule=blk)
    blk = _RefBlock(C * 2, C * 2, 8, 1, 2, cat_nc=C * 4, submodule=blk)
    blk = _RefBlock(out_nc, C * 2, 32, 2, 16, input_nc=C, cat_nc=C * 4,
                    pos="outermost", submodule=blk)
    return blk


def _randomize(model, seed=0):
    """Random weights AND random BN running stats, so eval-mode parity
    actually exercises the imported statistics."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.Conv1d, nn.ConvTranspose1d)):
                m.weight.normal_(0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm1d):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)


def test_import_eval_forward_parity():
    model = _build_reference_model(C, OUT)
    _randomize(model)
    model.eval()
    # state_dict of .model — exactly what the reference saves
    # (reference: model.py:45-48)
    sd = model.state_dict()
    params, norm_state = import_state_dict(sd, CFG)

    x = np.random.default_rng(11).standard_normal((2, C, 128)).astype(np.float32)
    with torch.no_grad():
        golden = model(torch.from_numpy(x)).numpy()
    ours, _ = unet_apply(params, norm_state, jnp.asarray(x), CFG,
                         training=False)
    scale = max(float(np.abs(golden).max()), 1.0)
    np.testing.assert_allclose(np.asarray(ours), golden,
                               atol=3e-4 * scale, rtol=1e-3)


def test_import_roundtrip_through_npz(tmp_path):
    # torch -> import -> save_params_npz -> load_params_npz == identity
    from phasegen_tpu.train.checkpoint import load_params_npz, save_params_npz

    model = _build_reference_model(C, OUT)
    _randomize(model, seed=3)
    params, norm_state = import_state_dict(model.state_dict(), CFG)
    path = str(tmp_path / "imported.npz")
    save_params_npz(path, params, norm_state)
    p2, n2 = load_params_npz(path, params, norm_template=norm_state)
    for a, b in zip(jnp.asarray(params["down"][0]["w"]).ravel()[:8],
                    jnp.asarray(p2["down"][0]["w"]).ravel()[:8]):
        assert float(a) == float(b)
    np.testing.assert_array_equal(np.asarray(norm_state["up"][0]["var"]),
                                  np.asarray(n2["up"][0]["var"]))


def test_import_rejects_wrong_geometry():
    model = _build_reference_model(C, OUT)
    sd = model.state_dict()
    wrong = UNetConfig(input_nc=C * 2, output_nc=OUT * 2, length=128)
    with pytest.raises(ValueError, match="expected"):
        import_state_dict(sd, wrong)


def test_import_rejects_truncated():
    model = _build_reference_model(C, OUT)
    sd = dict(model.state_dict())
    # drop the last module's tensors
    for k in [k for k in sd if k.startswith("model.4.")]:
        del sd[k]
    with pytest.raises(ValueError, match="missing"):
        import_state_dict(sd, CFG)


def test_cli_import(tmp_path):
    model = _build_reference_model(C, OUT)
    _randomize(model, seed=5)
    ckpt = str(tmp_path / "ckpt_100")
    torch.save(model.state_dict(), ckpt)

    from phasegen_tpu.cli.import_torch import main

    out = str(tmp_path / "ckpt_100.npz")
    main(["--weight", ckpt, "--out", out,
          "--input_nc", str(C), "--output_nc", str(OUT)])
    from phasegen_tpu.cli.demo import load_weights

    params, norm_state = load_weights(out, CFG, device=False)
    sd = model.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["down"][0]["w"]),
        sd["model.0.weight"].numpy(), atol=0)


def test_compat_unetmodel_surface(tmp_path):
    """compat.UNetModel: reference object surface over the functional core,
    including .load of a raw reference torch checkpoint."""
    from phasegen_tpu.compat import UNetModel

    m = UNetModel(C, OUT, gpu_ids=[0, 1])  # gpu_ids accepted, ignored
    x = np.random.default_rng(2).standard_normal((2, C, 128)).astype(np.float32)
    y = m(x)
    assert y.shape == (2, OUT, 128) and y.dtype == np.float32

    # save/load npz roundtrip preserves outputs
    p = str(tmp_path / "w.npz")
    m.save(p)
    m2 = UNetModel(C, OUT, seed=9)
    assert not np.allclose(m2(x), y)
    m2.load(p)
    np.testing.assert_allclose(m2(x), y, atol=1e-6)

    # .load of the reference's own torch ckpt format
    ref = _build_reference_model(C, OUT)
    _randomize(ref, seed=4)
    ref.eval()
    ckpt = str(tmp_path / "ckpt_42")
    torch.save(ref.state_dict(), ckpt)
    m.load(ckpt)
    with torch.no_grad():
        golden = ref(torch.from_numpy(x)).numpy()
    scale = max(float(np.abs(golden).max()), 1.0)
    np.testing.assert_allclose(m(x), golden, atol=3e-4 * scale, rtol=1e-3)

    # training-mode forward updates running stats in place
    before = np.asarray(m.norm_state["up"][0]["mean"]).copy()
    m.forward(x, training=True)
    assert not np.allclose(np.asarray(m.norm_state["up"][0]["mean"]), before)


def test_export_state_dict_strict_load_and_parity():
    """export_state_dict emits the exact reference key names: a strict
    load_state_dict into the nested torch oracle must succeed, and the
    torch forward must match ours."""
    import jax

    from phasegen_tpu.models import unet_init
    from phasegen_tpu.torch_ckpt import export_state_dict

    params, norm_state = unet_init(jax.random.PRNGKey(1), CFG)
    # make running stats non-trivial so eval parity covers them
    norm_state = {
        side: [None if s is None else
               {"mean": s["mean"] + 0.1, "var": s["var"] * 1.5}
               for s in norm_state[side]]
        for side in norm_state
    }
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_state_dict(params, norm_state, CFG).items()}

    ref = _build_reference_model(C, OUT)
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    x = np.random.default_rng(13).standard_normal((2, C, 128)).astype(np.float32)
    with torch.no_grad():
        golden = ref(torch.from_numpy(x)).numpy()
    ours, _ = unet_apply(params, norm_state, jnp.asarray(x), CFG,
                         training=False)
    scale = max(float(np.abs(golden).max()), 1.0)
    np.testing.assert_allclose(np.asarray(ours), golden,
                               atol=3e-4 * scale, rtol=1e-3)


def test_export_import_roundtrip():
    import jax

    from phasegen_tpu.torch_ckpt import export_state_dict, import_state_dict
    from phasegen_tpu.models import unet_init

    params, norm_state = unet_init(jax.random.PRNGKey(2), CFG)
    p2, n2 = import_state_dict(
        export_state_dict(params, norm_state, CFG), CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(norm_state), jax.tree.leaves(n2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_export_torch(tmp_path):
    from phasegen_tpu.compat import UNetModel
    from phasegen_tpu.cli.export_torch import main as export_main

    m = UNetModel(C, OUT, seed=12)
    npz = str(tmp_path / "w.npz")
    m.save(npz)
    out = str(tmp_path / "ckpt_torch")
    export_main(["--weight", npz, "--out", out,
                 "--input_nc", str(C), "--output_nc", str(OUT)])
    sd = torch.load(out, weights_only=True)
    ref = _build_reference_model(C, OUT)
    ref.load_state_dict(sd, strict=True)
    ref.eval()
    x = np.random.default_rng(21).standard_normal((1, C, 128)).astype(np.float32)
    with torch.no_grad():
        golden = ref(torch.from_numpy(x)).numpy()
    scale = max(float(np.abs(golden).max()), 1.0)
    np.testing.assert_allclose(m(x), golden, atol=3e-4 * scale, rtol=1e-3)


def test_compat_unetmodel_extensionless_roundtrip(tmp_path):
    """The reference's own save/load pattern: extension-less paths
    (np.savez appends .npz; load must resolve it)."""
    from phasegen_tpu.compat import UNetModel

    m = UNetModel(C, OUT, seed=3)
    x = np.random.default_rng(5).standard_normal((1, C, 128)).astype(np.float32)
    y = m(x)
    p = str(tmp_path / "ckpt_100")  # reference: train.py:127 naming
    m.save(p)
    m2 = UNetModel(C, OUT, seed=8)
    m2.load(p)
    np.testing.assert_allclose(m2(x), y, atol=1e-6)


def test_import_rejects_bias_on_biasless_architecture():
    from phasegen_tpu.torch_ckpt import import_state_dict

    model = _build_reference_model(C, OUT)
    sd = dict(model.state_dict())
    first = next(iter(sd))
    sd_biased = {}
    for k, v in sd.items():
        sd_biased[k] = v
        if k == first:  # inject a bias on the outermost down conv
            sd_biased[k.replace("weight", "bias")] = torch.zeros(2 * C)
    with pytest.raises(ValueError, match="bias"):
        import_state_dict(sd_biased, CFG)
