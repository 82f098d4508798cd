"""On-hardware checks (skipped on the CPU test backend).

Run manually with a real TPU:  python -m pytest tests/test_tpu_only.py -q
(without the conftest CPU forcing — e.g. pytest -p no:cacheprovider with
a modified conftest, or run the module directly).

These mirror the manual verification drives recorded in BASELINE.md.
"""

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend")


@requires_tpu
@pytest.mark.tpu
def test_pallas_analysis_matches_xla_on_tpu():
    import jax.numpy as jnp

    from phasegen_tpu.ops.dft import logmag_phase_ri, stft_ri
    from phasegen_tpu.ops.pallas.stft_fused import stft_logmag_phase_pallas
    from phasegen_tpu.ops.stft import drop_dc

    x = jnp.asarray((np.random.default_rng(0).standard_normal((2, 65024))
                     * 0.1).astype(np.float32))
    lm_p, ph_p = map(np.array, stft_logmag_phase_pallas(x))
    re, im = stft_ri(x)
    lm_g, ph_g = logmag_phase_ri(drop_dc(re), drop_dc(im))
    lm_g, ph_g = np.array(lm_g), np.array(ph_g)
    assert np.abs(lm_p - lm_g).max() < 1e-3
    mask = np.expm1(lm_g) > 1e-2
    dphi = np.angle(np.exp(1j * (ph_p - ph_g)))
    assert np.abs(dphi[mask]).max() < 1e-3


@requires_tpu
@pytest.mark.tpu
def test_fused_infer_runs_on_tpu():
    import jax.numpy as jnp

    from phasegen_tpu.infer.pipeline import build_infer_fn
    from phasegen_tpu.models import UNetConfig, unet_init

    cfg = UNetConfig(input_nc=1024, output_nc=2048, length=128,
                     compute_dtype=jnp.bfloat16)
    params, state = unet_init(jax.random.PRNGKey(0), cfg)
    infer = build_infer_fn(cfg)
    t = np.arange(65024) / 16000.0
    wav = jnp.asarray(np.sin(2 * np.pi * 440 * t,
                             dtype=np.float32)[None])
    out, _ = infer(params, state, wav)
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5
