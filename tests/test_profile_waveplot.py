"""Coverage for obs/profile.py and the waveplot compat path."""

import numpy as np

import jax.numpy as jnp

from phasegen_tpu import compat
from phasegen_tpu.obs.profile import timeit, trace


def test_timeit_returns_both_methodologies():
    def f(x):
        return jnp.sum(x * 2.0)

    out = timeit(f, jnp.ones((256, 256)), reps=4, warmup=1)
    assert set(out) == {"pipelined_ms", "fetch_ms"}
    assert out["pipelined_ms"] > 0 and out["fetch_ms"] > 0


def test_trace_context_writes_files(tmp_path):
    with trace(str(tmp_path)):
        jnp.sum(jnp.ones((64, 64))).block_until_ready()
    import glob

    assert glob.glob(str(tmp_path / "**" / "*"), recursive=True)


def test_generate_waveplot():
    audio = np.sin(np.linspace(0, 50, 4000)).astype(np.float32)
    img = compat.generate_waveplot(audio, sr=16000)
    assert img.ndim == 3 and img.shape[-1] == 3 and img.dtype == np.uint8
