"""benchmarks/ckpt_select.py: whole-shard checkpoint selection."""

import json

import numpy as np

import jax

from phasegen_tpu.config import DemoConfig
from phasegen_tpu.data import synth_dataset
from phasegen_tpu.train.checkpoint import save_light_checkpoint
from phasegen_tpu.train.state import create_train_state

N_FFT, HOP, T_SAMP = 32, 8, 127 * 8


def test_ckpt_select_picks_min_mse(tmp_path):
    import benchmarks.ckpt_select as sel

    model_cfg = DemoConfig(n_fft=N_FFT, hop=HOP,
                           compute_dtype="float32").model_config()
    run = tmp_path / "run"
    run.mkdir()
    # two checkpoints with different params -> different MSE columns
    for step, seed in ((100, 0), (200, 1)):
        state = create_train_state(jax.random.PRNGKey(seed), model_cfg)
        save_light_checkpoint(str(run), state, step=step)

    d = synth_dataset(5, n_fft=N_FFT, hop=HOP, t_samples=T_SAMP, seed=2)
    npy = tmp_path / "val.npy"
    np.save(npy, d)
    out = tmp_path / "select.json"
    sel.main([
        "--run", str(run), "--data", str(npy),
        "--batch_size", "2", "--n_fft", str(N_FFT), "--hop", str(HOP),
        "--gl_iters", "2", "--refine_iters", "2",
        "--compute_dtype", "float32", "--out", str(out),
    ])
    result = json.loads(out.read_text())
    rows = result["rows"]
    assert [r["step"] for r in rows] == [100, 200]
    # every clip counted, incl. the ragged tail (5 = 2+2+1)
    assert result["n_clips_each"] == 5
    for r in rows:
        for k in ("MSE", "NOPMSE", "LMSE", "MSE_refine2"):
            assert np.isfinite(r[k])
    best = min(rows, key=lambda r: r["MSE"])
    assert result["best_step"] == best["step"]
    assert result["best"] == best["ckpt"]
