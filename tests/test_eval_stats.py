"""Per-clip metrics + paired-bootstrap statistics (cli/evaluate --stats).

The headline quality claims are means over a shard; these tests cover the
machinery that turns them into statistics-grade numbers: per-clip metric
vectors from the validate graph (train/validate.py per_clip=True), the
seeded paired bootstrap (cli/evaluate.bootstrap_stats), and the CLI
surface (--stats / --per_clip) end to end on tiny geometry.
"""

import json

import numpy as np
import pytest

import jax

from phasegen_tpu.cli.evaluate import bootstrap_stats
from phasegen_tpu.data.synth import synth_dataset
from phasegen_tpu.models import UNetConfig
from phasegen_tpu.train import create_train_state
from phasegen_tpu.train.validate import build_validate_fn

N_FFT, HOP = 32, 8
T_SLICE = 127 * HOP


def test_per_clip_vectors_match_scalar_means():
    cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    batch = synth_dataset(4, n_fft=N_FFT, hop=HOP, t_samples=T_SLICE)
    fn = build_validate_fn(cfg, N_FFT, HOP, gl_iters=2, refine_iters=(1,),
                           phase_err=False, per_clip=True)
    out = fn(state.params, state.norm_state, np.asarray(batch),
             jax.random.PRNGKey(1))
    pairs = [("MSE", "MSE_pc"), ("NOPMSE", "NOPMSE_pc"),
             ("LMSE", "LMSE_pc"), ("MSE_refine1", "MSE_refine1_pc"),
             ("si_sdr_hybrid_db", "si_sdr_hybrid_pc"),
             ("si_sdr_gl_db", "si_sdr_gl_pc"),
             ("sc_hybrid", "sc_hybrid_pc"), ("sc_gl", "sc_gl_pc")]
    for scalar_k, pc_k in pairs:
        vec = np.asarray(out[pc_k])
        assert vec.shape == (4,), pc_k
        assert np.isfinite(vec).all(), pc_k
        np.testing.assert_allclose(vec.mean(), float(out[scalar_k]),
                                   rtol=2e-5, err_msg=pc_k)


def test_per_clip_off_by_default():
    cfg = UNetConfig(input_nc=16, output_nc=32, length=128)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    batch = synth_dataset(2, n_fft=N_FFT, hop=HOP, t_samples=T_SLICE)
    fn = build_validate_fn(cfg, N_FFT, HOP, gl_iters=2, phase_err=False)
    out = fn(state.params, state.norm_state, np.asarray(batch),
             jax.random.PRNGKey(1))
    assert not any(k.endswith("_pc") for k in out)


def test_bootstrap_stats_clear_winner():
    # model beats the baselines by a constant 0.01 on every clip: the CI
    # must be tight around 0.01 and exclude 0, win rate 1.0, tail p 0.
    rng = np.random.default_rng(7)
    lmse = rng.uniform(0.1, 0.2, size=256)
    nop = lmse + 0.005
    mse = lmse - 0.01
    s = bootstrap_stats({"MSE_pc": mse, "LMSE_pc": lmse, "NOPMSE_pc": nop},
                        n_boot=2000)
    assert s["n_clips_stats"] == 256
    np.testing.assert_allclose(s["margin_vs_gl_mean"], 0.01, rtol=1e-12)
    lo, hi = s["margin_vs_gl_ci95"]
    np.testing.assert_allclose([lo, hi], [0.01, 0.01], rtol=1e-6)
    assert s["win_rate_vs_gl"] == 1.0
    assert s["p_margin_le_0_vs_gl"] == 0.0
    assert s["margin_vs_nophase_mean"] == pytest.approx(0.015)
    # relative margin ~ 0.01 / mean(lmse), CI brackets it
    rel = s["rel_margin_vs_gl"]
    assert s["rel_margin_vs_gl_ci95"][0] <= rel <= s["rel_margin_vs_gl_ci95"][1]


def test_bootstrap_stats_null_effect():
    # noise-only differences: CI must straddle 0 and the tail probability
    # must be far from 0.
    rng = np.random.default_rng(3)
    mse = rng.uniform(0.1, 0.2, size=512)
    lmse = mse + rng.normal(0.0, 0.02, size=512)
    s = bootstrap_stats({"MSE_pc": mse, "LMSE_pc": lmse, "NOPMSE_pc": lmse},
                        n_boot=2000)
    lo, hi = s["margin_vs_gl_ci95"]
    assert lo < 0.0 < hi
    assert 0.05 < s["p_margin_le_0_vs_gl"] < 0.95
    assert 0.3 < s["win_rate_vs_gl"] < 0.7


def test_bootstrap_stats_deterministic():
    rng = np.random.default_rng(11)
    pc = {"MSE_pc": rng.uniform(0.1, 0.2, 64)}
    pc["LMSE_pc"] = pc["MSE_pc"] + rng.normal(0, 0.01, 64)
    pc["NOPMSE_pc"] = pc["MSE_pc"] + 0.02
    a = bootstrap_stats(pc, n_boot=500)
    b = bootstrap_stats(pc, n_boot=500)
    assert a == b


def test_evaluate_cli_stats_and_per_clip(tmp_path):
    from phasegen_tpu.cli import evaluate as evaluate_cli

    # 10 clips with batch_size 4 -> one ragged tail batch of 2, so the
    # per-clip concat across uneven batches is covered too.
    shard = tmp_path / "val.npy"
    np.save(shard, synth_dataset(10, n_fft=N_FFT, hop=HOP,
                                 t_samples=T_SLICE))
    out = tmp_path / "report.json"
    jsonl = tmp_path / "per_clip.jsonl"
    evaluate_cli.main([
        "--data", str(shard), "--batch_size", "4",
        "--n_fft", str(N_FFT), "--hop", str(HOP), "--gl_iters", "2",
        "--compute_dtype", "float32", "--refine_iters", "1",
        "--stats", "--n_boot", "300", "--per_clip", str(jsonl),
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert report["n_clips"] == 10
    for k in ("margin_vs_gl_mean", "margin_vs_gl_ci95",
              "rel_margin_vs_gl", "rel_margin_vs_gl_ci95",
              "win_rate_vs_gl", "p_margin_le_0_vs_gl",
              "margin_vs_nophase_mean", "win_rate_vs_nophase"):
        assert k in report, k
    assert report["n_boot"] == 300
    rows = [json.loads(line) for line in jsonl.read_text().splitlines()]
    assert len(rows) == 10
    assert rows[0]["clip"] == 0 and rows[-1]["clip"] == 9
    for col in ("MSE", "LMSE", "NOPMSE", "MSE_refine1",
                "si_sdr_hybrid", "sc_gl"):
        assert col in rows[0], col
    # the report's clip-weighted scalar mean == mean of the JSONL rows
    np.testing.assert_allclose(
        np.mean([r["MSE"] for r in rows]), report["MSE"], rtol=2e-5)
    # margin identity: mean per-clip margin == LMSE - MSE of the report
    np.testing.assert_allclose(report["margin_vs_gl_mean"],
                               report["LMSE"] - report["MSE"], rtol=2e-5)
