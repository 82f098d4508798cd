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


def test_paired_model_stats_detects_winner():
    from phasegen_tpu.cli.evaluate import paired_model_stats

    rng = np.random.default_rng(5)
    base = rng.uniform(0.1, 0.2, 128)
    a = {"MSE": base}                       # model A strictly better
    b = {"MSE": base + 0.008}
    s = paired_model_stats(a, b, n_boot=1000)
    assert s["diff_mean"] == pytest.approx(0.008)
    assert s["diff_ci95"][0] > 0 and s["win_rate_a"] == 1.0
    assert s["p_diff_le_0"] == 0.0
    # null: same metric + noise -> CI straddles 0
    b2 = {"MSE": base + rng.normal(0, 0.01, 128)}
    s2 = paired_model_stats(a, b2, n_boot=1000)
    assert s2["diff_ci95"][0] < 0 < s2["diff_ci95"][1]
    with pytest.raises(ValueError):
        paired_model_stats(a, {"MSE": base[:64]})


def test_paired_ab_cli(tmp_path):
    import sys
    sys.path.insert(0, "benchmarks")
    try:
        import paired_ab
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(9)
    base = rng.uniform(0.1, 0.2, 32)
    for name, vals in (("a", base), ("b", base + 0.01)):
        with open(tmp_path / f"{name}.jsonl", "w") as f:
            # write out of order: load_pc must sort by clip index
            for i in reversed(range(32)):
                f.write(json.dumps({"clip": i, "MSE": float(vals[i]),
                                    "LMSE": 0.2}) + "\n")
    out = tmp_path / "ab.json"
    paired_ab.main(["--a", str(tmp_path / "a.jsonl"),
                    "--b", str(tmp_path / "b.jsonl"),
                    "--n_boot", "500", "--out", str(out)])
    res = json.loads(out.read_text())
    assert res["diff_mean"] == pytest.approx(0.01)
    assert res["win_rate_a"] == 1.0 and res["n_clips"] == 32


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
