"""Offline evaluation CLI: reconstruction metrics over a whole val set.

    python -m phasegen_tpu.cli.evaluate --data dataset/Pop_audio_val.npy \
        --weight unet_llr/ [--batch_size 8] [--gl_iters 250] [--out report.json]

Runs the jitted validation graph (train/validate.py) over every batch of
the given shard and reports mean MSE / NOPMSE / LMSE (the reference's
waveform mean-abs-error triple, reference: train.py:103-108,122) plus
hybrid-reconstruction SNR, as one JSON object. The reference only ever
surfaced these numbers as TensorBoard scalars on 3 clips.
"""

from __future__ import annotations

import argparse
import json

import jax

from phasegen_tpu.cache import add_cache_flag, enable_unless_disabled
from phasegen_tpu.config import DemoConfig
from phasegen_tpu.data.loader import NpyPatchLoader
from phasegen_tpu.train.state import create_train_state
from phasegen_tpu.train.validate import build_validate_fn


def bootstrap_stats(pc, n_boot: int = 10000, seed: int = 0) -> dict:
    """Paired-bootstrap statistics over per-clip metric vectors.

    ``pc`` maps "*_pc" keys (from build_validate_fn(per_clip=True),
    host-concatenated over the shard) to 1-D numpy arrays. The question
    every headline here answers is "does the pure model beat baseline X
    on this shard?" — so the statistics are PAIRED per clip: resample
    clips with replacement (the same clip index for model and baseline)
    and report, for X in {GL (LMSE), zero phase (NOPMSE)}:

    - margin_vs_X_mean / _ci95: mean(X - MSE) and its 95% bootstrap CI
      (positive = the model wins);
    - rel_margin_vs_X / _ci95: 1 - mean(MSE)/mean(X) — the "N% better"
      number the BASELINE.md tables quote — with its CI;
    - win_rate_vs_X: fraction of clips where the model's MAE is lower;
    - p_margin_le_0_vs_X: bootstrap tail probability that the mean
      margin is <= 0 (one-sided; < 0.025 ~ "significant at 95%").

    Deterministic (seeded generator) so re-runs reproduce the CI bytes.
    """
    import numpy as np

    mse = np.asarray(pc["MSE_pc"], np.float64)
    n = mse.size
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, (n_boot, n))
    out = {"n_clips_stats": int(n), "n_boot": int(n_boot)}
    for name, key in (("gl", "LMSE_pc"), ("nophase", "NOPMSE_pc")):
        base = np.asarray(pc[key], np.float64)
        d = base - mse
        bm = d[idx].mean(axis=1)
        rel = 1.0 - (mse[idx].mean(axis=1)
                     / np.maximum(base[idx].mean(axis=1), 1e-12))
        out[f"margin_vs_{name}_mean"] = float(d.mean())
        out[f"margin_vs_{name}_ci95"] = [
            float(np.percentile(bm, 2.5)), float(np.percentile(bm, 97.5))]
        out[f"rel_margin_vs_{name}"] = float(1.0 - mse.mean() / base.mean())
        out[f"rel_margin_vs_{name}_ci95"] = [
            float(np.percentile(rel, 2.5)), float(np.percentile(rel, 97.5))]
        out[f"win_rate_vs_{name}"] = float((mse < base).mean())
        out[f"p_margin_le_0_vs_{name}"] = float((bm <= 0.0).mean())
    return out


def paired_model_stats(a, b, key: str = "MSE",
                       n_boot: int = 10000, seed: int = 0) -> dict:
    """Paired bootstrap of model A vs model B on the SAME clips.

    ``a`` and ``b`` are per-clip metric dicts (e.g. loaded from two
    --per_clip JSONL dumps over the same shard, keys WITHOUT the "_pc"
    suffix) — clip i of A and clip i of B must be the same audio.
    Returns the mean per-clip difference B[key] - A[key] (positive =
    A wins, metric-is-lower-better convention), its 95% CI, A's win
    rate, and the one-sided tail probability that the mean difference
    is <= 0. This is the right tool for fine-tuned-vs-zero-shot or
    recipe A/B questions; bootstrap_stats only compares one model
    against its in-eval baselines (GL / zero phase).
    """
    import numpy as np

    va = np.asarray(a[key], np.float64)
    vb = np.asarray(b[key], np.float64)
    if va.shape != vb.shape:
        raise ValueError(f"clip count mismatch: {va.shape} vs {vb.shape}")
    d = vb - va
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, d.size, (n_boot, d.size))
    bm = d[idx].mean(axis=1)
    return {
        "key": key, "n_clips": int(d.size), "n_boot": int(n_boot),
        "mean_a": float(va.mean()), "mean_b": float(vb.mean()),
        "diff_mean": float(d.mean()),
        "diff_ci95": [float(np.percentile(bm, 2.5)),
                      float(np.percentile(bm, 97.5))],
        "win_rate_a": float((va < vb).mean()),
        "p_diff_le_0": float((bm <= 0.0).mean()),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Evaluate phase reconstruction.")
    p.add_argument("--data", required=True,
                   help="val .npy shard(s), comma-separated — multiple "
                        "shards evaluate as one clip-weighted report "
                        "(e.g. cross-corpus: v1 + v2 val shards)")
    p.add_argument("--weight", default="")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--hop", default=512, type=int)
    p.add_argument("--gl_iters", default=250, type=int)
    p.add_argument("--max_batches", default=0, type=int,
                   help="0 = the whole shard")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--extra_depth", default=0, type=int)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--refine_iters", default="",
                   help="comma list of warm-started GL polish depths to "
                        "report as MSE_refine{K} columns, e.g. '2,8' "
                        "(the --refine_iters path of cli/demo, measured "
                        "over the whole shard)")
    # --refine_pick was removed from this surface (VERDICT r3 #5): its
    # spectral-mismatch criterion is monotone in GL depth, so the argmin
    # always picks the deepest K and loses to fixed K=1 (measured twice,
    # BASELINE.md). The machinery stays in train/validate.py; research
    # access via benchmarks/gl_refine.py.
    p.add_argument("--stats", action="store_true",
                   help="add paired-bootstrap 95%% CIs, win rates, and "
                        "one-sided tail probabilities for the model-vs-"
                        "GL and model-vs-zero-phase margins (per-clip "
                        "resampling, seeded; see bootstrap_stats)")
    p.add_argument("--per_clip", default="",
                   help="write one JSONL row per clip (all *_pc metric "
                        "columns) to this path")
    p.add_argument("--n_boot", default=10000, type=int,
                   help="bootstrap resamples for --stats")
    p.add_argument("--out", default="", help="write the JSON report here too")
    add_cache_flag(p)
    from phasegen_tpu.obs.watchdog import add_wait_flag, gate_backend

    add_wait_flag(p)
    a = p.parse_args(argv)
    enable_unless_disabled(a)
    from phasegen_tpu.obs.watchdog import device_liveness_probe

    gate_backend(a)  # --wait_backend: recovery-gated start
    device_liveness_probe()  # fail fast on a wedged backend (600 s)
    refine = tuple(int(s) for s in a.refine_iters.split(",") if s.strip())

    cfg = DemoConfig(n_fft=a.n_fft, hop=a.hop, weight=a.weight,
                     compute_dtype=a.compute_dtype,
                     extra_depth=a.extra_depth)
    model_cfg = cfg.model_config()

    host_tree = bool(a.weight) and not a.random_init
    if not host_tree:
        state = create_train_state(jax.random.PRNGKey(0), model_cfg)
        params, norm_state = state.params, state.norm_state
    else:
        from phasegen_tpu.cli.demo import load_weights

        params, norm_state = load_weights(a.weight, model_cfg,
                                          host_serving=True)

    want_pc = a.stats or bool(a.per_clip)
    validate = build_validate_fn(model_cfg, a.n_fft, a.hop, a.gl_iters,
                                 refine_iters=refine, phase_err=False,
                                 per_clip=want_pc)

    if host_tree:
        # overlapped cold start (infer/aot.py): the weight upload streams
        # on a worker thread while the val graph — the repo's biggest
        # single compile, GL-250 runs in-graph — AOT-compiles or restores
        # from the persistent cache. The ragged tail batch still compiles
        # at runtime (one extra compile, as before).
        import numpy as np

        from phasegen_tpu.infer.aot import AotRegistry, tree_avals
        from phasegen_tpu.infer.upload import device_put_async

        fut = device_put_async((params, norm_state))
        shard = np.load(a.data.split(",")[0], mmap_mode="r")
        bsz = min(a.batch_size, shard.shape[0])
        p_av, n_av = tree_avals(params, norm_state)
        b_av = jax.ShapeDtypeStruct((bsz,) + shard.shape[1:],
                                    shard.dtype)
        k_av = tree_avals(jax.random.PRNGKey(0))
        reg = AotRegistry()
        reg.warm(bsz, validate, p_av, n_av, b_av, k_av)
        params, norm_state = fut.result()
        _validate_jit = validate
        validate = (lambda p, n, b, k:
                    reg.call(b.shape[0], _validate_jit, p, n, b, k))
    # drop_ragged=False: a "whole-val-set" report must include the ragged
    # tail (up to batch_size-1 clips). validate() returns batch means, so
    # batches are weighted by clip count; the tail costs one extra compile.
    loader = NpyPatchLoader(a.data.split(","), batch_size=a.batch_size,
                            shuffle=False, prefetch=2, drop_ragged=False)

    sums: dict[str, float] = {}
    pcs: dict[str, list] = {}
    n_batches = 0
    n_clips = 0
    for i, batch in enumerate(loader):
        if a.max_batches and i >= a.max_batches:
            break
        out = validate(params, norm_state, batch,
                       jax.random.fold_in(jax.random.PRNGKey(0), i))
        b = int(batch.shape[0])
        for k, v in out.items():
            if getattr(v, "ndim", None) == 0:  # scalar metrics (clip-wtd)
                sums[k] = sums.get(k, 0.0) + b * float(jax.device_get(v))
            elif k.endswith("_pc"):  # per-clip vectors (--stats/--per_clip)
                import numpy as np

                pcs.setdefault(k, []).append(
                    np.asarray(jax.device_get(v), np.float64))
            elif k.endswith("_counts"):  # histograms aggregate by sum
                import numpy as np

                host = np.asarray(jax.device_get(v), np.int64)
                sums[k] = np.asarray(sums.get(k, 0)) + host
        n_batches += 1
        n_clips += b

    if n_clips == 0:
        raise SystemExit("empty shard")
    report = {k: ([int(x) for x in v] if k.endswith("_counts")
                  else v / n_clips)
              for k, v in sums.items()}
    report["n_batches"] = n_batches
    report["n_clips"] = n_clips
    report["batch_size"] = a.batch_size
    report["gl_iters"] = a.gl_iters
    if refine:
        report["refine_iters"] = list(refine)
    if want_pc:
        import numpy as np

        pc = {k: np.concatenate(v) for k, v in pcs.items()}
        if a.per_clip:
            keys = sorted(pc)
            with open(a.per_clip, "w") as f:
                for i in range(n_clips):
                    row = {"clip": i}
                    row.update({k[:-3]: float(pc[k][i]) for k in keys})
                    f.write(json.dumps(row) + "\n")
        if a.stats:
            report.update(bootstrap_stats(pc, n_boot=a.n_boot))
    line = json.dumps(report)
    print(line)
    if a.out:
        with open(a.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
