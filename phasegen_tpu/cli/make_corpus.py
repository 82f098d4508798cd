"""Materialize the synthetic corpus to reference-layout npy shards.

The training loop synthesizes its corpus on-device per batch
(``--synth_train``, data/device_synth.py) and never touches disk; this
CLI materializes any slice of the same deterministic seed space to
``.npy`` shards in the reference preproc layout/naming
({name}_audio_{train,val}.npy, (N, 2, n_fft//2, T) float32, globally
standardized — reference: preproc_mdb.py:182-196) so that the file-based
tools (cli/train --train_paths, cli/evaluate, cli/demo) and the
reference's own consumers see an ordinary dataset.

Seed layout: train clips are seeds [0, n_train); val clips are seeds
[n_train, n_train + n_val). Standardization stats come from a fixed
subsample of the train range, so a shard written here matches batches the
training loop synthesizes on-device bit-for-bit in distribution and
scale.

    python -m phasegen_tpu.cli.make_corpus --out_dir dataset \
        --n_train 98304 --n_val 1024 [--materialize_train 4096] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Write synthetic-corpus npy shards (reference layout)")
    p.add_argument("--out_dir", default="dataset")
    p.add_argument("--name", default="synth",
                   help="shard name prefix ({name}_audio_{split}.npy)")
    p.add_argument("--n_train", type=int, default=98304,
                   help="corpus size = the train seed range (also the "
                        "standardization-stats base)")
    p.add_argument("--n_val", type=int, default=1024)
    p.add_argument("--materialize_train", type=int, default=0,
                   help="write the first N train seeds to a train shard "
                        "(0 = val only; on-device training needs no file)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--version", type=int, default=1, choices=[1, 2, 3],
                   help="1 = tonal-event corpus; 2 = harder music-like "
                        "corpus (noise floor, perc noise bursts, reverb); "
                        "3 = v2 + music structure (per-clip key/scale, "
                        "register roles, looping percussion, tremolo)")
    p.add_argument("--sr", type=int, default=16000)
    p.add_argument("--n_fft", type=int, default=2048)
    p.add_argument("--hop", type=int, default=512)
    p.add_argument("--t_samples", type=int, default=65024)
    p.add_argument("--gen_batch", type=int, default=128)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tests; axon ignores "
                        "JAX_PLATFORMS so this must be a config update)")
    return p


def main(argv=None) -> None:
    a = build_parser().parse_args(argv)
    if a.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from phasegen_tpu.data.device_synth import corpus_stats, synth_patches

    base_key = jax.random.PRNGKey(a.seed)
    t0 = time.time()
    mean, std = corpus_stats(base_key, a.n_train, t_samples=a.t_samples,
                             sr=a.sr, n_fft=a.n_fft, hop=a.hop,
                             gen_batch=min(a.gen_batch, 256),
                             version=a.version)
    fn = jax.jit(functools.partial(synth_patches, t_samples=a.t_samples,
                                   sr=a.sr, n_fft=a.n_fft, hop=a.hop,
                                   mean=mean, std=std, version=a.version))

    os.makedirs(a.out_dir, exist_ok=True)
    n_frames = 1 + a.t_samples // a.hop
    report = {"mean": mean, "std": std, "n_train": a.n_train,
              "n_val": a.n_val, "seed": a.seed, "version": a.version}

    def write_shard(path: str, first_seed: int, n: int) -> None:
        out = np.lib.format.open_memmap(
            path, mode="w+", dtype=np.float32,
            shape=(n, 2, a.n_fft // 2, n_frames))
        for s in range(0, n, a.gen_batch):
            b = min(a.gen_batch, n - s)
            seeds = jnp.arange(first_seed + s, first_seed + s + b,
                               dtype=jnp.int32)
            out[s:s + b] = np.asarray(jax.device_get(fn(base_key, seeds)),
                                      np.float32)
        out.flush()

    if a.n_val > 0:
        val_path = os.path.join(a.out_dir, f"{a.name}_audio_val.npy")
        write_shard(val_path, a.n_train, a.n_val)
        report["val_path"] = val_path
    if a.materialize_train > 0:
        train_path = os.path.join(a.out_dir, f"{a.name}_audio_train.npy")
        write_shard(train_path, 0, a.materialize_train)
        report["train_path"] = train_path
    report["seconds"] = round(time.time() - t0, 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
