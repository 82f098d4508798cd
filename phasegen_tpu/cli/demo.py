"""Demo / benchmark CLI — reference-compatible flags (demo.py:9-17).

    python -m phasegen_tpu.cli.demo --genre Pop --weight unet_llr/ckpt_4000

Per clip: U-Net phase prediction + resynthesis (timed), then the
Griffin-Lim baseline (timed), WAVs written to --out_dir, and the
reference's two summary lines printed (reference: demo.py:45,60).
TPU-native: both paths run as single jitted graphs; the U-Net path also
reports batched throughput in audio-seconds/sec.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.cache import add_cache_flag, enable_unless_disabled
from phasegen_tpu.config import DemoConfig
from phasegen_tpu.data.audio_io import write_wav
from phasegen_tpu.data.loader import NpyPatchLoader
from phasegen_tpu.infer.pipeline import spec_to_audio_fn
from phasegen_tpu.models.unet import unet_apply
from phasegen_tpu.ops.griffin_lim import griffin_lim
from phasegen_tpu.train.checkpoint import (
    latest_checkpoint,
    load_params_npz,
)
from phasegen_tpu.train.state import create_train_state
from phasegen_tpu.train.step import ri_to_logmag_phase


def _cast_convs_for_serving(params, compute_dtype):
    """Cast the conv tensors of a host param tree to ``compute_dtype``.

    Serving-only upload shrink: ``conv1d``/``conv_transpose1d`` cast the
    weight to the activation dtype at use (ops/conv.py), so for bf16
    compute a host-side bf16 cast changes NOTHING numerically — it only
    halves the dense cold-start upload (2.4 GB f32 -> 1.2 GB bf16 at
    612M; light checkpoints carry bf16 values anyway). Norm scale/bias
    stay f32: they are O(channels) bytes and participate in f32 norm
    arithmetic.
    """
    dt = jnp.dtype(compute_dtype)
    if dt.itemsize >= 4:  # f32 compute: nothing to shrink
        return params
    out = dict(params)
    for side in ("down", "up"):
        out[side] = [None if e is None
                     else {k: np.asarray(v).astype(dt, copy=False)
                           for k, v in e.items()}
                     for e in params[side]]
    return out


def load_weights(weight: str, model_cfg, device: bool = True,
                 host_serving: bool = False):
    """Load weights from an orbax ckpt dir/path or a weights-only npz.

    Templates are ABSTRACT (jax.eval_shape): materializing a real train
    state here costs params + Adam moments (~7.3 GB at 612M) on top of
    whatever the caller already holds — warm-starting a training run
    (state resident) OOMed the 16 GB chip exactly this way.

    ``device=False`` returns host arrays — callers that transform the
    weights before serving (int8 host quantization) must not pay the
    multi-GB dense upload first (~60 s of the cold start on this tunnel).
    Device uploads cast conv tensors to the serving compute dtype first
    (see ``_cast_convs_for_serving``) — half the upload bytes for bf16,
    bit-identical outputs.

    ``host_serving=True`` returns the HOST tree in exactly the dtypes
    ``device=True`` would upload (bf16 conv views, f32 norms) — for the
    overlapped cold start: hand it to infer/upload.py
    ``device_put_async`` and AOT-``warm()`` the executables from its
    shapes while the transfer streams.
    """
    abstract = jax.eval_shape(
        lambda: create_train_state(jax.random.PRNGKey(0), model_cfg))
    if weight.endswith(".npz"):
        # Device serving at a sub-f32 compute dtype keeps bf16-stored
        # conv leaves as zero-copy bf16 views: _cast_convs_for_serving
        # would cast them right back, and the f32 round-trip costs
        # ~15 s of host time at 612M (measured, single-core host).
        # Host consumers (device=False: int8 quantization) keep f32.
        keep = None
        if ((device or host_serving)
                and jnp.dtype(model_cfg.compute_dtype).itemsize < 4):
            keep = lambda key: key.startswith(("['down'][", "['up']["))
        params, norm_state = load_params_npz(
            weight, abstract.params, norm_template=abstract.norm_state,
            keep_bf16_for=keep)
        if norm_state is None:
            print("WARNING: npz has no BatchNorm running stats; eval-mode "
                  "output will use fresh (mean=0, var=1) statistics")
            from phasegen_tpu.models.unet import fresh_norm_state

            norm_state = fresh_norm_state(model_cfg)
        if host_serving:
            return (_cast_convs_for_serving(params, model_cfg.compute_dtype),
                    norm_state)
        if not device:
            return params, norm_state
        return (jax.device_put(
                    _cast_convs_for_serving(params, model_cfg.compute_dtype)),
                jax.device_put(norm_state))
    from phasegen_tpu.train.checkpoint import restore_weights

    path = weight
    if os.path.isdir(weight):
        newest = latest_checkpoint(weight, include_light=True)
        if newest:
            path = newest
        elif not os.path.exists(os.path.join(weight, "_METADATA")):
            # neither a run dir with ckpt_* entries nor itself an orbax
            # checkpoint — fail with the path, not an orbax KeyError
            raise FileNotFoundError(
                f"no checkpoint found in {weight!r}: expected ckpt_<step> "
                f"dirs / ckpt_<step>_light.npz files, or an orbax "
                f"checkpoint directory")
    if path.endswith("_light.npz"):
        return load_weights(path, model_cfg, device=device,
                            host_serving=host_serving)
    # weights-only restore: independent of how the run's optimizer was
    # configured (a full-TrainState restore needs a structurally matching
    # opt_state template — Adam vs Adam+schedule differ)
    params, norm_state = restore_weights(path)
    if host_serving:
        return (_cast_convs_for_serving(params, model_cfg.compute_dtype),
                norm_state)
    if not device:
        return params, norm_state
    # orbax restores host numpy arrays; without an explicit device_put
    # every jitted call re-uploads the 2.4 GB param tree
    return (jax.device_put(
                _cast_convs_for_serving(params, model_cfg.compute_dtype)),
            jax.device_put(norm_state))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Arguments for generating demo clips.")
    p.add_argument("--genre", required=True)
    p.add_argument("--n_songs", default=5, type=int)
    p.add_argument("--n_fft", default=2048, type=int)
    p.add_argument("--sr", default=16000, type=int)
    p.add_argument("--hop", default=512, type=int)
    p.add_argument("--weight", required=True)
    p.add_argument("--data_dir", default="dataset")
    p.add_argument("--out_dir", default="demo")
    p.add_argument("--gl_iters", default=250, type=int)
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--extra_depth", default=0, type=int)
    p.add_argument("--random_init", action="store_true",
                   help="skip weight loading (timing/bench runs)")
    p.add_argument("--refine_iters", default=0, type=int,
                   help="polish the predicted phase with K warm-started "
                        "Griffin-Lim iterations (K=1 is the measured sweet spot on wav-tuned models, beating random-start "
                        "GL-250 on the full held-out set, BASELINE.md)")
    p.add_argument("--quantize", default="none",
                   choices=["none", "store", "arith"],
                   help="int8 serving: 'store' keeps int8 weights in HBM "
                        "(bf16 MXU math) — use when the 4x weight-memory "
                        "footprint matters; speed-wise bf16 dense wins or "
                        "ties at every batch under clean fencing. 'arith' "
                        "runs int8 convs with calibrated static "
                        "activation scales — no consistent win on this "
                        "chip (int8 GEMMs run at bf16 speed here; "
                        "BASELINE.md r3)")
    add_cache_flag(p)
    from phasegen_tpu.obs.watchdog import add_wait_flag, gate_backend

    add_wait_flag(p)
    a = p.parse_args(argv)
    enable_unless_disabled(a)
    gate_backend(a)  # --wait_backend: recovery-gated start

    cfg = DemoConfig(genre=a.genre, n_songs=a.n_songs, n_fft=a.n_fft,
                     sr=a.sr, hop=a.hop, weight=a.weight,
                     data_dir=a.data_dir, out_dir=a.out_dir,
                     gl_iters=a.gl_iters, compute_dtype=a.compute_dtype,
                     extra_depth=a.extra_depth)
    model_cfg = cfg.model_config()
    os.makedirs(cfg.out_dir, exist_ok=True)

    loader = NpyPatchLoader(
        [os.path.join(cfg.data_dir, f"{cfg.genre}_audio_val.npy")],
        batch_size=cfg.n_songs, prefetch=0, drop_ragged=False)
    data = next(iter(loader))  # (<=n_songs, 2, F, T)
    if data.shape[0] < cfg.n_songs:
        print(f"val shard has only {data.shape[0]} clips; "
              f"demoing those instead of {cfg.n_songs}")

    # host_tree: weights stay on the host so the upload can start
    # asynchronously below and overlap the executable compile/restore.
    # arith still loads straight to device — activation-scale calibration
    # runs real forwards and needs the dense weights resident anyway.
    host_tree = not a.random_init and a.quantize in ("none", "store")
    if a.random_init:
        state = create_train_state(jax.random.PRNGKey(0), model_cfg)
        params, norm_state = state.params, state.norm_state
    else:
        # store mode quantizes on the HOST so only int8 + scales cross
        # the link (~0.6 GB vs 2.4 GB dense f32 — the upload dominates
        # cold start on this tunnel)
        params, norm_state = load_weights(cfg.weight, model_cfg,
                                          device=not host_tree,
                                          host_serving=(a.quantize
                                                        == "none"))

    conv_impl = None
    if a.quantize != "none":
        from phasegen_tpu.infer.quantize import (
            INT8_ARITH_IMPL,
            INT8_STORE_IMPL,
            attach_act_scales,
            calibrate_act_scales,
            quantize_for_serving,
            quantize_params,
            quantize_params_host,
            quantized_size_bytes,
        )

        if a.quantize == "arith":
            qparams = quantize_params(params)
            # static activation scales from the demo batch: removes the
            # per-conv dynamic max-reduce from the serving graph
            logmag_cal, _ = ri_to_logmag_phase(jnp.asarray(data[:2]))
            scales = calibrate_act_scales(params, norm_state,
                                          [logmag_cal], model_cfg)
            params = jax.device_put(attach_act_scales(qparams, scales))
            norm_state = jax.device_put(norm_state)
        elif host_tree:
            params = quantize_params_host(params)  # uploads async below
        else:
            params = quantize_for_serving(params)
            norm_state = jax.device_put(norm_state)
        conv_impl = INT8_ARITH_IMPL if a.quantize == "arith" else INT8_STORE_IMPL
        print(f"int8 {a.quantize}: weights "
              f"{quantized_size_bytes(params) / 1e9:.2f} GB in HBM")

    nf = data.shape[-1]
    length = cfg.hop * (nf - 1)
    to_audio = spec_to_audio_fn(cfg.n_fft, cfg.hop, length=length)

    @jax.jit
    def unet_clip(params, norm_state, clip_ri):
        logmag, _ = ri_to_logmag_phase(clip_ri)
        pred, _ = unet_apply(params, norm_state, logmag, model_cfg,
                             training=False, conv_impl=conv_impl)
        pred_phase = pred[:, : model_cfg.input_nc].astype(jnp.float32)
        audio = to_audio(logmag, pred_phase)
        if a.refine_iters > 0:
            # warm-started GL polish: the predicted phase is near a GL
            # fixed point, so a couple of iterations beat random-start
            # GL-250 quality at ~0.15 ms/clip each (benchmarks/gl_refine)
            audio, _, _ = griffin_lim(jnp.expm1(logmag), cfg.n_fft,
                                      cfg.hop, a.refine_iters,
                                      init=audio)
        return audio

    run_clip = unet_clip
    if host_tree:
        # overlapped cold start: stream the weight upload on a worker
        # thread while both demo shapes (per-clip and batched) of the
        # U-Net graph AOT-compile — or restore from the persistent
        # cache — from shapes alone (same machinery as cli/stream.py)
        from phasegen_tpu.infer.aot import AotRegistry, tree_avals
        from phasegen_tpu.infer.upload import device_put_async

        fut = device_put_async((params, norm_state))
        p_av, n_av = tree_avals(params, norm_state)
        d1 = jax.ShapeDtypeStruct((1,) + data.shape[1:],
                                  jnp.result_type(data))
        dN = jax.ShapeDtypeStruct(data.shape, jnp.result_type(data))
        reg = AotRegistry()
        reg.warm(1, unet_clip, p_av, n_av, d1)
        reg.warm(data.shape[0], unet_clip, p_av, n_av, dN)
        params, norm_state = fut.result()

        def run_clip(params, norm_state, clip):
            return reg.call(clip.shape[0], unet_clip,
                            params, norm_state, clip)

    # --- U-Net path, per clip (timed like reference demo.py:33-45) ---
    # warmup compile outside timing; fence with a scalar fetch —
    # block_until_ready returns before completion on tunneled backends
    float(jnp.sum(run_clip(params, norm_state, data[:1])))
    float(jnp.sum(run_clip(params, norm_state, data)))  # batched shape
    runtimes = []
    for c in range(data.shape[0]):
        start = time.time()
        audio = np.asarray(
            run_clip(params, norm_state, data[c : c + 1]))[0]
        runtimes.append(time.time() - start)
        write_wav(os.path.join(cfg.out_dir, f"unet_{cfg.genre}_{c}.wav"),
                  audio, cfg.sr)
    print("UNet - avg {} sec per clip.".format(np.mean(runtimes)))

    # batched throughput (TPU headline number)
    start = time.time()
    np.asarray(run_clip(params, norm_state, data))
    bt = time.time() - start
    clip_sec = length / cfg.sr
    print(f"UNet batched: {data.shape[0]} clips in {bt:.4f}s "
          f"({data.shape[0] * clip_sec / bt:.1f} audio-seconds/sec)")

    # --- Griffin-Lim baseline, per clip (reference demo.py:48-60) ---
    @jax.jit
    def gl_clip(clip_ri, key):
        logmag, _ = ri_to_logmag_phase(clip_ri)
        audio, _, _ = griffin_lim(jnp.expm1(logmag[0]), cfg.n_fft, cfg.hop,
                                  cfg.gl_iters, key=key)
        return audio

    float(jnp.sum(gl_clip(data[:1], jax.random.PRNGKey(0))))
    runtimes = []
    for c in range(data.shape[0]):
        start = time.time()
        lim = np.asarray(gl_clip(data[c : c + 1], jax.random.PRNGKey(c)))
        runtimes.append(time.time() - start)
        write_wav(os.path.join(cfg.out_dir, f"gl_{cfg.genre}_{c}.wav"),
                  lim, cfg.sr)
    print("GL - avg {} sec per clip".format(np.mean(runtimes)))


if __name__ == "__main__":
    main()
