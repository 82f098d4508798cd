"""The training loop: reference semantics, TPU-native execution.

Mirrors the reference loop (reference: train.py:32-133) — drop-ragged
batches, cos/sin + 0.2*mag loss, validation every 2000 steps with
spectrogram images / audio / MSE-NOPMSE-LMSE scalars, checkpoints every
4000 steps, per-epoch loss summary — with the TPU-native upgrades:
device-prefetched batches, a jitted (optionally DP+TP-sharded) train
step, fully-jitted validation incl. 250-iter Griffin-Lim, atomic
full-state checkpoints with restart-from-latest, and bounded run length
via max_steps/max_epochs (the reference loops forever).
"""

from __future__ import annotations

import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from phasegen_tpu.config import TrainConfig
from phasegen_tpu.data.loader import NpyPatchLoader
from phasegen_tpu.obs.logger import Logger
from phasegen_tpu.obs.spec_image import phase_error_image, spec_image
from phasegen_tpu.obs.watchdog import StallWatchdog, stop_requested
from phasegen_tpu.parallel.dp import build_dp_train_step, shard_train_state
from phasegen_tpu.parallel.mesh import batch_sharding, make_mesh
from phasegen_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_latest,
    save_checkpoint,
    save_checkpoint_async,
    save_light_checkpoint_async,
)
from phasegen_tpu.train.state import create_train_state, make_optimizer
from phasegen_tpu.train.step import build_train_step, ri_to_logmag_phase
from phasegen_tpu.train.validate import build_validate_fn


def _run_validation(cfg, validate_fn, state, val_loader, logger, cnt):
    try:
        val_batch = next(iter(val_loader))
    except StopIteration:
        return
    key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), cnt)
    out = validate_fn(state.params, state.norm_state, val_batch, key)
    out = jax.device_get(out)

    if cfg.log_media:
        logmag, _ = ri_to_logmag_phase(val_batch)
        mag = np.expm1(np.asarray(jax.device_get(logmag), np.float32))
        # The reference renders Origin/Hybrid/NP via amplitude_to_db of
        # the complex spectrograms (reference: train.py:87-89) — which is
        # phase-invariant, so its three images are pixel-identical. Here
        # the Hybrid/NP slots carry diagnostics instead: the circular
        # per-bin phase error and its magnitude^2-weighted version
        # (bright = audible phase damage).
        perr = np.asarray(out["phase_err"], np.float32)
        m2 = mag * mag
        w_err = perr * m2 / np.maximum(
            m2.max(axis=(-2, -1), keepdims=True), 1e-12)
        for c in range(mag.shape[0]):
            report_i = OrderedDict([
                (f"Origin_{cnt}_{c}", spec_image(mag[c])),
                (f"PhaseErr_{cnt}_{c}", phase_error_image(perr[c])),
                (f"PhaseErrW_{cnt}_{c}",
                 phase_error_image(w_err[c], vmax=float(w_err[c].max())
                                   or 1.0)),
            ])
            report_a = OrderedDict([
                (f"wav_Origin_{cnt}_{c}", out["orig"][c]),
                (f"wav_Hyb_{cnt}_{c}", out["hybrid"][c]),
                (f"wav_Nop_{cnt}_{c}", out["no_phase"][c]),
                (f"wav_GLim_{cnt}_{c}", out["gl"][c]),
            ])
            logger.log(cnt, report_i, log_type="image")
            logger.log(cnt, report_a, log_type="audio", sr=cfg.sr)
            logger.write()
            logger.flush()

    logger.log(cnt, OrderedDict([
        ("MSE", float(out["MSE"])),
        ("NOPMSE", float(out["NOPMSE"])),
        ("LMSE", float(out["LMSE"])),
        ("SNR_hybrid_dB", float(out["snr_hybrid_db"])),
        ("SI_SDR_hybrid_dB", float(out["si_sdr_hybrid_db"])),
        ("SI_SDR_GL_dB", float(out["si_sdr_gl_db"])),
        ("SC_hybrid", float(out["sc_hybrid"])),
        ("SC_GL", float(out["sc_gl"])),
    ]))
    logger.write()
    logger.flush()


def train(cfg: TrainConfig) -> None:
    # --max_seconds anchor: budget includes setup (weight upload, corpus
    # stats, compile) so an outer safety-net `timeout T+300` can never
    # SIGTERM a run whose budget is T-240 — with the old post-setup
    # anchor, a ~7 min setup ate the margin and the round-5 stage-1
    # window lost its step-3976 yield save to the SIGTERM by seconds.
    # Budgets must exceed setup (~10 min on this tunnel at 612M) to make
    # step progress; the first budget check happens at a dispatch
    # crossing, so at least one dispatch of steps always lands.
    t_budget0 = time.time()
    model_cfg = cfg.model_config()
    mu_dtype = jnp.bfloat16 if cfg.adam_mu_dtype == "bfloat16" else None
    opt = make_optimizer(cfg.lr, mu_dtype=mu_dtype,
                         schedule=cfg.lr_schedule,
                         warmup_steps=cfg.warmup_steps,
                         decay_steps=cfg.decay_steps)

    def _load_init_host(path):
        """--init_from HOST load in serving dtypes: bf16-stored leaves
        stay bf16 (half the link bytes, no ~15 s host f32 round-trip)."""
        from phasegen_tpu.cli.demo import load_weights

        return load_weights(path, model_cfg, host_serving=True)

    def _place_init_f32(host_tree):
        """Upload + upcast to f32 masters ON DEVICE (the bf16→f32 cast is
        exact). Training states keep full-precision masters; the
        serving-dtype load (cli/demo.load_weights device=True) is for
        inference only. Runs on the MAIN thread — worker-thread
        device_put transferred 3-6x slower on the tunneled dev backend
        (BASELINE.md cold-start A/B)."""
        params, norm_state = jax.device_put(host_tree)
        up = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32), t)
        return up(params), up(norm_state)

    def _load_init_f32(path):
        return _place_init_f32(_load_init_host(path))

    # Warm-start prefetch: when --init_from will be used (no resume
    # checkpoint in log_dir), its DISK load runs on a worker thread
    # under the corpus-stats pass and state creation below; the H2D
    # upload itself stays on the main thread at the join point.
    # Single-chip only: under a mesh the params need shard placement
    # (shard_train_state), which the synchronous path below handles.
    init_fut = None
    if (cfg.init_from
            and jax.device_count() == 1 and cfg.tensor_parallel <= 1
            and not (cfg.resume
                     and latest_checkpoint(cfg.log_dir,
                                           include_light=True))):
        from concurrent.futures import ThreadPoolExecutor

        _pool = ThreadPoolExecutor(max_workers=1,
                                   thread_name_prefix="init-prefetch")
        init_fut = _pool.submit(_load_init_host, cfg.init_from)
        _pool.shutdown(wait=False)
    # Synthetic-corpus standardization stats are computed BEFORE the train
    # state exists: at 612M params the f32 state is ~7.3 GB of HBM, and
    # streaming the stats subsample through synthesis on top of that has
    # OOMed the 16 GB chip. Stats need only the corpus config.
    synth_key = None
    if cfg.synth_train > 0:
        from phasegen_tpu.data.device_synth import corpus_stats

        synth_key = jax.random.PRNGKey(cfg.synth_seed)
        s_mean, s_std = corpus_stats(
            synth_key, cfg.synth_train, t_samples=cfg.synth_t_samples,
            sr=cfg.sr, n_fft=cfg.n_fft, hop=cfg.hop,
            version=cfg.synth_version)

    key = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(key, model_cfg, opt)

    n_dev = jax.device_count()
    use_mesh = cfg.data_parallel and (n_dev > 1 or cfg.tensor_parallel > 1)
    if use_mesh:
        mesh = make_mesh(n_model=cfg.tensor_parallel)
        state = shard_train_state(state, mesh)
        step_fn = build_dp_train_step(model_cfg, opt, mesh, state,
                                      cfg.mag_weight,
                                      ang_weighting=cfg.ang_weighting,
                                      wav_weight=cfg.wav_weight,
                                      sc_weight=cfg.sc_weight,
                                      n_fft=cfg.n_fft, hop=cfg.hop,
                                      ang_weight=cfg.ang_weight)
        b_shard = batch_sharding(mesh, 4)
    else:
        mesh, b_shard = None, None
        step_fn = build_train_step(model_cfg, opt, cfg.mag_weight,
                                   ang_weighting=cfg.ang_weighting,
                                   wav_weight=cfg.wav_weight,
                                   sc_weight=cfg.sc_weight,
                                   n_fft=cfg.n_fft, hop=cfg.hop,
                                   ang_weight=cfg.ang_weight)

    restored = restore_latest(cfg.log_dir, state) if cfg.resume else None
    if restored is not None:
        # Free the fresh template state's device buffers BEFORE the
        # upload: a full-checkpoint restore returns entirely new host
        # arrays, and two full f32 states (2 x 7.35 GB at 612M) do not
        # fit 16 GB HBM (CLAUDE.md OOM note). Light restores ALIAS the
        # template's optimizer moments/rng, so only leaves absent from
        # the restored tree are deleted.
        restored_ids = {id(l) for l in jax.tree.leaves(restored)}
        for leaf in jax.tree.leaves(state):
            if isinstance(leaf, jax.Array) and id(leaf) not in restored_ids:
                leaf.delete()
        # orbax restores host numpy arrays — place them on device(s)
        # explicitly or every step re-uploads the full param tree
        state = (shard_train_state(restored, mesh) if use_mesh
                 else jax.device_put(restored))
        if init_fut is not None:
            # a checkpoint appeared after the prefetch gate checked: the
            # prefetched HOST tree is simply dropped (nothing on device)
            init_fut = None
        print(f"Resumed from step {int(jax.device_get(state.step))}")
    elif cfg.init_from:
        # Warm start (--init_from): load params/BN stats from any
        # checkpoint into this otherwise-fresh state (step 0, new
        # optimizer) — the fine-tuning idiom the reference approximates
        # with model.load (reference: model.py:50-54, never called by
        # train.py). A checkpoint in log_dir itself wins (resume first).
        # f32 masters via _load_init_f32 (a serving-dtype bf16 load here
        # would quantize every optimizer update to 8 mantissa bits).
        if init_fut is not None:
            params, norm_state = _place_init_f32(init_fut.result())
        else:
            params, norm_state = _load_init_f32(cfg.init_from)
        state = state._replace(params=params, norm_state=norm_state)
        state = (shard_train_state(state, mesh) if use_mesh
                 else jax.device_put(state))
        print(f"Warm-started params/BN stats from {cfg.init_from}")

    # On-device synthetic corpus (--synth_train): every batch is
    # synthesized on the TPU from its clip seeds (data/device_synth.py) —
    # no disk, no host feed, corpus size bounded only by the seed range.
    # Standardization stats come from a fixed subsample of the seed range,
    # identical to what cli/make_corpus bakes into materialized shards.
    synth_fn = None
    if cfg.synth_train > 0:
        import functools

        from phasegen_tpu.data.device_synth import synth_patches

        synth_raw = functools.partial(synth_patches,
                                      t_samples=cfg.synth_t_samples,
                                      sr=cfg.sr, n_fft=cfg.n_fft,
                                      hop=cfg.hop, mean=s_mean, std=s_std,
                                      version=cfg.synth_version)
        synth_fn = jax.jit(synth_raw, out_shardings=b_shard)
        print(f"On-device synthetic corpus: {cfg.synth_train} clips"
              f"{' (fresh seeds every epoch)' if cfg.synth_fresh else ''}, "
              f"stats mean={s_mean:.4g} std={s_std:.4g}")

    # Device-resident dataset: when the shards fit in the HBM budget, put
    # them on device once and sample batches with an on-device gather —
    # no per-step host feed (measured 101 vs 124.6 ms/step at B=16).
    # Under a mesh the dataset shards over the 'data' axis (each chip
    # holds N/n_data patches) and the per-step gather is jitted with the
    # batch sharding as its output — the collective rides ICI.
    device_data = None
    take_fn = None
    if synth_fn is None and cfg.device_data_gb > 0 and jax.process_count() == 1:
        arrays = [np.load(p, mmap_mode="r") for p in cfg.train_paths]
        nbytes = sum(a.size * 4 for a in arrays)
        if nbytes <= cfg.device_data_gb * 1e9:
            from phasegen_tpu.data.loader import flatten_sources

            host = np.concatenate([flatten_sources(np.asarray(a, np.float32))
                                   for a in arrays])
            if use_mesh:
                n_data = mesh.shape["data"]
                n_keep = len(host) - (len(host) % n_data)
                if n_keep < len(host):
                    print(f"device-resident: dropping {len(host) - n_keep} "
                          f"patches so the dataset shards over data={n_data}")
                    host = host[:n_keep]
                device_data = jax.device_put(jnp.asarray(host),
                                             batch_sharding(mesh, host.ndim))
            else:
                device_data = jax.device_put(jnp.asarray(host))
            take_fn = jax.jit(lambda d, i: jnp.take(d, i, axis=0),
                              out_shardings=b_shard)
            print(f"Training data device-resident "
                  f"({nbytes / 1e9:.2f} GB, {device_data.shape[0]} patches)")

    # --scan_steps K > 1: run K train steps per dispatch inside one
    # lax.scan program (train/step.py:build_train_step_scan). The host
    # feeds a (K, B) int32 array per call — synth seeds or dataset row
    # indices — and batch construction happens on device inside the scan.
    # Amortizes the fixed per-step cost (~77 ms/step measured on the
    # tunnel: dispatch + optimizer sync) over K steps. Device-side feeds
    # only; the ragged tail of an epoch (< K*B samples) is dropped, the
    # same drop-ragged semantics the reference applies per batch.
    device_feed = synth_fn is not None or device_data is not None
    if cfg.scan_steps > 0:
        scan_k = cfg.scan_steps
    elif device_feed:
        # auto (scan_steps=0): largest K <= 8 that (a) fits one epoch and
        # (b) divides every active cadence (val/ckpt/max_steps), so
        # validations, checkpoint names (ckpt_{cnt}) and the stop step
        # land EXACTLY as without scanning — auto must never change
        # observable semantics, only dispatch granularity
        n_total = (cfg.synth_train if synth_fn is not None
                   else device_data.shape[0])
        spe = n_total // cfg.batch_size  # steps per epoch (drop-ragged)
        scan_k = max(1, min(8, spe))
        # spe itself is a constraint: a K that doesn't divide the epoch
        # would drop the epoch's ragged window — fewer training steps
        # than the unscanned loop
        cadences = [c for c in (cfg.val_every, cfg.ckpt_every,
                                cfg.max_steps, spe) if c > 0]
        while scan_k > 1 and any(c % scan_k for c in cadences):
            scan_k -= 1
    else:
        scan_k = 1
    scan_fn = None
    scan_data = None
    if scan_k > 1 and device_feed:
        from phasegen_tpu.parallel.mesh import state_shardings
        from phasegen_tpu.train.step import build_train_step_scan

        if synth_fn is not None:
            def make_batch(data, seeds):
                b = synth_raw(data, seeds)
                return (jax.lax.with_sharding_constraint(b, b_shard)
                        if use_mesh else b)

            scan_data = synth_key
            data_shard = None
        else:
            def make_batch(data, idx):
                b = jnp.take(data, idx, axis=0)
                return (jax.lax.with_sharding_constraint(b, b_shard)
                        if use_mesh else b)

            scan_data = device_data
            data_shard = batch_sharding(mesh, 4) if use_mesh else None
        st_shard = state_shardings(mesh, state) if use_mesh else None
        scan_fn = build_train_step_scan(model_cfg, opt, make_batch,
                                        cfg.mag_weight, cfg.ang_weighting,
                                        state_shard=st_shard,
                                        data_shard=data_shard,
                                        wav_weight=cfg.wav_weight,
                                        sc_weight=cfg.sc_weight,
                                        n_fft=cfg.n_fft, hop=cfg.hop,
                                        ang_weight=cfg.ang_weight)
        print(f"Multi-step dispatch: lax.scan over {scan_k} steps/call")
    elif scan_k > 1:
        print("scan_steps needs a device-side feed (--synth_train or a "
              "device-resident dataset); running 1 step/call")
        scan_k = 1

    # Fold the restored step into the shuffle seeds so a resumed run
    # continues the permutation stream instead of replaying epoch 0's
    # shuffles (sample-repetition bias across crash-restarts).
    start_step = int(jax.device_get(state.step))
    # Under a mesh the loader places batches directly with the mesh batch
    # sharding (device=b_shard) — no default-device bounce + re-placement.
    loader = (None if device_data is not None or synth_fn is not None else
              NpyPatchLoader(list(cfg.train_paths), batch_size=cfg.batch_size,
                             seed=cfg.seed + start_step,
                             prefetch=cfg.prefetch, device=b_shard))
    val_loader = NpyPatchLoader(list(cfg.val_paths),
                                batch_size=cfg.val_batch_size,
                                seed=cfg.seed + 1, prefetch=0)
    validate_fn = build_validate_fn(model_cfg, cfg.n_fft, cfg.hop,
                                    cfg.gl_iters,
                                    phase_err=cfg.log_media)
    logger = Logger(cfg.log_dir)
    # environmental-stall self-documentation (a ~40 min tunnel stall was
    # observed once in round 2; the loop survives, the log should show it)
    watchdog = StallWatchdog(cfg.log_dir)

    cnt = start_step
    # profile window is relative to the starting step (resume-safe)
    profile_start = cnt + 10
    trace_open = False
    epoch = 0
    done = False
    yielded = False  # exited via the cooperative stop file (see below)
    pending_saves: list = []

    # --max_seconds: wall-clock budget checked at the same crossings as
    # the stop file — the clean alternative to wrapping queue stages in
    # `timeout`, whose mid-step SIGTERM has wedged this tunneled backend
    # for long stretches (observed round 5; CLAUDE.md kill rules). The
    # clock starts at train() entry; see the anchor note at the top.

    def _stop_reason() -> str | None:
        if stop_requested():
            return "Stop file detected"
        if cfg.max_seconds > 0 and time.time() - t_budget0 >= cfg.max_seconds:
            return f"Time budget {cfg.max_seconds:.0f}s exhausted"
        return None
    epoch_rng = np.random.default_rng(cfg.seed + start_step)

    # Fresh-seed stream: seeds beyond the fixed corpus (and past the val
    # range cli/make_corpus puts at [synth_train, synth_train + n_val)).
    fresh_next = cfg.synth_train + (1 << 20) + start_step * cfg.batch_size

    def _as_i32_seeds(seeds: np.ndarray) -> jnp.ndarray:
        # fold_in keys are int32 on device; a --synth_fresh run past
        # ~2^31 total clips would silently wrap and alias earlier seeds
        if len(seeds) and int(seeds.max()) >= np.iinfo(np.int32).max:
            raise OverflowError(
                f"synthetic clip seed {int(seeds.max())} exceeds int32; "
                f"restart the --synth_fresh stream with a new --synth_seed")
        return jnp.asarray(seeds, jnp.int32)

    def epoch_batches():
        nonlocal fresh_next
        if synth_fn is not None:
            n = cfg.synth_train
            stop = n - (n % cfg.batch_size)  # drop-ragged (train.py:38-39)
            if cfg.synth_fresh:
                seeds = np.arange(fresh_next, fresh_next + stop)
                fresh_next += stop
            else:
                seeds = epoch_rng.permutation(n)
            for s in range(0, stop, cfg.batch_size):
                yield synth_fn(synth_key,
                               _as_i32_seeds(seeds[s : s + cfg.batch_size]))
            return
        if device_data is None:
            yield from loader
            return
        n = device_data.shape[0]
        order = epoch_rng.permutation(n)
        stop = n - (n % cfg.batch_size)  # drop-ragged (train.py:38-39)
        for s in range(0, stop, cfg.batch_size):
            yield take_fn(device_data,
                          jnp.asarray(order[s : s + cfg.batch_size]))

    def epoch_windows():
        """(K, B) int32 seed/index windows for the scan dispatch path."""
        nonlocal fresh_next
        k, b = scan_k, cfg.batch_size
        n = cfg.synth_train if synth_fn is not None else device_data.shape[0]
        if (n // b) // k == 0:
            raise ValueError(
                f"scan_steps={k} exceeds the {n // b} steps one epoch "
                f"yields ({n} samples / batch {b}); lower scan_steps")
        if synth_fn is not None:
            steps = (n // b) // k * k  # drop the ragged window
            if cfg.synth_fresh:
                seeds = np.arange(fresh_next, fresh_next + steps * b)
                fresh_next += steps * b
            else:
                seeds = epoch_rng.permutation(n)[: steps * b]
        else:
            steps = (n // b) // k * k
            seeds = epoch_rng.permutation(n)[: steps * b]
        for s in range(0, steps * b, k * b):
            yield _as_i32_seeds(seeds[s : s + k * b]).reshape(k, b)

    def _crossed(prev: int, cur: int, every: int) -> bool:
        return every > 0 and prev // every != cur // every

    def _epoch_end(start, ang_losses, mag_losses):
        nonlocal epoch, done
        epoch += 1
        if ang_losses:
            ang = float(jnp.mean(jnp.stack(jax.device_get(ang_losses))))
            mag = float(jnp.mean(jnp.stack(jax.device_get(mag_losses))))
            # reference epoch line (train.py:130)
            print(f"Epoch {epoch} done, {time.time() - start} elasped, "
                  f"mag loss: {mag}, ang loss: {ang}")
            logger.log(epoch, OrderedDict([("Ang Loss", ang),
                                           ("Mag Loss", mag)]))
            logger.write()
            logger.flush()
        if cfg.max_epochs and epoch >= cfg.max_epochs:
            done = True

    while not done:
        start = time.time()
        ang_losses, mag_losses = [], []
        if scan_fn is not None:
            for xs in epoch_windows():
                trace_this = (cfg.profile_steps and not trace_open
                              and cnt >= profile_start)
                if trace_this:  # one traced scan call covers K steps
                    jax.profiler.start_trace(cfg.log_dir + "/profile")
                state, metrics = scan_fn(state, scan_data, xs)
                watchdog.beat()
                prev, cnt = cnt, cnt + scan_k
                if trace_this:
                    # scalar fence: block_until_ready returns before
                    # device completion on this backend (CLAUDE.md);
                    # fetching a step output waits for the execution
                    int(jax.device_get(state.step))
                    jax.profiler.stop_trace()
                    profile_start = 1 << 62  # traced once
                ang_losses.append(metrics["ang_loss"])
                mag_losses.append(metrics["mag_loss"])
                if _crossed(prev, cnt, cfg.val_every):
                    # the window-mean loss propagates a NaN from ANY step
                    # in the window, unlike the window-final loss_last
                    loss_now = float(jax.device_get(metrics["loss"]))
                    if not np.isfinite(loss_now):
                        watchdog.close()  # the dump save isn't a stall
                        save_checkpoint(cfg.log_dir + "/nan_dump", state,
                                        step=cnt)
                        raise FloatingPointError(
                            f"non-finite loss {loss_now} at step {cnt}; "
                            f"state dumped to {cfg.log_dir}/nan_dump")
                    _run_validation(cfg, validate_fn, state, val_loader,
                                    logger, cnt)
                if cfg.ckpt_every > 0 and _crossed(prev, cnt,
                                                   cfg.ckpt_every):
                    save_fn = (save_light_checkpoint_async if cfg.ckpt_light
                               else save_checkpoint_async)
                    fut = save_fn(cfg.log_dir, state, step=cnt)
                    fut.add_done_callback(
                        lambda f: print(f"Saved checkpoint {f.result()}"))
                    pending_saves.append((cnt, fut))
                reason = _stop_reason()
                if reason:
                    # cooperative chip yield (obs/watchdog.py) or time
                    # budget: checkpoint the current step if the crossing
                    # above didn't, then exit cleanly so the caller's
                    # pipeline continues
                    print(f"{reason}; yielding at step {cnt}")
                    if (cfg.ckpt_every > 0
                            and not (pending_saves
                                     and pending_saves[-1][0] == cnt)):
                        save_fn = (save_light_checkpoint_async
                                   if cfg.ckpt_light
                                   else save_checkpoint_async)
                        pending_saves.append(
                            (cnt, save_fn(cfg.log_dir, state, step=cnt)))
                    done = True
                    yielded = True
                    break
                if cfg.max_steps and cnt >= cfg.max_steps:
                    done = True
                    break
            _epoch_end(start, ang_losses, mag_losses)
            continue
        for batch in epoch_batches():
            if cfg.profile_steps and cnt == profile_start:
                jax.profiler.start_trace(cfg.log_dir + "/profile")
                trace_open = True
            state, metrics = step_fn(state, batch)
            watchdog.beat()
            cnt += 1
            if trace_open and cnt >= profile_start + cfg.profile_steps:
                int(jax.device_get(state.step))  # scalar fence (CLAUDE.md)
                jax.profiler.stop_trace()
                trace_open = False
            # keep scalars on device; host sync happens at log points
            ang_losses.append(metrics["ang_loss"])
            mag_losses.append(metrics["mag_loss"])

            if cfg.val_every > 0 and cnt % cfg.val_every == 0:
                # failure detection: a non-finite loss means corrupted
                # state — stop before checkpointing garbage (the reference
                # would loop forever on NaNs, train.py:35)
                loss_now = float(jax.device_get(metrics["loss"]))
                if not np.isfinite(loss_now):
                    watchdog.close()  # the dump save isn't a stall
                    save_checkpoint(cfg.log_dir + "/nan_dump", state,
                                    step=cnt)
                    raise FloatingPointError(
                        f"non-finite loss {loss_now} at step {cnt}; "
                        f"state dumped to {cfg.log_dir}/nan_dump")
                _run_validation(cfg, validate_fn, state, val_loader, logger,
                                cnt)
            if cfg.ckpt_every > 0 and cnt % cfg.ckpt_every == 0:
                # --ckpt_light: periodic saves are weights-only bf16 npz
                # (~6x fewer D2H bytes than the full orbax state); the
                # full state is still written once at run end below.
                save_fn = (save_light_checkpoint_async if cfg.ckpt_light
                           else save_checkpoint_async)
                fut = save_fn(cfg.log_dir, state, step=cnt)
                fut.add_done_callback(
                    lambda f: print(f"Saved checkpoint {f.result()}"))
                pending_saves.append((cnt, fut))
            reason = _stop_reason()
            if reason:
                # cooperative chip yield / time budget — scan-path twin above
                print(f"{reason}; yielding at step {cnt}")
                if (cfg.ckpt_every > 0
                        and not (pending_saves
                                 and pending_saves[-1][0] == cnt)):
                    save_fn = (save_light_checkpoint_async if cfg.ckpt_light
                               else save_checkpoint_async)
                    pending_saves.append(
                        (cnt, save_fn(cfg.log_dir, state, step=cnt)))
                done = True
                yielded = True
                break
            if cfg.max_steps and cnt >= cfg.max_steps:
                done = True
                break

        _epoch_end(start, ang_losses, mag_losses)

    # training dispatches are done — the final save drain below blocks
    # for minutes legitimately (7-25 min full-state saves observed) and
    # must not read as an environmental stall
    watchdog.close()

    if trace_open:  # run ended inside the profile window — close the trace
        int(jax.device_get(state.step))  # scalar fence (CLAUDE.md)
        jax.profiler.stop_trace()

    # drain in-flight saves, then write the final FULL state unless the
    # last async save already covered this exact step — under ckpt_light
    # periodic saves are weights-only, so the exit save is always full
    # (ckpt_every=0 disables checkpointing entirely)
    for _, fut in pending_saves:
        fut.result()
    # On a cooperative yield the requester (usually bench.py at round
    # end) is waiting for the chip NOW; a 5-7 GB full-state save takes
    # 7-25 min on this tunnel and would hold the chip through the very
    # benchmark that asked for it. The yield path above already saved a
    # resumable checkpoint at this step, so skip the exit full save.
    if (cfg.final_ckpt and cfg.ckpt_every > 0 and not yielded
            and (cfg.ckpt_light or not pending_saves
                 or pending_saves[-1][0] != cnt)):
        save_checkpoint(cfg.log_dir, state, step=cnt)
    logger.close()
