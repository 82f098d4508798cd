"""On-device synthetic corpus: determinism, layout, stats, analytics.

The corpus replaces the reference's MedleyDB training data (reference:
preproc_mdb.py:125-198) with deterministic per-seed synthesis on device;
these tests pin the contract the training loop and cli/make_corpus share.
"""

import functools
import json

import numpy as np

import jax
import jax.numpy as jnp

from phasegen_tpu.data.device_synth import (
    clip_params,
    corpus_stats,
    synth_clips,
    synth_from_params,
    synth_patches,
)

# Tiny geometry: 16 bins x 128 frames, 1016-sample clips at 4 kHz.
T, SR, NFFT, HOP = 1016, 4000, 32, 8
KEY = jax.random.PRNGKey(7)


def _patches(seeds, base=KEY, **kw):
    return synth_patches(base, jnp.asarray(seeds, jnp.int32), t_samples=T,
                         sr=SR, n_fft=NFFT, hop=HOP, **kw)


def test_patch_layout_matches_reference_preproc():
    p = _patches(np.arange(4))
    # (N, 2, n_fft//2, n_frames): DC dropped, real/imag pair, f32
    assert p.shape == (4, 2, 16, 128)
    assert p.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(p)))


def test_deterministic_per_seed_and_distinct_across_seeds():
    a = _patches([3, 5])
    b = _patches([3, 5])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = _patches([5, 3])  # seed identity, not position
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(c[0]))
    assert not np.allclose(np.asarray(a[0]), np.asarray(a[1]))


def test_corpus_stats_standardize():
    m, s = corpus_stats(KEY, 64, t_samples=T, sr=SR, n_fft=NFFT, hop=HOP,
                        sample=64, gen_batch=16)
    p = _patches(np.arange(64), mean=m, std=s)
    assert abs(float(p.mean())) < 1e-3
    assert abs(float(p.std()) - 1.0) < 1e-3


def test_single_partial_is_analytic():
    """A lone sustained partial must be exactly sin(2*pi*f*t) (phase 0 at
    onset — the property that makes phase learnable from magnitude)."""
    par = clip_params(jax.random.PRNGKey(0), SR, T / SR)
    E, H = par["amp"].shape
    amp = np.zeros((E, H), np.float32)
    amp[0, 0] = 1.0
    par.update(
        onset=jnp.zeros(E), f0=jnp.full((E,), 100.0),
        ratio=jnp.ones((E, H)), amp=jnp.asarray(amp),
        tau=jnp.full((E, H), 1e9), attack=jnp.full((E,), 1e-6),
        vib_d=jnp.zeros(E), vib_f=jnp.ones(E), gain=jnp.float32(1.0))
    wav = np.asarray(synth_from_params(par, T, SR))
    t = np.arange(T) / SR
    ref = np.sin(2 * np.pi * 100.0 * t).astype(np.float32)
    ref /= np.abs(ref).max()
    np.testing.assert_allclose(wav, ref, atol=1e-4)


def test_clips_are_normalized_audio():
    w = np.asarray(synth_clips(KEY, jnp.arange(8), T, SR))
    peaks = np.abs(w).max(axis=1)
    assert np.all(peaks >= 0.5 - 1e-3) and np.all(peaks <= 1.0 + 1e-6)


def test_make_corpus_cli_writes_reference_layout(tmp_path, capsys):
    from phasegen_tpu.cli import make_corpus

    make_corpus.main([
        "--out_dir", str(tmp_path), "--name", "synth",
        "--n_train", "64", "--n_val", "12", "--materialize_train", "8",
        "--sr", str(SR), "--n_fft", str(NFFT), "--hop", str(HOP),
        "--t_samples", str(T), "--gen_batch", "8", "--cpu",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    val = np.load(tmp_path / "synth_audio_val.npy")
    train = np.load(tmp_path / "synth_audio_train.npy")
    assert val.shape == (12, 2, 16, 128) and val.dtype == np.float32
    assert train.shape == (8, 2, 16, 128)

    # Materialized shards must match the loop's on-device batches: same
    # seeds + same stats. Tolerance covers jit-fusion numerics (FMA on
    # the large sin phase arguments; measured max ~1.2e-3 on standardized
    # values) — a seed/stats misalignment would differ by O(1).
    m, s = report["mean"], report["std"]
    k0 = jax.random.PRNGKey(0)  # the CLI's --seed default
    golden_val = np.asarray(_patches(64 + np.arange(12), base=k0,
                                     mean=m, std=s))
    np.testing.assert_allclose(val, golden_val, rtol=1e-3, atol=5e-3)
    golden_train = np.asarray(_patches(np.arange(8), base=k0, mean=m, std=s))
    np.testing.assert_allclose(train, golden_train, rtol=1e-3, atol=5e-3)


def test_train_cli_synth_corpus(tmp_path):
    """--synth_train: the loop trains diskless end to end (loss finite,
    checkpoint written), with the val set from a materialized shard."""
    from phasegen_tpu.cli import make_corpus, train as train_cli

    make_corpus.main([
        "--out_dir", str(tmp_path), "--n_train", "32", "--n_val", "4",
        "--sr", str(SR), "--n_fft", str(NFFT), "--hop", str(HOP),
        "--t_samples", str(T), "--gen_batch", "8", "--cpu",
    ])
    log_dir = tmp_path / "run"
    train_cli.main([
        "--log_dir", str(log_dir),
        "--synth_train", "32", "--synth_t_samples", str(T),
        "--val_paths", str(tmp_path / "synth_audio_val.npy"),
        "--batch_size", "8", "--val_batch_size", "2",
        "--sr", str(SR), "--n_fft", str(NFFT), "--hop", str(HOP),
        "--val_every", "4", "--ckpt_every", "4", "--gl_iters", "2",
        "--compute_dtype", "float32", "--no_media", "--no_data_parallel",
        "--max_steps", "4",
    ])
    assert (log_dir / "ckpt_4").exists()
    with open(log_dir / "log.json") as f:
        log = json.load(f)
    # validation logged MSE/NOPMSE scalars at step 4
    assert any("MSE" in k for k in log)


def test_synth_fresh_never_repeats_seeds(tmp_path):
    """--synth_fresh: consecutive epochs see different clips."""
    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.train.loop import train as train_loop  # noqa: F401

    cfg = TrainConfig(synth_train=16, synth_fresh=True, batch_size=8,
                      sr=SR, n_fft=NFFT, hop=HOP, synth_t_samples=T)
    # unit-level check of the seed stream arithmetic: epoch k's seeds are
    # disjoint from epoch k+1's
    start = cfg.synth_train + (1 << 20)
    e0 = np.arange(start, start + 16)
    e1 = np.arange(start + 16, start + 32)
    assert not np.intersect1d(e0, e1).size


def test_v2_corpus_deterministic_and_v1_unchanged():
    """version=2 is deterministic per seed; version=1 output is
    byte-identical to the pre-v2 synthesis (the r2 corpus contract: v2
    draws its extras from fold_in sub-keys v1 never touches)."""
    key = jax.random.PRNGKey(0)
    seeds = jnp.arange(3, dtype=jnp.int32)

    v1a = np.asarray(synth_clips(key, seeds, T, SR))
    v1b = np.asarray(synth_clips(key, seeds, T, SR, version=1))
    np.testing.assert_array_equal(v1a, v1b)

    v2a = np.asarray(synth_clips(key, seeds, T, SR, version=2))
    v2b = np.asarray(synth_clips(key, seeds, T, SR, version=2))
    np.testing.assert_array_equal(v2a, v2b)
    assert np.abs(v2a - v1a).max() > 1e-3  # actually different corpus
    assert np.isfinite(v2a).all()
    assert np.abs(v2a).max() <= 1.0 + 1e-5  # still peak-normalized


def test_v2_has_noise_floor_in_quiet_regions():
    """v1 clips are digitally silent before the first onset; v2 must
    carry a noise floor there (the music-like corpus property)."""
    from phasegen_tpu.data.device_synth import clip_params, synth_from_params

    key = jax.random.PRNGKey(7)
    # force a late first onset by constructing params and pushing onsets
    p1 = clip_params(key, SR, T / SR, version=1)
    p2 = clip_params(key, SR, T / SR, version=2)
    late = jnp.full_like(p1["onset"], 0.5 * T / SR)
    p1 = dict(p1, onset=late)
    p2 = dict(p2, onset=jnp.full_like(p2["onset"], 0.5 * T / SR))
    w1 = np.asarray(synth_from_params(p1, T, SR))
    w2 = np.asarray(synth_from_params(p2, T, SR))
    head = slice(0, T // 4)  # well before any onset
    assert np.abs(w1[head]).max() == 0.0
    assert np.abs(w2[head]).max() > 0.0


def test_v2_patches_and_stats():
    key = jax.random.PRNGKey(0)
    mean, std = corpus_stats(key, 16, t_samples=T, sr=SR, n_fft=NFFT,
                             hop=HOP, sample=16, gen_batch=8, version=2)
    fn = jax.jit(functools.partial(synth_patches, t_samples=T, sr=SR,
                                   n_fft=NFFT, hop=HOP, mean=mean,
                                   std=std, version=2))
    p = np.asarray(fn(key, jnp.arange(16, dtype=jnp.int32)))
    assert p.shape == (16, 2, NFFT // 2, 128)
    assert abs(p.mean()) < 0.15 and abs(p.std() - 1.0) < 0.2


def test_v2_perc_bursts_only_on_active_events():
    """Inactive event slots must not emit noise bursts (r3 review: namp
    was masked by etype==2 but not by `active`, so a clip with few active
    events still played phantom transients at inactive slots' onsets)."""
    for seed in range(8):
        p = clip_params(jax.random.PRNGKey(seed), SR, T / SR, version=2)
        namp = np.asarray(p["namp"])
        active = np.asarray(p["active"])
        assert (namp[~active] == 0.0).all()


def test_v3_deterministic_and_v1_v2_unchanged():
    """version=3 is deterministic per seed and draws only from fold_in
    sub-keys v1/v2 never touch — both earlier corpora stay byte-identical
    (the corpus contract extended to v3)."""
    key = jax.random.PRNGKey(0)
    seeds = jnp.arange(3, dtype=jnp.int32)

    v2a = np.asarray(synth_clips(key, seeds, T, SR, version=2))
    v3a = np.asarray(synth_clips(key, seeds, T, SR, version=3))
    v3b = np.asarray(synth_clips(key, seeds, T, SR, version=3))
    np.testing.assert_array_equal(v3a, v3b)
    assert np.abs(v3a - v2a).max() > 1e-3  # actually different corpus
    assert np.isfinite(v3a).all()
    assert np.abs(v3a).max() <= 1.0 + 1e-5  # still peak-normalized


def test_v3_scale_quantization_registers_loops():
    """v3 music structure: tonal events land exactly on semitones of the
    per-clip scale (never on the 1 or 6 degree absent from both major and
    natural minor); percussion retriggers on the tempo grid while tonal
    events never do; tremolo is sustain-only."""
    from phasegen_tpu.data.device_synth import clip_params

    hits = 0
    for seed in range(6):
        p = clip_params(jax.random.PRNGKey(seed), SR, T / SR, version=3)
        etype = np.asarray(p["etype"])
        f0 = np.asarray(p["f0"])
        semi = 12.0 * np.log2(f0 / float(p["root"]))
        tonal = etype != 2
        # exact semitones of a diatonic scale
        assert np.abs(semi[tonal] - np.round(semi[tonal])).max() < 1e-3
        degrees = np.round(semi[tonal]).astype(int) % 12
        assert not np.isin(degrees, [1, 6]).any()
        rep = np.asarray(p["rep_per"])
        assert (rep[~tonal] < 10.0).all()     # perc loops ride the grid
        assert (rep[tonal] > 1e8).all()       # tonal events never loop
        trem = np.asarray(p["trem_d"])
        assert (trem[etype != 1] == 0.0).all()
        hits += int((~tonal).sum())
    assert hits > 0  # the sweep actually saw percussion events


def test_v3_perc_retrigger_restrikes():
    """A looping percussion event must re-strike: energy in a late window
    of a v3 render with a forced tight loop exceeds the one-shot decay."""
    from phasegen_tpu.data.device_synth import clip_params, synth_from_params

    key = jax.random.PRNGKey(11)
    p = clip_params(key, SR, T / SR, version=3)
    E = p["onset"].shape[0]
    # one active percussive slot, onset 0, fast decay, tight loop
    one = jnp.zeros((E,)).at[0].set(1.0)
    p = dict(p,
             onset=jnp.zeros((E,)),
             amp=p["amp"] * one[:, None],
             namp=p["namp"] * 0.0,
             tau=jnp.full_like(p["tau"], 0.008),
             rep_per=jnp.full_like(p["rep_per"], 0.04),
             rep_dec=jnp.full_like(p["rep_dec"], 0.3),
             rev_wet=jnp.zeros(()), noise_db=jnp.asarray(-200.0))
    w = np.asarray(synth_from_params(p, T, SR))
    seg = int(0.04 * SR)  # T is ~0.25 s in this file: 6+ loop periods fit
    first = np.abs(w[:seg]).max()
    fifth = np.abs(w[4 * seg:5 * seg]).max()
    # one-shot would have decayed by e^{-0.16/0.008} ~ 2e-9; a loop with
    # rep_dec 0.3 keeps the 5th re-strike within e^{-1.2} of the first
    assert fifth > 0.05 * first


def test_v3_patches_and_stats():
    key = jax.random.PRNGKey(0)
    mean, std = corpus_stats(key, 16, t_samples=T, sr=SR, n_fft=NFFT,
                             hop=HOP, sample=16, gen_batch=8, version=3)
    fn = jax.jit(functools.partial(synth_patches, t_samples=T, sr=SR,
                                   n_fft=NFFT, hop=HOP, mean=mean,
                                   std=std, version=3))
    p = np.asarray(fn(key, jnp.arange(16, dtype=jnp.int32)))
    assert p.shape == (16, 2, NFFT // 2, 128)
    assert abs(p.mean()) < 0.15 and abs(p.std() - 1.0) < 0.2
