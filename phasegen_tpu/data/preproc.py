"""Dataset preprocessing: audio -> standardized real/imag STFT patch shards.

Re-implements the reference's preproc pipeline (reference:
preproc_mdb.py:66-198) TPU-first: the hot loop — ~31x STFT coverage per
chunk position from the random-crop augmentation (reference:
preproc_mdb.py:73-80) — runs as one jitted, *batched* GEMM-STFT on the
device instead of per-chunk host librosa calls. Chunk gathering stays on
host (cheap memory slicing); the FFT/windowing FLOPs go to the MXU.

Sources:
  * MedleyDB multitracks when the ``medleydb`` package + assets exist
    (genre filter, optional no-vocal / melody / bass stem mixes), else
  * a directory of WAVs per genre (``wav_dir/<genre>/*.wav``) — the
    dependency-free fallback.

Output parity: ``{out_dir}/{genre}_audio_{train,val}.npy`` of shape
(N, 2, n_fft//2, frames) float32, DC bin dropped, globally standardized,
shuffled, first n_val rows to val (reference: preproc_mdb.py:177-196).
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np

from phasegen_tpu.config import PreprocConfig
from phasegen_tpu.data.audio_io import read_wav, resample


def chunk_offsets(a_len: int, t_slice: int, n_random: int,
                  rng: np.random.Generator) -> list[int]:
    """Sequential window starts plus n_random random crops per position.

    Mirrors the reference's augmentation (reference: preproc_mdb.py:66-82):
    for every sequential ``t_slice`` window, ``n_random`` extra offsets
    drawn from [0, a_len - t_slice//1.3).
    """
    bnd = int(a_len - t_slice // 1.3)
    offs = []
    for i in range(0, a_len, t_slice):
        offs.append(i)
        for _ in range(n_random):
            offs.append(int(rng.integers(0, max(bnd, 1))))
    return offs


def gather_chunks(audio: np.ndarray, offsets: list[int],
                  t_slice: int) -> np.ndarray:
    """(n_src, T) audio + offsets -> (n_chunk, n_src, t_slice), zero-padded
    tails (reference: preproc_mdb.py:87-88)."""
    n_src = audio.shape[0]
    out = np.zeros((len(offsets), n_src, t_slice), np.float32)
    for j, start in enumerate(offsets):
        seg = audio[:, start : start + t_slice]
        out[j, :, : seg.shape[1]] = seg
    return out


def _auto_device_stft() -> bool:
    """Pick the faster STFT backend for THIS host (VERDICT r3 #8).

    On a directly-attached TPU the device GEMM-STFT wins; on the
    tunneled dev backend ("axon" platform) the per-batch D2H readback
    rides a ~36 ms-RTT tunnel and host numpy measured 2x faster
    (BASELINE.md r3x preproc column). No JAX device at all -> host.
    """
    try:
        import jax

        return jax.devices()[0].platform not in ("axon",)
    except Exception:
        return False


def batched_stft_ri(chunks: np.ndarray, n_fft: int, hop: int,
                    device: bool | None = None,
                    batch: int = 64) -> np.ndarray:
    """(N, n_src, t_slice) -> (N, n_src, 2, n_fft//2, frames) float32.

    DC bin dropped (reference: preproc_mdb.py:93). Runs the GEMM-STFT on
    the default JAX device in batches; pure-numpy fallback for
    device-free contexts. ``device=None`` auto-selects per backend
    (device, except on the D2H-bound axon tunnel)."""
    if device is None:
        device = _auto_device_stft()
    if device:
        import jax
        import jax.numpy as jnp

        from phasegen_tpu.ops.dft import stft_ri
        from phasegen_tpu.ops.stft import drop_dc

        @jax.jit
        def _stft(x):
            re, im = stft_ri(x, n_fft, hop)
            return jnp.stack([drop_dc(re), drop_dc(im)], axis=-3)

        outs = []
        n, n_src, t = chunks.shape
        flat = chunks.reshape(n * n_src, t)
        for s in range(0, len(flat), batch):
            outs.append(np.asarray(jax.device_get(_stft(flat[s : s + batch]))))
        arr = np.concatenate(outs, axis=0)
        return arr.reshape(n, n_src, *arr.shape[1:])

    from phasegen_tpu.data.synth import np_stft

    out = []
    for c in chunks:
        per_src = []
        for src in c:
            spec = np_stft(src, n_fft, hop)[1:]
            per_src.append(np.stack([spec.real, spec.imag]))
        out.append(np.stack(per_src))
    return np.asarray(out, np.float32)


def _wav_dir_tracks(cfg: PreprocConfig, genre: str) -> list[dict]:
    pattern = os.path.join(cfg.wav_dir, genre, "*.wav")
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(
            f"no wavs under {pattern}; provide --wav_dir with per-genre "
            f"subdirectories or install medleydb")
    return [{"mix_path": f, "instruments": [], "genre": genre}
            for f in files]


#: The EXACT medleydb API surface _medleydb_tracks relies on (reference:
#: preproc_mdb.py:15-64,137-147). tests/test_medleydb_mock.py pins it
#: without assets: the mock fixtures must expose exactly these names,
#: and when a real medleydb install is present its source is scanned
#: for them — so API drift fails a test instead of a production run.
MEDLEYDB_API_SURFACE = {
    "medleydb": ["load_all_multitracks"],
    "medleydb.mix": ["mix_multitrack", "VOCALS"],
    "MultiTrack": ["genre", "stems", "mix_path", "stem_instruments"],
    "Stem": ["instrument", "component"],
    "mix_multitrack_kwargs": ["stem_indices"],
}


def _medleydb_tracks(cfg: PreprocConfig, genres: list[str]):
    """Genre-filtered MedleyDB metadata with optional stem mixes
    (reference: preproc_mdb.py:15-64,137-147)."""
    import medleydb as mdb
    from medleydb.mix import VOCALS, mix_multitrack

    def gen_mix(track, fn, stem_indices):
        if not os.path.exists(fn):
            mix_multitrack(track, fn, stem_indices=stem_indices)
        return fn

    per_genre: dict[str, list] = {g: [] for g in genres}
    for t in mdb.load_all_multitracks():
        if t.genre not in per_genre:
            continue
        stems = t.stems
        base = t.mix_path.split(".wav")[0]
        meta = {
            "mix_path": t.mix_path,
            # the attrs one-hots must match the no-vocal MIX below, which
            # filters stems by VOCALS membership — the literal "vocal"
            # string matches no MedleyDB instrument name (r3x review)
            "instruments": [i for i in t.stem_instruments
                            if not (cfg.unvoice and i in VOCALS)],
            "genre": t.genre,
        }
        non_vocal, melody_idx, bass_idx, has_vocal = [], [], [], False
        for i in stems.keys():
            not_vocal = all(inst not in VOCALS
                            for inst in stems[i].instrument)
            if not_vocal:
                non_vocal.append(i)
            else:
                has_vocal = True
            if stems[i].component == "melody" and cfg.melody:
                melody_idx.append(i)
            if stems[i].component == "bass" and cfg.bass:
                bass_idx.append(i)
        if cfg.melody:
            meta["melody_path"] = gen_mix(t, base + "_melody.wav", melody_idx)
        if cfg.bass:
            meta["bass_path"] = gen_mix(t, base + "_bass.wav", bass_idx)
        if cfg.unvoice and has_vocal:
            meta["mix_path"] = gen_mix(t, base + "_no_vocal.wav", non_vocal)
        per_genre[t.genre].append(meta)
    return per_genre


def compute_feature(cfg: PreprocConfig) -> dict[str, dict[str, str]]:
    """Run the full preproc; returns {genre: {split: npy_path}}."""
    genres = [g for g in cfg.genres.split(",") if g]
    if not genres:
        raise ValueError("--genres is required (comma separated)")
    t_slice = int(cfg.chunk * cfg.rsr)
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(cfg.out_dir, exist_ok=True)

    # Broad except: a medleydb install with missing assets/metadata raises
    # AttributeError/OSError from load_all_multitracks, not just
    # ImportError — all of them mean "use the wav_dir fallback".
    try:
        per_genre = _medleydb_tracks(cfg, genres)
        print("Using MedleyDB multitracks.")
    except ImportError:
        print("medleydb unavailable; using --wav_dir fallback.")
        per_genre = {g: _wav_dir_tracks(cfg, g) for g in genres}
    except Exception as e:  # noqa: BLE001 — degraded assets, fall back
        print(f"medleydb failed ({type(e).__name__}: {e}); "
              f"using --wav_dir fallback.")
        per_genre = {g: _wav_dir_tracks(cfg, g) for g in genres}

    n_random = list(cfg.n_random)
    if len(n_random) == 1:
        n_random = n_random * len(genres)

    written: dict[str, dict[str, str]] = {}
    instruments_dict: dict[str, int] = {}
    if cfg.get_attr:
        for g in genres:
            for md in per_genre[g]:
                for inst in md["instruments"]:
                    instruments_dict.setdefault(inst, len(instruments_dict))

    for gid, g in enumerate(genres):
        start = time.time()
        all_patches, all_attrs = [], []
        for md in per_genre[g]:
            paths = [md["mix_path"]]
            if cfg.melody and md.get("melody_path"):
                paths.append(md["melody_path"])
            if cfg.bass and md.get("bass_path"):
                paths.append(md["bass_path"])
            srcs = []
            for p in paths:
                audio, sr = read_wav(p)
                srcs.append(resample(audio, sr, cfg.rsr))
            a_len = min(len(s) for s in srcs)
            audio = np.stack([s[:a_len] for s in srcs])

            offs = chunk_offsets(a_len, t_slice, n_random[gid], rng)
            chunks = gather_chunks(audio, offs, t_slice)
            patches = batched_stft_ri(chunks, cfg.n_fft, cfg.hop_length,
                                      device=cfg.device_stft)
            all_patches.append(patches)
            if cfg.get_attr:
                onehot = [0] * len(instruments_dict)
                for inst in md["instruments"]:
                    onehot[instruments_dict[inst]] = 1
                all_attrs.extend([onehot] * len(patches))
            print(f"{len(patches)} clips for {md['mix_path']}.")

        if not all_patches:
            raise ValueError(
                f"no tracks produced clips for genre {g!r} — check the "
                f"genre spelling against the corpus (medleydb genres are "
                f"case-sensitive) or the wav_dir layout")
        patches = np.concatenate(all_patches, axis=0)
        if patches.shape[1] == 1:  # single source axis squeezed
            patches = np.squeeze(patches, axis=1)
        print(f"We have {len(patches)} clips for {g}. shape: {patches.shape}")

        # global standardization + shuffle + split (preproc_mdb.py:174-196)
        patches = (patches - patches.mean()) / patches.std()
        idx = rng.permutation(len(patches))
        patches = patches[idx]
        out = {"audio": patches}
        if cfg.get_attr:
            out["attrs"] = np.asarray(all_attrs)[idx]
        if cfg.get_gid:
            # per-patch genre index (reference: preproc_mdb.py:99-103's
            # get_gid mapping), ready to feed the loader's labels plumbing
            out["gid"] = np.full(len(patches), gid, np.int32)

        written[g] = {}
        for key, arr in out.items():
            val_p = os.path.join(cfg.out_dir, f"{g}_{key}_val.npy")
            train_p = os.path.join(cfg.out_dir, f"{g}_{key}_train.npy")
            np.save(val_p, arr[: cfg.n_val])
            np.save(train_p, arr[cfg.n_val :])
            written[g][f"{key}_val"] = val_p
            written[g][f"{key}_train"] = train_p
        print(f"Generation for {g} is complete, "
              f"{time.time() - start} sec elapsed.")
    return written
