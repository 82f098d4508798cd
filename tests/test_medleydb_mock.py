"""Mocked-medleydb unit tests for the MedleyDB ingestion path.

The container has no medleydb package or assets, so `_medleydb_tracks`
(reference parity: preproc_mdb.py:15-64,137-147) is pinned here against a
fake `medleydb` module installed in sys.modules — catching API drift in
the stems/stem_instruments/component access patterns for free.
"""

import os
import sys
import types

import numpy as np
import pytest

from phasegen_tpu.config import PreprocConfig
from phasegen_tpu.data.preproc import _medleydb_tracks, compute_feature


class _FakeStem:
    def __init__(self, instrument, component=""):
        self.instrument = instrument  # list[str], as in medleydb
        self.component = component


class _FakeTrack:
    def __init__(self, mix_path, genre, stems, stem_instruments):
        self.mix_path = mix_path
        self.genre = genre
        self.stems = stems
        self.stem_instruments = stem_instruments


def _install_fake_medleydb(monkeypatch, tracks, mix_calls):
    mdb = types.ModuleType("medleydb")
    mdb.load_all_multitracks = lambda: list(tracks)
    mix = types.ModuleType("medleydb.mix")
    mix.VOCALS = ["male singer", "female singer", "vocalists"]

    def mix_multitrack(track, fn, stem_indices=None):
        mix_calls.append((track.mix_path, fn, tuple(stem_indices)))
        with open(fn, "wb"):
            pass  # create the file so gen_mix's cache check sees it

    mix.mix_multitrack = mix_multitrack
    mdb.mix = mix
    monkeypatch.setitem(sys.modules, "medleydb", mdb)
    monkeypatch.setitem(sys.modules, "medleydb.mix", mix)


def _pop_track(tmp_path, name="song", vocal=True):
    stems = {
        1: _FakeStem(["drum set"]),
        2: _FakeStem(["electric bass"], component="bass"),
        3: _FakeStem(["piano"], component="melody"),
    }
    instruments = ["drum set", "electric bass", "piano"]
    if vocal:
        stems[4] = _FakeStem(["male singer"])
        # real medleydb stem_instruments carries the actual instrument
        # name ("male singer"), not a generic "vocal" tag — the reference
        # filters on the literal "vocal" (with `is not`, preproc_mdb.py:32)
        # and so never actually removes singers from the attrs list; this
        # repo filters by VOCALS membership to keep attrs consistent with
        # the rendered no-vocal mix (documented divergence, docs/PARITY.md)
        instruments.append("male singer")
    mix_path = str(tmp_path / f"{name}.wav")
    with open(mix_path, "wb"):
        pass
    return _FakeTrack(mix_path, "Pop", stems, instruments)


def test_medleydb_genre_filter_and_plain_mix(monkeypatch, tmp_path):
    calls = []
    t_pop = _pop_track(tmp_path, "pop1", vocal=False)
    t_jazz = _FakeTrack(str(tmp_path / "jazz.wav"), "Jazz", {}, [])
    _install_fake_medleydb(monkeypatch, [t_pop, t_jazz], calls)

    per_genre = _medleydb_tracks(PreprocConfig(genres="Pop"), ["Pop"])
    assert list(per_genre) == ["Pop"]
    assert len(per_genre["Pop"]) == 1
    md = per_genre["Pop"][0]
    assert md["mix_path"] == t_pop.mix_path
    assert md["genre"] == "Pop"
    assert "piano" in md["instruments"]
    assert calls == []  # no stem mixes requested -> no rendering


def test_medleydb_unvoice_renders_no_vocal_mix(monkeypatch, tmp_path):
    calls = []
    t = _pop_track(tmp_path, "pop2", vocal=True)
    _install_fake_medleydb(monkeypatch, [t], calls)

    cfg = PreprocConfig(genres="Pop", unvoice=True)
    md = _medleydb_tracks(cfg, ["Pop"])["Pop"][0]
    expect = t.mix_path.split(".wav")[0] + "_no_vocal.wav"
    assert md["mix_path"] == expect
    # rendered exactly the non-vocal stems (1,2,3), not stem 4
    assert calls == [(t.mix_path, expect, (1, 2, 3))]
    # attrs exclude every VOCALS member — consistent with the mix
    assert "male singer" not in md["instruments"]
    assert md["instruments"] == ["drum set", "electric bass", "piano"]


def test_medleydb_melody_bass_and_idempotence(monkeypatch, tmp_path):
    calls = []
    t = _pop_track(tmp_path, "pop3", vocal=False)
    _install_fake_medleydb(monkeypatch, [t], calls)

    cfg = PreprocConfig(genres="Pop", melody=True, bass=True)
    md = _medleydb_tracks(cfg, ["Pop"])["Pop"][0]
    base = t.mix_path.split(".wav")[0]
    assert md["melody_path"] == base + "_melody.wav"
    assert md["bass_path"] == base + "_bass.wav"
    assert (t.mix_path, base + "_melody.wav", (3,)) in calls
    assert (t.mix_path, base + "_bass.wav", (2,)) in calls
    # second pass: files exist, gen_mix must not re-render (cache check,
    # reference: preproc_mdb.py:9-13)
    n = len(calls)
    _medleydb_tracks(cfg, ["Pop"])
    assert len(calls) == n


def test_compute_feature_falls_back_on_broken_medleydb(monkeypatch, tmp_path):
    """A medleydb install with missing assets (OSError mid-load) must fall
    back to --wav_dir, not abort (ADVICE round-1 finding)."""
    mdb = types.ModuleType("medleydb")

    def broken():
        raise OSError("Audio file missing")

    mdb.load_all_multitracks = broken
    mix = types.ModuleType("medleydb.mix")
    mix.VOCALS, mix.mix_multitrack = [], lambda *a, **k: None
    mdb.mix = mix
    monkeypatch.setitem(sys.modules, "medleydb", mdb)
    monkeypatch.setitem(sys.modules, "medleydb.mix", mix)

    from phasegen_tpu.data.audio_io import write_wav
    from phasegen_tpu.data.synth import synth_waveforms

    wav_dir = tmp_path / "wavs"
    os.makedirs(wav_dir / "Pop")
    n_fft, hop = 32, 8
    t_slice = 127 * hop  # 128 frames
    w = synth_waveforms(1, t_samples=2 * t_slice, seed=0)[0]
    write_wav(str(wav_dir / "Pop" / "t0.wav"), w, 16000)

    cfg = PreprocConfig(genres="Pop", n_fft=n_fft, hop_length=hop,
                        chunk=t_slice / 16000, n_random=(2,), n_val=1,
                        wav_dir=str(wav_dir), out_dir=str(tmp_path / "out"),
                        device_stft=False, get_gid=True)
    written = compute_feature(cfg)
    assert os.path.exists(written["Pop"]["audio_train"])
    # --get_gid emits per-patch genre-index shards
    gids = np.load(written["Pop"]["gid_train"])
    assert gids.dtype == np.int32 and (gids == 0).all()
    n_train = len(np.load(written["Pop"]["audio_train"]))
    assert len(gids) == n_train


def test_medleydb_api_surface_pin():
    """Pin the exact medleydb surface _medleydb_tracks uses (VERDICT r3
    #7) — runnable without assets.

    Two layers: (a) our own source must not silently grow a dependency
    on a name missing from the manifest (every manifest name appears in
    the ingestion source, so the manifest is load-bearing); (b) when a
    REAL medleydb install exists, scan its source for the manifest
    names — API drift (a renamed attribute, a dropped kwarg) fails here
    instead of inside a real-asset production run.
    """
    import importlib.util
    import inspect

    import phasegen_tpu.data.preproc as pp

    src = inspect.getsource(pp._medleydb_tracks)
    for names in pp.MEDLEYDB_API_SURFACE.values():
        for n in names:
            assert n in src, f"manifest name {n!r} unused in ingestion src"

    if importlib.util.find_spec("medleydb") is None:
        pytest.skip("no real medleydb install in this image")
    import medleydb
    import medleydb.mix as mix

    for n in pp.MEDLEYDB_API_SURFACE["medleydb"]:
        assert hasattr(medleydb, n)
    for n in pp.MEDLEYDB_API_SURFACE["medleydb.mix"]:
        assert hasattr(mix, n)
    mt_src = inspect.getsource(medleydb.multitrack)
    for n in (pp.MEDLEYDB_API_SURFACE["MultiTrack"]
              + pp.MEDLEYDB_API_SURFACE["Stem"]):
        assert (f"self.{n}" in mt_src or f"def {n}" in mt_src), (
            f"MultiTrack/Track source no longer defines {n!r}")
    sig = inspect.signature(mix.mix_multitrack)
    for n in pp.MEDLEYDB_API_SURFACE["mix_multitrack_kwargs"]:
        assert n in sig.parameters


def test_mock_fixture_matches_api_manifest(monkeypatch, tmp_path):
    """The fake medleydb used across this file exposes exactly the
    manifest surface — so the mock tests actually exercise the pinned
    API shape, not a drifted private copy."""
    import phasegen_tpu.data.preproc as pp

    calls = []
    tr = _pop_track(tmp_path)
    _install_fake_medleydb(monkeypatch, [tr], calls)
    import medleydb
    import medleydb.mix as mix

    for n in pp.MEDLEYDB_API_SURFACE["medleydb"]:
        assert hasattr(medleydb, n)
    for n in pp.MEDLEYDB_API_SURFACE["medleydb.mix"]:
        assert hasattr(mix, n)
    for n in pp.MEDLEYDB_API_SURFACE["MultiTrack"]:
        assert hasattr(tr, n)
    stem = next(iter(tr.stems.values()))
    for n in pp.MEDLEYDB_API_SURFACE["Stem"]:
        assert hasattr(stem, n)
