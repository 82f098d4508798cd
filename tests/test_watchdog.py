"""StallWatchdog: onset/recovery records for tunneled-run liveness."""

import json
import time


def _records(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_watchdog_records_stall_and_recovery(tmp_path):
    from phasegen_tpu.obs.watchdog import StallWatchdog

    wd = StallWatchdog(str(tmp_path), threshold_s=0.3, poll_s=0.1)
    wd.beat()
    time.sleep(0.8)  # silence past threshold -> onset record
    wd.beat()        # first beat after a stall -> recovery record
    wd.close()
    recs = _records(wd.path)
    events = [r["event"] for r in recs]
    assert events == ["stall", "recovered"], recs
    assert recs[1]["stalled_s"] >= 0.3


def test_watchdog_unrecovered_finalized_on_close(tmp_path):
    from phasegen_tpu.obs.watchdog import StallWatchdog

    wd = StallWatchdog(str(tmp_path), threshold_s=0.2, poll_s=0.05)
    wd.beat()
    time.sleep(0.5)
    wd.close()  # run dies inside the stall
    events = [r["event"] for r in _records(wd.path)]
    assert events == ["stall", "unrecovered"]


def test_watchdog_quiet_when_beating(tmp_path):
    import os

    from phasegen_tpu.obs.watchdog import StallWatchdog

    wd = StallWatchdog(str(tmp_path), threshold_s=0.5, poll_s=0.05)
    for _ in range(10):
        wd.beat()
        time.sleep(0.05)
    wd.close()
    assert not os.path.exists(wd.path)  # no false positives


def test_watchdog_unarmed_until_first_beat(tmp_path):
    """A long initial compile (no beats yet) must not be reported."""
    import os

    from phasegen_tpu.obs.watchdog import StallWatchdog

    wd = StallWatchdog(str(tmp_path), threshold_s=0.2, poll_s=0.05)
    time.sleep(0.6)  # silence before any beat: compiling, not stalled
    assert not os.path.exists(wd.path)
    wd.beat()
    wd.close()
    assert not os.path.exists(wd.path)


def test_liveness_probe_skipped_under_tests(monkeypatch):
    # conftest sets PHASEGEN_SKIP_LIVENESS (child probes would touch the
    # real TPU); with it set the probe must return instantly and not
    # spawn anything, even with an impossible timeout.
    from phasegen_tpu.obs.watchdog import device_liveness_probe

    device_liveness_probe(timeout_s=0.0)


def test_liveness_probe_raises_on_wedge(monkeypatch, tmp_path):
    # unset the skip and point the probe's child at a command that hangs:
    # simulate a wedged backend via a tiny timeout + slow child
    import phasegen_tpu.obs.watchdog as wd

    monkeypatch.delenv("PHASEGEN_SKIP_LIVENESS", raising=False)
    import subprocess
    import sys

    real_popen = subprocess.Popen

    def fake_popen(cmd, **kw):
        return real_popen([sys.executable, "-c", "import time; time.sleep(5)"],
                          **kw)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    import pytest

    with pytest.raises(RuntimeError, match="wedged"):
        wd.device_liveness_probe(timeout_s=0.2)


def test_liveness_probe_raises_on_fast_fail(monkeypatch):
    # The round-3 outage's second face: the backend REFUSES new clients
    # fast ("UNAVAILABLE: TPU backend setup/compile error"), so the probe
    # child exits non-zero well within the timeout. That is a DOWN
    # backend and must raise, not pass.
    import subprocess
    import sys

    import phasegen_tpu.obs.watchdog as wd

    monkeypatch.delenv("PHASEGEN_SKIP_LIVENESS", raising=False)
    real_popen = subprocess.Popen

    def fake_popen(cmd, **kw):
        return real_popen([sys.executable, "-c", "raise SystemExit(1)"],
                          **kw)

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    import pytest

    with pytest.raises(RuntimeError, match="refusing"):
        # generous timeout: the child only has to EXIT before it, and
        # this single-core host can take seconds to start an interpreter
        # under load
        wd.device_liveness_probe(timeout_s=60.0)


def test_wait_for_backend_retries_until_recovery(monkeypatch):
    # wait_for_backend keeps polling through probe failures and returns
    # on the first success; sleeps are stubbed out.
    import phasegen_tpu.obs.watchdog as wd

    calls = {"n": 0}

    def flaky_probe(timeout_s):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("backend down")

    monkeypatch.setattr(wd, "device_liveness_probe", flaky_probe)
    monkeypatch.setattr(wd.time, "sleep", lambda s: None)
    wd.wait_for_backend(max_wait_s=100.0, poll_s=1.0)
    assert calls["n"] == 3


def test_wait_for_backend_gives_up_at_deadline(monkeypatch):
    import pytest

    import phasegen_tpu.obs.watchdog as wd

    def dead_probe(timeout_s):
        raise RuntimeError("backend down")

    monkeypatch.setattr(wd, "device_liveness_probe", dead_probe)
    monkeypatch.setattr(wd.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="down"):
        wd.wait_for_backend(max_wait_s=0.0, poll_s=1.0)


def test_gate_backend_flag_roundtrip(monkeypatch):
    # add_wait_flag + gate_backend: 0 = no-op; >0 calls wait_for_backend.
    import argparse

    import phasegen_tpu.obs.watchdog as wd

    p = argparse.ArgumentParser()
    wd.add_wait_flag(p)
    called = []
    monkeypatch.setattr(
        wd, "wait_for_backend",
        lambda w, poll_s=300.0, park_on_stop=False: called.append(w))
    wd.gate_backend(p.parse_args([]))
    assert called == []
    wd.gate_backend(p.parse_args(["--wait_backend", "3600"]))
    assert called == [3600.0]


def test_wait_flag_default_override():
    # bench.py opts into a recovery-gated start by default (the driver
    # runs it unattended at the end of the round); --wait_backend 0 must
    # restore fail-fast.
    import argparse

    import phasegen_tpu.obs.watchdog as wd

    p = argparse.ArgumentParser()
    wd.add_wait_flag(p, default=900.0)
    assert p.parse_args([]).wait_backend == 900.0
    assert p.parse_args(["--wait_backend", "0"]).wait_backend == 0.0


# --- cooperative chip yield (stop file) --------------------------------------


def test_stop_file_env_semantics(monkeypatch, tmp_path):
    import phasegen_tpu.obs.watchdog as wd

    # conftest disables the mechanism for the suite
    assert wd.stop_file_path() == ""
    assert not wd.stop_requested()
    stop = tmp_path / "stop"
    monkeypatch.setenv("PHASEGEN_STOP_FILE", str(stop))
    assert wd.stop_file_path() == str(stop)
    assert not wd.stop_requested()
    stop.write_text("x")
    assert wd.stop_requested()
    # unset env -> the documented shared default path
    monkeypatch.delenv("PHASEGEN_STOP_FILE")
    assert wd.stop_file_path() == wd.DEFAULT_STOP_FILE


def test_request_queue_yield_noop_without_queues(monkeypatch, tmp_path):
    """No live queue -> returns immediately WITHOUT touching the stop
    file (a stray stop file would park the next queue campaign)."""
    import phasegen_tpu.obs.watchdog as wd

    stop = tmp_path / "stop"
    monkeypatch.setenv("PHASEGEN_STOP_FILE", str(stop))
    # stale pid file: the REAL pid of an already-exited subprocess (a
    # hardcoded large pid could collide with a live process on hosts
    # with pid_max >= 4194304)
    import subprocess
    import sys

    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait(timeout=30)
    (tmp_path / "r3dead.pid").write_text(f"{p.pid}\n")
    wd.request_queue_yield(wait_s=5, poll_s=0.1,
                           pid_globs=(str(tmp_path / "*.pid"),))
    assert not stop.exists()


def test_request_queue_yield_parks_live_queue(monkeypatch, tmp_path):
    """A live queue process (recognized by cmdline marker) gets the stop
    file touched and is awaited until it exits."""
    import subprocess
    import sys
    import time

    import phasegen_tpu.obs.watchdog as wd

    stop = tmp_path / "stop"
    monkeypatch.setenv("PHASEGEN_STOP_FILE", str(stop))
    # child: a stand-in queue that parks when the stop file appears;
    # the extra argv token makes its cmdline match a queue marker
    code = ("import os, sys, time\n"
            "t0 = time.time()\n"
            "while not os.path.exists(sys.argv[1]) and time.time()-t0 < 30:\n"
            "    time.sleep(0.05)\n")
    p = subprocess.Popen([sys.executable, "-c", code, str(stop),
                          "ckpt_select"])
    try:
        (tmp_path / "r3test.pid").write_text(f"{p.pid}\n")
        wd.request_queue_yield(wait_s=20, poll_s=0.1,
                               pid_globs=(str(tmp_path / "*.pid"),))
        assert stop.exists()
        p.wait(timeout=10)
        assert p.poll() is not None
    finally:
        if p.poll() is None:
            p.terminate()


def test_request_queue_yield_escalates_sigterm(monkeypatch, tmp_path):
    """A queue that ignores the stop file gets SIGTERM'd (exact pid tree,
    /proc-verified) after the cooperative grace window — the round-3
    failure mode where bench waited 900 s against a live queue and the
    driver window expired (VERDICT r3 #1)."""
    import subprocess
    import sys
    import time

    import phasegen_tpu.obs.watchdog as wd

    stop = tmp_path / "stop"
    monkeypatch.setenv("PHASEGEN_STOP_FILE", str(stop))
    # a stand-in queue that NEVER honors the stop file (sleeps 60 s) but
    # dies on SIGTERM (default handler); marker token in argv
    p = subprocess.Popen([sys.executable, "-c",
                          "import time; time.sleep(60)", "ckpt_select"])
    try:
        (tmp_path / "r4test.pid").write_text(f"{p.pid}\n")
        t0 = time.time()
        wd.request_queue_yield(wait_s=1.0, poll_s=0.2,
                               pid_globs=(str(tmp_path / "*.pid"),),
                               escalate_s=15.0)
        assert time.time() - t0 < 30
        p.wait(timeout=10)
        assert p.returncode != 0  # killed by signal, not clean exit
    finally:
        if p.poll() is None:
            p.terminate()


def test_wait_for_backend_parks_on_stop(monkeypatch, tmp_path):
    """park_on_stop: a queue-stage tool waiting out an outage exits
    cleanly the moment a chip yield is requested (ADVICE r3 #3)."""
    import pytest

    import phasegen_tpu.obs.watchdog as wd

    stop = tmp_path / "stop"
    stop.write_text("x")
    monkeypatch.setenv("PHASEGEN_STOP_FILE", str(stop))

    def probe_down(timeout_s):
        raise RuntimeError("backend down")

    monkeypatch.setattr(wd, "device_liveness_probe", probe_down)
    with pytest.raises(SystemExit) as ei:
        wd.wait_for_backend(max_wait_s=100.0, poll_s=0.1,
                            park_on_stop=True)
    assert ei.value.code == 0
    # without park_on_stop the same outage raises at the deadline
    with pytest.raises(RuntimeError):
        wd.wait_for_backend(max_wait_s=0.0, poll_s=0.1)


def test_train_loop_yields_on_time_budget(tmp_path, capsys):
    """--max_seconds: the loop checkpoints and exits cleanly once the
    wall-clock budget is exhausted — the queue-window alternative to
    `timeout`, whose mid-step SIGTERM can wedge the tunneled backend."""
    import os

    import numpy as np

    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data import synth_dataset
    from phasegen_tpu.train.loop import train

    n_fft, hop, t_samp = 32, 8, 127 * 8
    shard = synth_dataset(8, n_fft=n_fft, hop=hop, t_samples=t_samp)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:2])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=4000, n_fft=n_fft, hop=hop,
        val_every=1000, ckpt_every=1000, gl_iters=2, max_steps=500,
        max_seconds=1e-3,
        compute_dtype="float32", log_media=False, data_parallel=False,
        device_data_gb=0.0, prefetch=0, ckpt_light=True, scan_steps=1,
        final_ckpt=False,
    )
    train(cfg)
    out = capsys.readouterr().out
    assert "Time budget 0s exhausted; yielding at step 1" in out
    # far short of max_steps=500, but the yielded step is checkpointed
    assert os.path.exists(tmp_path / "run" / "ckpt_1_light.npz")


def test_train_loop_stops_gracefully_on_stop_file(monkeypatch, tmp_path,
                                                  capsys):
    """The training loop checkpoints the current step and exits cleanly
    when the cooperative stop file appears (chip handoff at round end)."""
    import os

    import numpy as np

    from phasegen_tpu.config import TrainConfig
    from phasegen_tpu.data import synth_dataset
    from phasegen_tpu.train.loop import train

    stop = tmp_path / "stop"
    stop.write_text("yield\n")
    monkeypatch.setenv("PHASEGEN_STOP_FILE", str(stop))

    n_fft, hop, t_samp = 32, 8, 127 * 8
    shard = synth_dataset(8, n_fft=n_fft, hop=hop, t_samples=t_samp)
    np.save(tmp_path / "train.npy", shard)
    np.save(tmp_path / "val.npy", shard[:2])
    cfg = TrainConfig(
        log_dir=str(tmp_path / "run"),
        train_paths=(str(tmp_path / "train.npy"),),
        val_paths=(str(tmp_path / "val.npy"),),
        batch_size=4, val_batch_size=2, sr=4000, n_fft=n_fft, hop=hop,
        val_every=100, ckpt_every=100, gl_iters=2, max_steps=50,
        compute_dtype="float32", log_media=False, data_parallel=False,
        device_data_gb=0.0, prefetch=0, ckpt_light=True, scan_steps=1,
        final_ckpt=False,
    )
    train(cfg)
    out = capsys.readouterr().out
    assert "Stop file detected; yielding at step 1" in out
    # far short of max_steps=50, but the yielded step is checkpointed
    assert os.path.exists(tmp_path / "run" / "ckpt_1_light.npz")
