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
    monkeypatch.setattr(wd, "wait_for_backend",
                        lambda w, poll_s=300.0: called.append(w))
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
