"""Tests for bench.py's TPU-probe guard (the part that must work when the
axon tunnel is DOWN — the measurement body itself needs the real chip and
is exercised by the driver's round-end bench run).

The tunnel failure mode is an in-process jax.devices() that blocks forever
(no error), so bench probes in a killable subprocess with retries; these
tests stub subprocess.run / time.sleep and assert the retry policy and the
diagnosable-JSON exit path.
"""
import json
import subprocess
import sys

import pytest

import bench


class _Result:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def test_probe_ok_first_try(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _Result(0, "ok\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._wait_for_tpu() is True
    assert len(calls) == 1


def test_probe_fast_failure_does_not_retry(monkeypatch):
    """rc!=0 means a broken environment (import error), not a tunnel hang:
    retrying cannot help, so the probe gives up immediately."""
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _Result(1, "", "ImportError: libtpu")

    slept = []
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench._wait_for_tpu(attempts=5) is False
    assert len(calls) == 1
    assert slept == []


def test_probe_hang_retries_then_gives_up(monkeypatch):
    """A hung tunnel (TimeoutExpired) is retried `attempts` times with
    sleeps between consecutive attempts (none after the last)."""
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    slept = []
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    assert bench._wait_for_tpu(attempts=3, sleep_between=7) is False
    assert len(calls) == 3
    assert slept == [7, 7]


def test_probe_recovers_mid_outage(monkeypatch):
    """Tunnel comes back on the third attempt -> True, no further probes."""
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] < 3:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return _Result(0, "ok\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_tpu(attempts=8) is True
    assert state["n"] == 3


def test_probe_window_rides_out_a_long_outage():
    """The default retry window must cover a multi-ten-minute tunnel outage
    (the observed failure mode at round-end bench time)."""
    import inspect
    sig = inspect.signature(bench._wait_for_tpu)
    attempts = sig.parameters["attempts"].default
    probe_timeout = sig.parameters["probe_timeout"].default
    sleep_between = sig.parameters["sleep_between"].default
    worst_case = attempts * probe_timeout + (attempts - 1) * sleep_between
    assert worst_case >= 15 * 60


def test_main_emits_error_json_when_probe_fails(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_wait_for_tpu", lambda: False)
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 1
    line = capsys.readouterr().out.strip()
    payload = json.loads(line)
    assert payload["value"] is None
    assert payload["vs_baseline"] is None
    assert "error" in payload
    assert "metric" in payload and "unit" in payload


def test_probe_subprocess_uses_this_interpreter(monkeypatch):
    """The probe must run the same interpreter (same jax install) or the
    result says nothing about the bench's own backend."""
    seen = {}

    def fake_run(cmd, **kw):
        seen["cmd"] = cmd
        return _Result(0, "ok\n")

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._wait_for_tpu() is True
    assert seen["cmd"][0] == sys.executable
