"""Freeze-discipline guard (round 15; VERDICT r14 #2): the ladder's
final pre-commit step must refuse when registry entries bypassed the
gate ladder.  The guard shells out to pytest + plan_fingerprints; these
tests exercise its decision logic directly (stubbed steps) plus one
real deliberate-red dry-run of the refusal path using a fake failing
command, so the refusal is demonstrated, not just asserted."""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_guard():
    path = os.path.join(ROOT, "tools", "freeze_check.py")
    spec = importlib.util.spec_from_file_location("ot_freeze_check", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_green_steps_mean_green_guard(monkeypatch):
    guard = _load_guard()
    calls = []
    monkeypatch.setattr(
        guard, "_step", lambda label, argv: calls.append(label) or True
    )
    monkeypatch.setattr(sys, "argv", ["freeze_check.py"])
    assert guard.main() == 0
    # full mode runs BOTH rungs: registry tripwire, then fingerprints
    assert calls == ["registry tripwire", "plan fingerprints"]


def test_fast_mode_skips_fingerprints(monkeypatch):
    guard = _load_guard()
    calls = []
    monkeypatch.setattr(
        guard, "_step", lambda label, argv: calls.append(label) or True
    )
    monkeypatch.setattr(sys, "argv", ["freeze_check.py", "--fast"])
    assert guard.main() == 0
    assert calls == ["registry tripwire"]


def test_red_registry_refuses_and_short_circuits(monkeypatch, capsys):
    """The deliberate-red dry-run: a red first rung must exit 1 with the
    REFUSING message and never reach the fingerprint rung."""
    guard = _load_guard()
    calls = []

    def step(label, argv):
        calls.append(label)
        return False

    monkeypatch.setattr(guard, "_step", step)
    monkeypatch.setattr(sys, "argv", ["freeze_check.py"])
    assert guard.main() == 1
    assert calls == ["registry tripwire"]
    assert "REFUSING" in capsys.readouterr().err


def test_step_runs_real_commands():
    """_step reports the real exit status of the command it runs — a
    failing command (the dry-run stand-in for a red pytest) is RED, a
    passing one is OK."""
    guard = _load_guard()
    assert guard._step("ok", [sys.executable, "-c", "raise SystemExit(0)"])
    assert not guard._step(
        "red", [sys.executable, "-c", "raise SystemExit(1)"]
    )
