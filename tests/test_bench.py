"""bench.py orchestration: budget skipping, headline re-emission, hangs.

Round 4's driver capture timed out mid-suite (BENCH_r04.json rc=124)
and lost the headline; these tests pin the budget-aware main() so a
wall-clock-limited capture still produces a complete record ending with
the headline line.  Subprocesses and the clock are stubbed — no TPU.
"""

from __future__ import annotations

import importlib.util
import io
import json
import subprocess as real_subprocess
import sys
import types

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    return mod


def _run(bench, monkeypatch, durations, budget, rcs=None):
    """Drive bench.main() with stubbed subprocesses + fake clock.

    Returns (ran_names, emitted_json_lines, exit_code)."""
    clock = [0.0]
    calls = []

    class FakeProc:
        def __init__(self, name):
            self.returncode = (rcs or {}).get(name, 0)
            self.stdout = json.dumps(
                {"metric": f"{name}_metric", "value": 1.0, "unit": "u",
                 "vs_baseline": 0.5}) + "\n"
            self.stderr = ""

    def fake_run(cmd, **kw):
        name = cmd[-1]
        timeout = kw.get("timeout")
        calls.append(name)
        if timeout is not None and durations[name] > timeout:
            clock[0] += timeout
            raise real_subprocess.TimeoutExpired(cmd, timeout)
        clock[0] += durations[name]
        return FakeProc(name)

    fake_sub = types.SimpleNamespace(
        run=fake_run, TimeoutExpired=real_subprocess.TimeoutExpired)
    monkeypatch.setitem(sys.modules, "subprocess", fake_sub)
    monkeypatch.setattr(bench, "time", types.SimpleNamespace(
        monotonic=lambda: clock[0], perf_counter=lambda: clock[0]))
    monkeypatch.setenv("STEELJAX_BENCH_BUDGET_S", str(budget))

    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    code = 0
    try:
        bench.main()
    except SystemExit as exc:
        code = exc.code or 0
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()
             if ln.startswith("{")]
    return calls, lines, code


# Realistic warm-cache durations (round-5 final capture profile).
_DUR = {"cornell": 30, "parity": 360, "hybrid": 130, "foliage": 760,
        "foliage_solid": 490, "stress": 430, "stress_tex": 420}


def test_budget_skips_tail_and_reemits_headline(bench_mod, monkeypatch):
    ran, lines, code = _run(bench_mod, monkeypatch, dict(_DUR), 1500)
    assert ran == ["cornell", "parity", "hybrid", "foliage"]
    assert [l["metric"] for l in lines if l.get("skipped")] == \
        ["foliage_solid", "stress", "stress_tex"]
    assert lines[-1]["metric"] == "cornell_metric"  # headline last
    assert code == 0


def test_headline_always_runs(bench_mod, monkeypatch):
    dur = dict(_DUR, cornell=50)
    ran, lines, code = _run(bench_mod, monkeypatch, dur, budget=10)
    assert ran == ["cornell"]
    assert sum(1 for l in lines if l.get("skipped")) == 6
    assert lines[-1]["metric"] == "cornell_metric"
    assert code == 0


def test_hung_config_is_bounded(bench_mod, monkeypatch):
    dur = dict(_DUR, hybrid=10 ** 9)
    ran, lines, code = _run(bench_mod, monkeypatch, dur, 1500)
    # The hang is bounded at est*2.5; the cheap stress config still
    # fits the leftover budget and runs (backfill, not abort).
    assert ran == ["cornell", "parity", "hybrid", "stress"]
    hyb = [l for l in lines if l.get("metric") == "hybrid"
           and l.get("skipped")]
    assert hyb and hyb[0]["reason"] == "timeout"
    assert lines[-1]["metric"] == "cornell_metric"
    assert code == 0  # a hung non-gate config must not fail the capture


def test_parity_failure_fails_run_after_full_record(bench_mod, monkeypatch):
    ran, lines, code = _run(bench_mod, monkeypatch, dict(_DUR), 10 ** 6,
                            rcs={"parity": 1})
    assert ran == list(bench_mod._ORDER)  # record still completes
    assert lines[-1]["metric"] == "cornell_metric"
    assert code == 1  # ...but the kernel gate still fails the run
