"""bench.py orchestrator state machine (runs unattended at round end —
the judged artifact depends on this logic, so it gets direct unit tests
with the probe/measure legs stubbed)."""

import json

import pytest

import bench


@pytest.fixture()
def capture(monkeypatch):
    out = []
    monkeypatch.setattr("builtins.print",
                        lambda *a, **k: out.append(a[0] if a else ""))
    return out


def _res(value, fixed_ms, wall=60.0):
    return {"metric": "m", "value": value, "unit": "SNPs/s",
            "vs_baseline": 1.0, "fixed_ms_per_call": fixed_ms,
            "measure_wall_s": wall}


def test_happy_path_single_measure(monkeypatch, capture):
    monkeypatch.setattr(bench, "_probe_device", lambda: (True, "tpu"))
    monkeypatch.setattr(bench, "_run_measure",
                        lambda t, e=None: _res(1_200_000.0, 40.0))
    bench.orchestrate()
    d = json.loads(capture[-1])
    assert d["value"] == 1_200_000.0
    assert d["backend"] == "tpu"
    assert d["measure_attempts"] == 1  # good weather: no retry


def test_degraded_weather_retries_and_keeps_best(monkeypatch, capture):
    vals = iter([_res(300_000.0, 190.0), _res(900_000.0, 150.0),
                 _res(700_000.0, 180.0)])
    monkeypatch.setattr(bench, "_probe_device", lambda: (True, "tpu"))
    monkeypatch.setattr(bench, "_run_measure", lambda t, e=None: next(vals))
    monkeypatch.setattr(bench, "PROBE_RETRY_SLEEP_S", 0.0)
    bench.orchestrate()
    d = json.loads(capture[-1])
    assert d["value"] == 900_000.0  # best of the 3 degraded attempts
    assert d["measure_attempts"] == 3
    assert d["backend"] == "tpu"


def test_budget_exhausted_mid_retry_emits_best_tpu(monkeypatch, capture):
    import itertools

    times = itertools.count(0.0, step=bench.OUTAGE_BUDGET_S / 2 + 1)
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(times))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_probe_device", lambda: (True, "tpu"))
    monkeypatch.setattr(bench, "_run_measure",
                        lambda t, e=None: _res(500_000.0, 190.0))
    bench.orchestrate()
    d = json.loads(capture[-1])
    # degraded but real TPU number: never discarded for the CPU fallback
    assert d["value"] == 500_000.0 and d["backend"] == "tpu"


def test_outage_falls_back_to_labeled_cpu(monkeypatch, capture):
    import itertools

    times = itertools.count(0.0, step=bench.OUTAGE_BUDGET_S / 3 + 1)
    monkeypatch.setattr(bench.time, "monotonic", lambda: next(times))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench, "_probe_device", lambda: (False, "down"))
    calls = []

    def measure(t, env=None):
        calls.append(env)
        return _res(40_000.0, 5.0)

    monkeypatch.setattr(bench, "_run_measure", measure)
    bench.orchestrate()
    d = json.loads(capture[-1])
    assert d["backend"] == "cpu_fallback"
    assert d["value"] == 40_000.0
    assert d["fallback_reason"] == "tpu_relay_unreachable"
    # the fallback must route the platform override through JX_TPU_PLATFORM
    # (JAX_PLATFORMS is frozen by the environment's sitecustomize)
    assert calls[-1] == {"JX_TPU_PLATFORM": "cpu"}


def test_repeated_measure_failure_still_emits(monkeypatch, capture):
    monkeypatch.setattr(bench, "_probe_device", lambda: (True, "tpu"))
    monkeypatch.setattr(bench, "_run_measure",
                        lambda t, e=None: None if e is None
                        else _res(42_000.0, 5.0))
    monkeypatch.setattr(bench, "PROBE_RETRY_SLEEP_S", 0.0)
    bench.orchestrate()
    d = json.loads(capture[-1])
    assert d["value"] == 42_000.0
    assert d["backend"] == "cpu_fallback"
    assert d["fallback_reason"] == "tpu_measure_failed_repeatedly"
