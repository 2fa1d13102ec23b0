"""bench.py outage fallback: the driver runs bench.py unconditionally at
round end; when the remote-TPU tunnel is down it HANGS rather than erroring
(observed 2026-08-17), so bench.py probes the device in a bounded subprocess
and falls back to the last-known-good record, clearly marked stale."""

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fallback_emits_stale_lkg(monkeypatch, tmp_path, capsys):
    bench = _load_bench()
    lkg = {"metric": "e2e_inference_throughput", "value": 12.3,
           "unit": "point_clouds/sec/chip", "vs_baseline": 0.41,
           "input": "real_asset_45780"}
    lkg_path = tmp_path / "BENCH_LKG.json"
    lkg_path.write_text(json.dumps(lkg))
    monkeypatch.setattr(bench, "LKG_PATH", str(lkg_path))
    monkeypatch.setattr(bench, "_device_reachable", lambda: False)
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == lkg["value"]
    assert out["vs_baseline"] == lkg["vs_baseline"]
    assert out["stale"] is True
    assert "unreachable" in out["note"]


def test_fallback_without_lkg_exits_nonzero(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setattr(bench, "LKG_PATH", str(tmp_path / "missing.json"))
    monkeypatch.setattr(bench, "_device_reachable", lambda: False)
    with pytest.raises(SystemExit):
        bench.main()


def test_probe_times_out_on_hang(tmp_path):
    """A hanging tunnel must yield False within the bound, not wedge."""
    import stat
    import sys as _sys
    import time

    hang = tmp_path / "hang.sh"
    hang.write_text("#!/bin/sh\nsleep 30\n")
    hang.chmod(hang.stat().st_mode | stat.S_IXUSR)
    bench = _load_bench()
    real = _sys.executable
    t0 = time.monotonic()
    try:
        _sys.executable = str(hang)  # probe subprocess ignores -c and hangs
        assert bench._device_reachable(timeout_s=1) is False
    finally:
        _sys.executable = real
    assert time.monotonic() - t0 < 10


def test_probe_error_yields_false():
    """A crashing probe (bad interpreter) is 'unreachable', not an exception."""
    import sys as _sys

    bench = _load_bench()
    real = _sys.executable
    try:
        _sys.executable = "/bin/false"
        assert bench._device_reachable(timeout_s=5) is False
    finally:
        _sys.executable = real


def test_committed_lkg_matches_schema():
    path = os.path.join(REPO, "BENCH_LKG.json")
    rec = json.load(open(path))
    assert rec["metric"] == "e2e_inference_throughput"
    assert rec["unit"] == "point_clouds/sec/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
