"""Smoke tests for bench.py — the driver runs it at the end of every round,
so its CLI contract (exit 0, ONE parseable JSON line per metric on stdout)
must never regress."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _run(*args):
    env = dict(os.environ)
    env["KATSDPSIGPROC_TPU_PLATFORM"] = "cpu"
    # Subprocess analogue of the pytest plugin's autotune stubbing: a table
    # miss must not trigger a measured search (the honest scan harness is
    # minutes-slow on CPU at production shapes — these are CLI smoke tests).
    env["KATSDPSIGPROC_TPU_TUNE_STUB"] = "1"
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), *args],
        cwd=str(ROOT), env=env, capture_output=True, text=True, timeout=560,
    )


def _json_lines(stdout: str):
    lines = [json.loads(s) for s in stdout.strip().splitlines() if s.strip()]
    for rec in lines:
        assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}, rec
        assert rec["value"] > 0
    return lines


@pytest.mark.slow
def test_headline_small():
    r = _run("--iters", "2", "--channels", "512", "--baselines", "64",
             "--pols", "1", "--slab", "32")
    assert r.returncode == 0, r.stderr[-2000:]
    (rec,) = _json_lines(r.stdout)
    assert rec["metric"] == "rfi_flagger_visibilities_per_second_per_chip"
    assert "parity" in r.stderr  # mask-parity assertion ran
    assert rec["pols"] == 1 and rec["rows"] == 64
    assert "onepol" not in rec  # side record only for pol-flattened dumps
    assert 0 < rec["vs_compute_roofline"] < 10


@pytest.mark.slow
def test_headline_pols():
    """--pols flattens polarizations into baseline rows (config 5's 4-pol
    shape); the JSON records the flattening."""
    r = _run("--iters", "2", "--channels", "512", "--baselines", "32",
             "--pols", "2", "--slab", "32", "--skip-parity")
    assert r.returncode == 0, r.stderr[-2000:]
    (rec,) = _json_lines(r.stdout)
    assert rec["pols"] == 2 and rec["rows"] == 64
    # the 1-pol side record rides along (per-vis scale invariance evidence)
    assert rec["onepol"]["rows"] == 32
    assert rec["onepol"]["vis_per_second"] > 0


def test_probe_outage():
    """A dead tunnel must abort with exit 3 AFTER waiting through every
    retry window — not hang forever, and not give up on the first window
    (rounds 1 and 3 both lost their driver-captured bench record to a
    single-probe abort on a transiently-down tunnel)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    env["KATSDPSIGPROC_TPU_PLATFORM"] = "cpu"
    env["KATSDPSIGPROC_TPU_BENCH_FORCE_OUTAGE"] = "1"
    env["KATSDPSIGPROC_TPU_BENCH_PROBE_SECS"] = "0.2"
    env["KATSDPSIGPROC_TPU_BENCH_PROBE_RETRY_SECS"] = "0.2"
    r = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--iters", "1"],
        cwd=str(ROOT), env=env, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 3, (r.returncode, r.stderr[-2000:])
    assert r.stdout.strip() == ""  # no JSON record on an outage
    # all three windows were waited through before aborting
    assert "window 1/3" in r.stderr and "window 3/3" in r.stderr
    assert "device unreachable" in r.stderr


@pytest.mark.slow
def test_config2():
    r = _run("--config", "2", "--iters", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json_lines(r.stdout)
    assert {rec["metric"] for rec in recs} == {
        "percentile5_64x4k_elements_per_second",
        "maskedsum_4kx64_elements_per_second",
    }
