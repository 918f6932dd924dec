"""Smoke tests for the benchmark scripts (reference: scripts/*.py drivers)."""

import os
import pathlib
import subprocess
import sys

import pytest

SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"


def _run(script, *args):
    env = dict(os.environ)
    env["KATSDPSIGPROC_TPU_PLATFORM"] = "cpu"
    env["KATSDPSIGPROC_TPU_TUNE_DB"] = "/tmp/test_scripts_tune.json"
    return subprocess.run(
        [sys.executable, str(SCRIPTS / script), *args],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(SCRIPTS.parent),
    )


def test_rfiflagtest_1d():
    r = _run("rfiflagtest.py", "--channels", "256", "--baselines", "32")
    assert r.returncode == 0, r.stderr
    assert "Mask mismatches: 0" in r.stderr


@pytest.mark.slow
def test_rfiflagtest_2d():
    r = _run("rfiflagtest.py", "--time", "48", "--channels", "300", "--baselines", "2")
    assert r.returncode == 0, r.stderr
    assert "2-D flagger" in r.stderr


def test_transposetest():
    r = _run("transposetest.py", "--rows", "96", "--cols", "160", "--iters", "2")
    assert r.returncode == 0, r.stderr


def test_percentiletest():
    r = _run("percentiletest.py", "--rows", "64", "--cols", "100", "--iters", "2")
    assert r.returncode == 0, r.stderr
    assert "exact match" in r.stderr


@pytest.mark.parametrize("amplitudes", [False, True])
def test_maskedsumtest(amplitudes):
    args = ["--rows", "64", "--cols", "100", "--iters", "2"]
    if amplitudes:
        args.append("--amplitudes")
    r = _run("maskedsumtest.py", *args)
    assert r.returncode == 0, r.stderr


def test_maskedsumabstest_alias():
    r = _run("maskedsumabstest.py", "--rows", "64", "--cols", "100", "--iters", "2")
    assert r.returncode == 0, r.stderr


@pytest.mark.parametrize("engine", ["xla", "hybrid", "pallas", "pallas_dma",
                                    "pallas_dma_amp"])
def test_rfiflagtest_engines(engine):
    r = _run("rfiflagtest.py", "--channels", "256", "--baselines", "32",
             "--engine", engine)
    assert r.returncode == 0, r.stderr
    assert "Mask mismatches: 0" in r.stderr


def test_api_index_fresh():
    r = _run("gen_api_index.py", "--check")
    assert r.returncode == 0, r.stderr


@pytest.mark.slow
def test_multichip_bench():
    """The multi-chip scaling harness runs end-to-end on the CPU mesh."""
    import json

    r = _run("multichip_bench.py", "--channels", "512", "--baselines", "64",
             "--iters", "2", "--slab", "32", "--bb", "8", "--engine", "both",
             "--channel-shards", "2")
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 2, r.stdout + r.stderr
    for ln in lines:
        rec = json.loads(ln)
        assert rec["metric"] == "multichip_scaling_efficiency"
        assert rec["n_devices"] == 8
        assert 0 < rec["value"] < 10


@pytest.mark.slow
def test_roofline_skeleton_interpret():
    """The floor-evidence harness (skeleton/model reconciliation) must
    keep running — in interpret mode the ratio is meaningless but the
    inventory construction, the DMA loop plumbing, and the model lookup
    are all exercised."""
    r = _run("roofline_skeleton.py", "--interpret", "--slab", "16",
             "--bb", "8", "--channels", "512", "--iters", "2", "--reps", "1")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "skeleton/model" in r.stdout


@pytest.mark.slow
def test_widefold_ab_interpret():
    """The wide-fold A/B protocol script parity-checks its legs even in
    interpret mode (tiny shapes; timings are not meaningful on CPU)."""
    r = _run("widefold_ab.py", "--rounds", "1", "--iters", "2",
             "--slab", "16", "--channels", "512")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "medians" in r.stdout
