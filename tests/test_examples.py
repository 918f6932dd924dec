"""The doc examples are runnable (reference: doc/user/examples/test_triple.py
runs the tutorial example under the pytest plugin)."""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "doc" / "examples").glob("*.py")
)
# The sharded-flagger example compiles a multi-device program (~17 s).
_PARAMS = [
    pytest.param(p, marks=[pytest.mark.slow] if p.stem == "sharded_flagger" else [])
    for p in EXAMPLES
]


@pytest.mark.parametrize("example", _PARAMS, ids=lambda p: p.stem)
def test_example_runs(example):
    repo_root = example.parent.parent.parent
    env = dict(os.environ)
    env["KATSDPSIGPROC_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = str(repo_root) + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, str(example)],
        cwd=str(example.parent.parent.parent),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr
