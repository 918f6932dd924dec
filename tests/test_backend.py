"""Device discovery tests (reference: accel.py device selection logic)."""

import jax
import pytest

from katsdpsigproc_tpu.utils import backend


def test_all_devices():
    assert len(backend.all_devices()) >= 1


def test_env_pinning(monkeypatch):
    devices = backend.all_devices()
    monkeypatch.setenv("KATSDPSIGPROC_TPU_DEVICE", "0")
    assert backend.candidate_devices() == [devices[0]]
    monkeypatch.setenv("KATSDPSIGPROC_TPU_DEVICE", str(len(devices)))
    with pytest.raises(IndexError):
        backend.candidate_devices()


def test_device_filter():
    assert backend.candidate_devices(lambda d: False) == []
    with pytest.raises(RuntimeError, match="No matching device"):
        backend.create_some_context(device_filter=lambda d: False)


def test_create_some_context_and_put():
    ctx = backend.create_some_context()
    assert ctx.platform == jax.devices()[0].platform
    import jax.numpy as jnp

    x = ctx.put(jnp.ones(4))
    assert x.devices() == {ctx.device}


def test_device_kind_key():
    platform, kind = backend.device_kind_key()
    assert isinstance(platform, str) and isinstance(kind, str)


def test_command_queue_fixture(command_queue, context):
    """Reference parity: the command_queue fixture is the placement context
    (queues are subsumed by XLA async dispatch)."""
    assert command_queue is context


def test_create_some_context_interactive(monkeypatch):
    """Reference parity (accel.py:349-361): interactive + tty + multiple
    candidates prompts for an index; invalid selections raise RuntimeError."""
    import sys

    devs = backend.all_devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
    monkeypatch.setattr("builtins.input", lambda prompt="": "1")
    ctx = backend.create_some_context(interactive=True, devices=devs)
    assert ctx.device == devs[1]
    for bad in ("-1", "notanumber", str(len(devs))):
        monkeypatch.setattr("builtins.input", lambda prompt="", b=bad: b)
        with pytest.raises(RuntimeError):
            backend.create_some_context(interactive=True, devices=devs)
