"""The public legacy test-helper module (reference test/test_accel.py:26-122)."""

import unittest

import pytest

from katsdpsigproc_tpu.test import test_accel as legacy
from katsdpsigproc_tpu.utils import backend, tune


def test_device_test_injects_context_and_stubs_autotune():
    seen = {}

    @legacy.device_test
    def my_test(context, device):
        seen["context"] = context
        seen["device"] = device
        # autotuning is stubbed to the deterministic test= values
        seen["tuning"] = tune.autotuner_impl({"wgs": 7}, None)

    my_test()
    assert isinstance(seen["context"], backend.DeviceContext)
    assert seen["device"] is seen["context"].device
    assert seen["tuning"] == {"wgs": 7}
    # the stub is removed outside the test
    assert tune.autotuner_impl is not tune.stub_autotuner


def test_device_test_async():
    import asyncio

    seen = {}

    @legacy.device_test
    async def my_test(context, device):
        seen["context"] = context

    asyncio.run(my_test())
    assert isinstance(seen["context"], backend.DeviceContext)


def test_tpu_test_skips_on_cpu():
    @legacy.device_test
    @legacy.tpu_test
    def my_test(context, device):  # pragma: nocover - skipped on CPU
        raise AssertionError("should have been skipped")

    # test runs under the CPU conftest, so the TPU guard must skip
    legacy._prepare_device_test()
    if legacy._test_context.platform in ("tpu", "axon"):  # pragma: nocover
        pytest.skip("running on a real TPU")
    with pytest.raises(unittest.SkipTest):
        my_test()


def test_force_autotune():
    seen = {}

    @legacy.force_autotune
    def my_test():
        seen["impl"] = tune.autotuner_impl

    my_test()
    assert seen["impl"] is tune.force_autotuner


def test_decorators_not_collected():
    assert legacy.device_test.__test__ is False
    assert legacy.tpu_test.__test__ is False
    assert legacy.force_autotune.__test__ is False
