"""Test configuration.

Runs everything on a virtual 8-device CPU mesh so that sharding/collective
paths are exercised without TPU hardware (SURVEY.md §4 "Multi-node
testing").  The ambient environment may pin JAX_PLATFORMS to a TPU plugin
and may import jax before this file runs (sitecustomize), so the platform
must be forced through jax.config, not just os.environ.  Set
KATSDPSIGPROC_TPU_TEST_PLATFORM to override (e.g. to run the suite on TPU).
"""

import os

_platform = os.environ.get("KATSDPSIGPROC_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

pytest_plugins = ["katsdpsigproc_tpu.pytest_plugin"]
