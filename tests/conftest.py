"""Test configuration.

Runs everything on a virtual 8-device CPU mesh so that sharding/collective
paths are exercised without TPU hardware (SURVEY.md §4 "Multi-node
testing").  Must configure the environment before JAX is imported.
"""

import os

# Force-set (the ambient environment may pin JAX_PLATFORMS to a TPU plugin;
# unit tests always run on the virtual CPU mesh). Set
# KATSDPSIGPROC_TPU_TEST_PLATFORM to override, e.g. to run tests on TPU.
os.environ["JAX_PLATFORMS"] = os.environ.get("KATSDPSIGPROC_TPU_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

pytest_plugins = ["katsdpsigproc_tpu.pytest_plugin"]
