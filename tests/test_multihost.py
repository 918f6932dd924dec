"""Multi-host helper tests (single-process semantics on the CPU mesh)."""

import jax
import pytest

from katsdpsigproc_tpu.parallel import mesh as pmesh, multihost


def test_initialize_single_host_noop():
    multihost.initialize(num_processes=1)  # must not raise


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pod_mesh_shapes():
    m = multihost.pod_mesh()
    assert m.shape[pmesh.BASELINE_AXIS] == jax.device_count()
    m2 = multihost.pod_mesh(channel_shards=2)
    assert m2.shape[pmesh.BASELINE_AXIS] == jax.device_count() // 2
    assert m2.shape[pmesh.CHANNEL_AXIS] == 2
    with pytest.raises(ValueError):
        multihost.pod_mesh(baseline_shards=3, channel_shards=2)


def test_process_summary():
    s = multihost.process_summary()
    assert "process 0/1" in s
