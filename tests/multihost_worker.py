"""Worker for the two-process jax.distributed test (see test_multihost.py).

Each process owns 2 virtual CPU devices; the pair forms a 4-device global
mesh.  The worker runs the sharded flagger on the (baseline × channel)
global mesh and checks the gathered mask against the host oracle — the
same parity contract as the single-process tests, across a real process
boundary.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # 2 local devices per process, regardless of any inherited XLA_FLAGS
    # (the pytest parent forces 8).
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.experimental import multihost_utils

    from katsdpsigproc_tpu.models.rfi import host as rfi_host
    from katsdpsigproc_tpu.parallel import flagger as pflagger, mesh as pmesh, multihost

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    print(multihost.process_summary(), flush=True)

    m = multihost.pod_mesh(baseline_shards=2, channel_shards=nproc)

    rs = np.random.RandomState(seed=7)  # same data in every process
    channels, baselines = 128, 8
    vis = (rs.standard_normal((channels, baselines))
           + 1j * rs.standard_normal((channels, baselines))).astype(np.complex64)
    vis[40, :] *= 60.0  # planted spike

    fn = pflagger.make_sharded_flagger(m, width=13, n_sigma=11.0, threshold="sum")
    # Every process passes the full (replicated) dump; pmesh.shard gives
    # each device its shard across the process boundary.
    sharded_vis = pmesh.shard(m, vis)

    flags = fn(sharded_vis)
    gathered = multihost_utils.process_allgather(flags, tiled=True)

    host_flagger = rfi_host.FlaggerHost(
        rfi_host.BackgroundMedianFilterHost(13),
        rfi_host.NoiseEstMADHost(),
        rfi_host.ThresholdSumHost(11.0),
    )
    expected = host_flagger(np.abs(vis))
    mism = int((np.asarray(gathered) != expected).sum())
    assert gathered.shape == expected.shape, (gathered.shape, expected.shape)
    assert mism == 0, f"{mism} mask mismatches vs host oracle"
    assert expected.any(), "planted spike produced no flags"

    # Channel axis SPANNING the process boundary: a 1x4 (baseline x
    # channel) mesh puts devices of both processes on the channel axis,
    # so the collective bitwise rank search (noise estimate) and the halo
    # exchanges cross processes (VERDICT.md round-1 item 9).
    m_chan = multihost.pod_mesh(baseline_shards=1, channel_shards=2 * nproc)
    fn_chan = pflagger.make_sharded_flagger(m_chan, width=13, n_sigma=11.0,
                                            threshold="sum")
    flags_chan = fn_chan(pmesh.shard(m_chan, vis))
    gathered_chan = multihost_utils.process_allgather(flags_chan, tiled=True)
    mism_chan = int((np.asarray(gathered_chan) != expected).sum())
    assert mism_chan == 0, (
        f"{mism_chan} mask mismatches vs host oracle (channel axis across processes)"
    )

    # 2-D flagger across the same two processes (baselines sharded).
    from katsdpsigproc_tpu.models.rfi import twodflag

    shape = (24, 64, 8)
    cube = (rs.standard_normal(shape) + 1j * rs.standard_normal(shape)).astype(np.complex64)
    cube[5] *= 30.0
    in_flags = np.zeros(shape, np.bool_)
    flagger2d = twodflag.SumThresholdFlagger(freq_chunks=4)
    m1 = multihost.pod_mesh()  # all 4 devices on the baseline axis
    out2d = flagger2d.get_flags_sharded(cube, in_flags, m1)
    exp2d = flagger2d.get_flags(cube, in_flags)
    mism2d = int((out2d != exp2d).sum())
    assert mism2d == 0, f"{mism2d} 2-D mask mismatches vs single-device path"

    print(f"process {pid}: OK ({int(expected.sum())} flags, 0 mismatches; "
          f"2-D 0 mismatches)", flush=True)


if __name__ == "__main__":
    main()
