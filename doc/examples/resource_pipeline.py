#!/usr/bin/env python
"""Streaming ingest with the resource layer (user guide ch. 8).

The reference's `resource.rst` workflow — "acquire early, wait late" — on
a stream of visibility dumps: one scratch buffer is contended between a
producer that uploads the next dump and a consumer that flags the
current one, with a JobQueue bounding the in-flight work.  JAX dispatch
is already asynchronous, so the device overlaps the flagger compute with
the next dump's host-side preparation; the Resource's FIFO ordering is
what keeps dump N+1's upload from clobbering the buffer before dump N's
flags are consumed.

Reference: doc/user/resource.rst:40-91 and resource.py:166-245.
"""

import asyncio

import numpy as np

from katsdpsigproc_tpu.utils import backend

backend.apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from katsdpsigproc_tpu.models.rfi import device as rfi_device  # noqa: E402
from katsdpsigproc_tpu.utils.resource import JobQueue, Resource  # noqa: E402

CHANNELS, BASELINES, DUMPS = 256, 16, 5


async def main():
    flagger = rfi_device.make_flagger_fn(width=13, n_sigma=11.0, threshold="sum")
    rs = np.random.RandomState(seed=1)

    # One contended scratch slot: holds the dump currently on device.
    buf = Resource[dict]({"vis": None})
    jobs = JobQueue()
    results = {}

    async def process(dump_index: int, host_vis: np.ndarray) -> None:
        acq = buf.acquire()  # acquire EARLY: establishes FIFO position
        # ... other async work may happen here ...
        await acq.wait_events()  # wait LATE: previous holder has finished
        with acq:
            vis = jnp.asarray(host_vis)  # "upload" (complex ok on CPU)
            acq.value["vis"] = vis
            flags = flagger(vis)  # async dispatch; device work overlaps
            # The flags array IS the completion event (events = arrays):
            acq.ready([flags])
        results[dump_index] = np.asarray(flags)  # fetch synchronizes

    for i in range(DUMPS):
        vis = (rs.standard_normal((CHANNELS, BASELINES))
               + 1j * rs.standard_normal((CHANNELS, BASELINES))).astype(np.complex64)
        vis[20 + i, :] *= 50.0  # planted spike, moving per dump
        jobs.add(process(i, vis))
        jobs.clean()
        await jobs.finish(max_remaining=2)  # bound in-flight dumps
    await jobs.finish()

    assert sorted(results) == list(range(DUMPS))
    for i in range(DUMPS):
        spiked_rows = np.flatnonzero(results[i].any(axis=1))
        assert 20 + i in spiked_rows, (i, spiked_rows)
        print(f"dump {i}: flagged rows {spiked_rows.tolist()}")


if __name__ == "__main__":
    asyncio.run(main())
