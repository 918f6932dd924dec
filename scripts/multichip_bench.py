#!/usr/bin/env python
"""Multi-chip scaling benchmark for the headline RFI flagger.

BASELINE.md's multi-host target: ≥85% scaling efficiency at ≥2 hosts of a
TPU slice (baseline/pol sharding, collective noise/percentile reductions).
This is the harness to measure it the day multi-chip hardware exists; on
this machine it smoke-runs on the 8-virtual-device CPU mesh (numbers are
meaningless there — the point is the program compiles, shards, and the
efficiency arithmetic is exercised end-to-end).

Weak-scaling protocol (the production regime — each chip owns a fixed
slice of baselines×pols over the full band):

1. time the sharded flagger over all N mesh devices on the full dump;
2. time the SAME engine on a 1-device mesh over a 1/N slice (same
   per-device work) in the same process;
3. efficiency = t_1device / t_Ndevices (1.0 = perfect; communication,
   dispatch skew, and any replicated work show up as < 1).

Both timings use the honest on-chip scan timer (`utils.profiling.
time_scan`) — the only defensible timer under this environment's remote
tunnel, and on a pod it amortizes dispatch overhead identically.

Engines:
  fused  — `parallel.flagger.make_sharded_fused_flagger`: pure DP around
           the fastest single-chip Pallas kernel; zero collectives
           (reference analogue being replaced: the thread/process pool
           fan-out, /root/reference/src/katsdpsigproc/rfi/twodflag.py:
           1029-1118).
  xla    — `parallel.flagger.make_sharded_flagger` over a (baseline ×
           channel) mesh: exercises the halo exchanges and the psummed
           collective rank search (channel_shards > 1 makes them real).

Multi-host launch: run one copy of this script per host under
`parallel.multihost.initialize` (--multihost), exactly as the
`tests/multihost_worker.py` parity test does.

Prints one JSON line per engine:
  {"metric": "multichip_scaling_efficiency", ...,
   "n_devices": N, "per_chip_vis_per_second": ..., "value": efficiency}
"""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402

# CPU smoke runs want the virtual multi-device mesh (the backend client
# reads XLA_FLAGS at first use, which hasn't happened yet even though
# sitecustomize imported jax — same trick as tests/conftest.py).
if os.environ.get("KATSDPSIGPROC_TPU_PLATFORM") == "cpu":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--channels", type=int, default=32768)
    ap.add_argument("--baselines", type=int, default=2016,
                    help="TOTAL baseline rows (after pol flattening); "
                         "rounded up to divide the mesh")
    ap.add_argument("--pols", type=int, default=1)
    ap.add_argument("--width", type=int, default=13)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bb", type=int, default=16)
    ap.add_argument("--slab", type=int, default=288)
    ap.add_argument("--engine", choices=["fused", "xla", "both"], default="fused")
    ap.add_argument("--channel-shards", type=int, default=1,
                    help="channel-axis mesh extent for the xla engine "
                         "(makes the halo exchange + collective rank "
                         "search real)")
    ap.add_argument("--multihost", action="store_true",
                    help="call parallel.multihost.initialize() first; on "
                         "TPU pods the runtime discovers the cluster, on "
                         "CPU/GPU pass --coordinator/--num-processes/"
                         "--process-id")
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address (host:port) for --multihost "
                         "off-pod")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from katsdpsigproc_tpu.parallel import (
        flagger as pflagger,
        mesh as pmesh,
        multihost,
    )
    from katsdpsigproc_tpu.utils.profiling import time_scan

    if args.multihost:
        multihost.initialize(args.coordinator, args.num_processes, args.process_id)
        log(multihost.process_summary())

    n = jax.device_count()
    interpret = jax.devices()[0].platform == "cpu"
    rows = args.baselines * args.pols
    # Every device's shard must divide by bb for the fused kernel.
    unit = n * args.bb
    rows = -(-rows // unit) * unit
    log(f"{n} devices ({jax.devices()[0].device_kind}); dump "
        f"{rows} rows x {args.channels} channels")

    rs = np.random.RandomState(seed=1)
    vis_np = rs.standard_normal((rows, args.channels, 2)).astype(np.float32)
    n_vis = rows * args.channels

    results = []

    def run_engine(name, make_fn, vis_sharded_np, spec_for):
        """Time over the N-device mesh, then the 1-device 1/N slice."""
        mesh_n = (pmesh.make_mesh((n,), (pmesh.BASELINE_AXIS,))
                  if name == "fused" else
                  pmesh.make_mesh((n // args.channel_shards, args.channel_shards),
                                  (pmesh.BASELINE_AXIS, pmesh.CHANNEL_AXIS)))
        fn_n = make_fn(mesh_n)
        # Cross-process-safe placement (every process passes the full
        # replicated host array; device_put rejects multi-process shardings).
        vis_n = pmesh.shard_with_spec(mesh_n, vis_sharded_np, spec_for(mesh_n))
        t_n = time_scan(fn_n, (vis_n,), iters=args.iters)

        # 1-device control leg: same per-device work (1/N of the rows; for
        # the channel-sharded xla engine, 1/N of rows*channels via rows).
        # Each process times its own LOCAL device — a global 1-device mesh
        # would be non-addressable from the other processes.
        mesh_1 = pmesh.make_mesh((1,), (pmesh.BASELINE_AXIS,),
                                 devices=jax.local_devices()[:1])
        fn_1 = make_fn(mesh_1)
        if name == "fused":
            slice_np = vis_sharded_np[: rows // n]
        else:
            slice_np = vis_sharded_np[:, : rows // n]
        vis_1 = pmesh.shard_with_spec(mesh_1, slice_np, spec_for(mesh_1))
        t_1 = time_scan(fn_1, (vis_1,), iters=args.iters)

        eff = t_1 / t_n if t_n > 0 else float("nan")
        per_chip = n_vis / t_n / n
        log(f"[{name}] N={n}: {t_n * 1e3:.3f} ms/dump "
            f"({n_vis / t_n / 1e9:.2f} Gvis/s aggregate, "
            f"{per_chip / 1e9:.2f} Gvis/s/chip); 1-device 1/N slice: "
            f"{t_1 * 1e3:.3f} ms; weak-scaling efficiency {eff * 100:.1f}%")
        rec = {
            "metric": "multichip_scaling_efficiency",
            "value": eff,
            "unit": "fraction",
            "vs_baseline": eff / 0.85,  # BASELINE.md: >=0.85
            "engine": name,
            "n_devices": n,
            "n_hosts": jax.process_count(),
            "seconds_per_dump": t_n,
            "aggregate_vis_per_second": n_vis / t_n,
            "per_chip_vis_per_second": per_chip,
            "platform": jax.devices()[0].platform,
        }
        results.append(rec)

    if args.engine in ("fused", "both"):
        def make_fused(mesh):
            return pflagger.make_sharded_fused_flagger(
                mesh, width=args.width, n_sigma=11.0, slab=args.slab,
                bb=args.bb, interpret=interpret)

        run_engine("fused", make_fused, vis_np,
                   lambda mesh: jax.sharding.PartitionSpec(
                       pmesh.BASELINE_AXIS, None, None))

    if args.engine in ("xla", "both"):
        if n % args.channel_shards:
            raise SystemExit(f"--channel-shards {args.channel_shards} must divide {n}")

        def make_xla(mesh):
            return pflagger.make_sharded_flagger(
                mesh, width=args.width, n_sigma=11.0, threshold="sum")

        # channel-major (C, B, 2) for the per-stage sharded flagger
        vis_cm = np.swapaxes(vis_np, 0, 1).copy()
        run_engine("xla", make_xla, vis_cm,
                   lambda mesh: jax.sharding.PartitionSpec(
                       pmesh.CHANNEL_AXIS if pmesh.CHANNEL_AXIS in mesh.axis_names
                       else None,
                       pmesh.BASELINE_AXIS, None))

    # One JSON stream per job: only the coordinator process emits records
    # (every process computed the same global timings).
    if jax.process_index() == 0:
        for rec in results:
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
