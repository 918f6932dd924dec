#!/usr/bin/env python
"""Re-tune the fused flagger over a pruned candidate region (on-chip).

``scripts/tune_all.py`` runs every template's FULL measured search — for
``FusedFlaggerTemplate`` v7 that is ~90 configs, each a minutes-long
remote Mosaic compile through this environment's tunnel.  When the
autotune schema gains a dimension (as v7 added ``fold``) the shipped
table record goes stale, and what is actually needed is a re-measure of
the known-good region, not the whole grid.

This script reuses the template's OWN search (generate/skip rules, the
``make_measure`` scan-harness protocol, the record key derivation) and
only intersects the candidate lists with a pruned region — by default
the round-4 winners' neighbourhood (bb=16, dma, planar/amp ingest,
fold 8192/16384).  The winner is merged into the shipped table exactly
as tune_all.py would, and stale same-fn records at older versions are
dropped.

Reference analogue: the runtime autotuner's per-config skip + sqlite
refresh (reference tune.py:354-448); the pruning is this repo's offline
equivalent of re-tuning only the dirty key.
"""

import argparse
import json
import os
import pathlib
import sys

import numpy as np  # noqa: F401  (parity with tune_all's import surface)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_cache"))

from katsdpsigproc_tpu.utils import backend as _backend  # noqa: E402

_backend.apply_platform_env()


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--bb", type=int, nargs="+", default=[16])
    parser.add_argument("--nref", type=int, nargs="+", default=[1])
    parser.add_argument("--pipeline", nargs="+", default=["dma"])
    parser.add_argument("--ingest", nargs="+", default=["planar", "amp"])
    parser.add_argument("--fold", type=int, nargs="+", default=[8192, 16384])
    args = parser.parse_args()
    allowed = {"bb": args.bb, "nref": args.nref, "pipeline": args.pipeline,
               "ingest": args.ingest, "fold": args.fold}

    from katsdpsigproc_tpu.utils import backend, tune

    ctx = backend.create_some_context()
    print(f"re-tuning fused flagger for {ctx.device} ({ctx.device_kind})", file=sys.stderr)

    orig_autotune = tune.autotune

    def pruned_autotune(generate, time_limit=0.1, **kwargs):
        kwargs = {
            name: ([v for v in values if v in allowed[name]] or values)
            if name in allowed else values
            for name, values in kwargs.items()
        }
        print(f"pruned search space: { {k: v for k, v in kwargs.items()} }", file=sys.stderr)
        return orig_autotune(generate, time_limit, **kwargs)

    tune.autotune = pruned_autotune

    tmp_db = os.path.join(os.path.dirname(__file__), "..", ".tune_scratch.json")
    os.environ["KATSDPSIGPROC_TPU_TUNE_DB"] = tmp_db
    if os.path.exists(tmp_db):
        os.unlink(tmp_db)

    def forcing_impl(test, fn, *fargs, **fkwargs):
        cls = fargs[0] if fargs else None
        keys = tune._keys(fn, fargs, fkwargs)
        keys["version"] = getattr(cls, "autotune_version", 0)
        keys.update(tune._device_columns())
        result = fn(*fargs, **fkwargs)
        tune._save_record({**keys, "result": dict(result)})
        return result

    tune.autotuner_impl = forcing_impl

    from katsdpsigproc_tpu.models.rfi import pallas_flagger

    t = pallas_flagger.FusedFlaggerTemplate(ctx)
    print(
        f"fused flagger: bb={t.bb} nref={t.nref} pipeline={t.pipeline} "
        f"ingest={t.ingest} fold={t.fold}",
        file=sys.stderr,
    )

    table_path = os.path.join(
        os.path.dirname(__file__), "..", "katsdpsigproc_tpu", "utils", "tuning_table.json"
    )
    new = json.load(open(tmp_db)) if os.path.exists(tmp_db) else []
    old = json.load(open(table_path)) if os.path.exists(table_path) else []
    # Drop stale older-version records for the fns being refreshed,
    # keyed on (fn, args) only: _fetch matches on 'version' (never
    # relaxed, whatever the TUNE_MATCH mode), so once the code's
    # autotune_version moved on an older-version record is unservable for
    # EVERY device kind — including ones this run did not re-measure.
    refreshed = {(r["fn"], r["args"]): r["version"] for r in new}
    old = [
        r for r in old
        if refreshed.get((r["fn"], r["args"]), r["version"]) <= r["version"]
    ]
    key_fields = ("fn", "version", "platform", "device_kind", "args")
    merged = {tuple(r.get(k) for k in key_fields): r for r in old}
    merged.update({tuple(r.get(k) for k in key_fields): r for r in new})
    with open(table_path, "w") as f:
        # sort_keys matches tune._save_record so table diffs stay
        # key-order-stable.
        json.dump(sorted(merged.values(), key=lambda r: (r["fn"], r["args"])), f,
                  indent=1, sort_keys=True)
    print(f"wrote {len(merged)} records to {table_path}", file=sys.stderr)
    if os.path.exists(tmp_db):
        os.unlink(tmp_db)


if __name__ == "__main__":
    main()
