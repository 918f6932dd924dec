#!/bin/bash
# One-shot TPU revalidation after a tunnel outage (run from the repo root).
# Order matters: the driver-capturable headline goes first (rounds 1 and 3
# both lost their number to late-round outages), then the round-4 A/B
# queue (NOTES_NEXT.md).  ONE TPU process at a time.  Each step appends
# to the log.
set -u
LOG=${1:-/tmp/tpu_revalidate.log}
: > "$LOG"
run() {
    echo "=== $* ===" | tee -a "$LOG"
    timeout "${STEP_TIMEOUT:-1800}" "$@" >> "$LOG" 2>&1
    echo "--- exit $? ---" | tee -a "$LOG"
}

# 0. trivial op (tunnel health)
run python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128))*3)))"

# 1. the headline, capture-ready (all engines incl. pallas_dma_amp,
#    on-chip parity, vs_compute_roofline)
run python bench.py --iters 10

# 2. refresh the measured per-primitive table (feeds vs_compute_roofline)
run python scripts/prim_cost.py --emit-json

# 3. round-4 A/Bs (decisive same-process comparisons; record either way)
run python scripts/skeleton_ab.py
run python scripts/rankpair_ab.py
run python scripts/fastpath_ab.py

# 4. the true config-5 shape (4 pols = 8064 rows)
run python bench.py --iters 10 --pols 4

# 5. CLI engine matrix at a realistic fold (CI only covers tiny CPU shapes)
run python scripts/rfiflagtest.py --channels 8192 --baselines 288 --engine pallas_dma

# 6. remaining configs
run python bench.py --config 2 --iters 10
run python bench.py --config 3 --iters 10
run python bench.py --config 1 --iters 10
run python bench.py --config 4 --iters 10

echo "done; see $LOG"
