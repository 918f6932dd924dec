#!/bin/bash
# One-shot TPU revalidation after a tunnel outage (run from the repo root).
# Order matters: the driver-capturable headline goes first (rounds 1 and 3
# both lost their number to late-round outages; round 4 captured five).
# ONE TPU process at a time.  Each step appends to the log.
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

# 1. the headline, capture-ready (all engines, on-chip parity,
#    vs_compute_roofline with the shipped measured prim table)
run python bench.py --iters 10

# 2. the other BASELINE.json configs
run python bench.py --config 2 --iters 10
run python bench.py --config 3 --iters 10
run python bench.py --config 1 --iters 10
run python bench.py --config 4 --iters 10

# 3. CLI engine matrix at a realistic fold (CI only covers tiny CPU shapes)
run python scripts/rfiflagtest.py --channels 8192 --baselines 288 --engine pallas_dma

# 4. only after a suspected silicon/toolchain change: refresh the measured
#    primitive table and the tuning table (both are shipped artifacts —
#    commit the diffs if they move)
# run python scripts/prim_cost.py --emit-json
# run python scripts/tune_all.py

echo "done; see $LOG"
