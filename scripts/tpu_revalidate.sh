#!/bin/bash
# One-shot TPU revalidation after a tunnel outage (run from the repo root).
# Order matters: smallest compiles first so a remote-AOT rejection is cheap
# to localize; ONE TPU process at a time.  Each step appends to the log.
set -u
LOG=${1:-/tmp/tpu_revalidate.log}
: > "$LOG"
run() {
    echo "=== $* ===" | tee -a "$LOG"
    timeout "${STEP_TIMEOUT:-900}" "$@" >> "$LOG" 2>&1
    echo "--- exit $? ---" | tee -a "$LOG"
}

# 0. trivial op (tunnel health)
run python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128))*3)))"

# 1. pending end-of-round-3 validations (tunnel died before these ran):
#    percentile exactness with the row-matched pallas blocks, and the
#    config-2 bench with the same change on-chip.
run python scripts/percentiletest.py
run python bench.py --config 2 --iters 10
# 2. full headline (all five engines + on-chip parity; fast paths engage)
run python bench.py --iters 10
# 3. open A/B: incremental roll-by-1 chains vs direct member shifts
#    (median stage is ~75% member-shift cost; see NOTES_NEXT.md)
run python scripts/rollchain_ab.py
# 4. remaining configs
run python bench.py --config 3 --iters 10
run python bench.py --config 1 --iters 10
run python bench.py --config 4 --iters 10

echo "done; see $LOG"
