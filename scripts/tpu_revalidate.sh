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

# 1. DMA engine, small shape (new kernel: compile risk check)
run python scripts/rfiflagtest.py --channels 1024 --baselines 64 --engine pallas_dma
# 2. DMA engine at headline slab scale (32k channels)
run python scripts/rfiflagtest.py --channels 32768 --baselines 252 --engine pallas_dma --skip-host
# 3. config 3 (new hreduce leg)
run python bench.py --config 3 --iters 10
# 4. full headline (all five engines + parity)
run python bench.py --iters 10
# 5. remaining configs
run python bench.py --config 1 --iters 10
run python bench.py --config 2 --iters 10
run python bench.py --config 4 --iters 10

echo "done; see $LOG"
