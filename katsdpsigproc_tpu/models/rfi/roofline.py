"""Compute roofline for the exact fused RFI flagger.

BASELINE.md's headline target ("≥80% of HBM roofline") presumes the
flagger is bandwidth-bound.  Measurement says otherwise: at bb≥8 the
fused kernel reads 0.26 MB/baseline (≈0.35 µs of HBM time at measured
rates) but spends ~6 µs/baseline of vector work (BASELINE_RESULTS.md,
rounds 2-3) — the pipeline is VPU-compute-bound, so the honest speed of
light is the *algorithm's* minimum vector-op count times the chip's
measured per-op throughput.  This module computes that number so
``bench.py`` can report ``vs_compute_roofline`` alongside the HBM-based
``vs_baseline``.

The inventory below is the MINIMUM full-block vector work any exact
implementation of the reference pipeline must do per (R, W) band-folded
block (R = bb·hh rows, W = fold lanes, covering bb baselines × channels
visibilities).  "Exact" means the reference's semantics bit-for-bit:
width-13 windowed median background (background_median_filter.mako:
79-220), MAD noise via the 31-round bitwise IEEE-754 rank search
(rank.mako:186-231 — 31 rounds are information-theoretically required to
pin an exact float32 rank by bitwise binary search), and the 4-window
SumThreshold (threshold_sum.mako:37-132).  Known-cheaper *approximate*
schemes (histogram medians, sampled ranks) are out of scope: the repo's
design rule is exact rank statistics.

Primitive cost model: measured per-primitive ns at the headline
(256, 1024) f32 block from ``scripts/prim_cost.py`` (an in-kernel
fori_loop chain with an interleaved add to defeat op folding; the
pure-add baseline is subtracted).  Until an on-chip refresh lands in
``prim_ns.json``, defaults scale the round-2 measured ~8.5 ns per
(32, 1024) full-block op (BASELINE_RESULTS.md) by relative op weights.
"""

import json
import os
from typing import Dict, List, Mapping, Optional, Tuple

# Per-primitive cost in ns at a 262144-element float32 block (any
# (rows, lanes) aspect with rows*lanes == 256*1024).  The "add" entry
# anchors the scale: 8 × 8.5 ns (the measured (32, 1024) op cost,
# BASELINE_RESULTS.md round 2).  Relative weights for the rest are
# conservative estimates; the on-chip ``scripts/prim_cost.py
# --emit-json`` refresh overrides them per key via prim_ns.json.
# COSTS ARE LAYOUT-SENSITIVE: measure at the SHIPPED kernel's block
# aspect (round 4: ``--rows 32 --width 8192`` for the fold-8192 layout;
# shift_ch measured 2.9× cheaper there than at (256, 1024)), so the
# floor prices the same layout the kernel runs.
DEFAULT_PRIM_NS: Dict[str, float] = {
    "add": 68.0,        # elementwise add/or/select-class op
    "minmax": 68.0,     # one min or max (the selection-network unit)
    "cmp_f32": 136.0,   # compare + i32/f32 convert (reference only; see rank_round)
    "shift_ch": 204.0,  # band-folded channel shift (h=1: one lane roll)
    "reduce": 136.0,    # full-block lane reduction to (R, 1) + use (reference only)
    "sqrt": 68.0,
    # One rank-search round as a measured COMPOSITE: per-row threshold →
    # full-block compare+convert → lane reduce, serially dependent.  The
    # inventory prices the rank stage with this instead of cmp_f32 +
    # reduce because per-op costs are NOT additive under ILP (round 4: a
    # bare lane reduce nets <= 0 behind add-class ops, yet the round is
    # not free) — the composite is what any exact bitwise rank search
    # must execute per round, and it measures cleanly
    # (scripts/prim_cost.py "rank_round").  Default = the old modeled
    # cmp_f32 + reduce sum.
    "rank_round": 272.0,
}

# Below this a chain measurement is a folding/noise artifact, not a cost
# (a (256, 1024) f32 op sweeps 256 vregs).  Mirrors scripts/prim_cost.py.
MIN_PLAUSIBLE_NS = 30.0

_PRIM_JSON = os.path.join(os.path.dirname(__file__), "prim_ns.json")


def prim_ns(path: Optional[str] = None) -> Dict[str, float]:
    """The primitive-cost table: measured (prim_ns.json) over defaults.

    Only plausible measurements override defaults (``MIN_PLAUSIBLE_NS``
    guards against the folded-chain artifacts the first prim_cost run
    produced — a 512-add chain timed 0.000 ms).  ``__measured__`` is the
    fraction of the inventory's primitives that carry a measurement (1.0
    = fully measured; absent = pure defaults), so a partly-modeled
    roofline is reported as such.  A primitive can stay modeled for an
    honest reason: ``reduce`` nets at or below zero marginal cost on-chip
    (instruction-level parallelism hides the lane reduction behind the
    chain's add-class ops), so its conservative default stands.
    """
    table = dict(DEFAULT_PRIM_NS)
    p = path or _PRIM_JSON
    try:
        with open(p) as f:
            raw = json.load(f)
        if not isinstance(raw, dict):
            raise ValueError(f"prim_ns table must be a JSON object, got {type(raw).__name__}")
        loaded = {k: float(v) for k, v in raw.items()
                  if k in table and float(v) >= MIN_PLAUSIBLE_NS}
        table.update(loaded)
        if loaded:
            table["__measured__"] = len(set(loaded) & set(DEFAULT_PRIM_NS)) / len(
                DEFAULT_PRIM_NS)
            # Which keys are measured, so compute_roofline can report the
            # fraction over the primitives its inventory actually uses.
            table["__measured_keys__"] = sorted(set(loaded) & set(DEFAULT_PRIM_NS))
    except (OSError, ValueError, TypeError):
        # TypeError: float(None)/float(list) from a malformed or
        # partially-written JSON value — fall back to the modeled
        # defaults rather than abort the caller (bench.py runs this
        # unconditionally).
        pass
    return table


def op_inventory(width: int = 13, n_windows: int = 4,
                 rank_rounds: int = 31) -> List[Tuple[str, str, int]]:
    """Minimum full-block vector ops per block: (stage, primitive, count).

    Derivation (width 13, 4 windows, no input flags — the headline
    configuration):

    - amplitude: ``re² + im²`` (2 mul/fma) + sqrt — 3 ops.
    - median members: the window's ``width − 1`` shifted copies (the
      center is the block itself).  Each shift along band-folded
      channels is the measured ``shift_ch`` primitive (2 lane rolls +
      cross-band select).  The ±inf edge parity fills are 2 static
      selects.
    - median selection: the best-known selection network for sorted
      ranks {6, 7} of 13 is 61 min/max exchanges
      (``ops.rank._ANNEALED_SELECT``, 0-1-verified) + 1 subtract.
    - MAD rank search: ``rank_rounds`` serially-dependent rounds of the
      measured ``rank_round`` composite (per-row threshold →
      compare-convert → cross-lane count), plus one zeros-count sweep
      (round 0) and ~2 ops of halfway/max-below correction.  The per-band
      count broadcast is (R, hh)-shaped — ≤ 1/W of a full-block op,
      dropped from the floor (identically zero at the h=1 layout).
    - SumThreshold: per window w ∈ {1, 2, 4, 8}: Kogge-Stone sum ladder
      (log2 w doubling steps, each shift + add), 1 threshold compare,
      and log2 w flag-dilation steps (shift + or); window 1 skips the
      ladders.  Both the ladder and the dilation shifts are real channel
      shifts (``shift_ch``; until round 5 the dilation shifts were
      mispriced as add-class — at the h=1 layout a lane roll costs ~2.6
      adds, so that undercharged the floor by ~8%): 12 ``shift_ch`` + 17
      add-class (6 ladder adds + 4 compares + 1 noise scale + 6 dilation
      maxes).
    - output: f32 0/1 → i32 → u8 cast-store, 2 ops.
    """
    half_ladders = sum(int(w).bit_length() - 1 for w in
                       (2 ** i for i in range(n_windows)))  # 0+1+2+3 = 6
    # The parity-fill median's actual network for this width: the two
    # middle sorted ranks of `width` members (pallas_flagger.
    # _median_parity_fill), counted op-for-op (a 'both' entry is a min
    # AND a max).  61 ops at the shipped width 13.
    from ...ops import rank as _rank_ops

    net = _rank_ops.selection_network(width, (width // 2, width // 2 + 1))
    net_ops = sum(2 if mode == "both" else 1 for _, _, mode in net)
    inv = [
        ("amplitude", "add", 2),
        ("amplitude", "sqrt", 1),
        ("median", "shift_ch", width - 1),
        ("median", "add", 2),  # edge parity fills
        ("median", "minmax", net_ops),  # selection network min/max ops
        ("median", "add", 1),  # background subtract
        ("rank", "rank_round", rank_rounds + 1),  # rounds + zeros sweep
        ("rank", "add", 2),  # halfway correction
        ("threshold", "shift_ch", half_ladders * 2),  # ladder + dilation shifts
        ("threshold", "add", half_ladders + n_windows + 1),  # adds+cmps+scale
        ("threshold", "add", half_ladders),  # dilation ors
        ("output", "add", 2),
    ]
    return inv


def compute_roofline(baselines: int, channels: int,
                     width: int = 13, n_windows: int = 4,
                     prim_table: Optional[Mapping[str, float]] = None,
                     rows: int = 256) -> Dict[str, float]:
    """Algorithm speed-of-light for a (baselines × channels) dump.

    Returns seconds per dump, vis/s, and the per-stage ns breakdown per
    block.  The normalization assumes the primitive costs were measured
    at a ``rows * 1024``-element f32 block (any aspect: the shipped
    prim_ns.json is measured at the kernel's own (8, 32768) h=1 band
    layout, = 256·1024 elements; per-vis cost is shape-invariant once
    the VPU is saturated — the flat slab sweep, BASELINE_RESULTS.md
    round 3).  COSTS ARE LAYOUT-SENSITIVE: re-run scripts/prim_cost.py
    at the shipped layout whenever the kernel's fold changes.
    """
    table = dict(prim_table) if prim_table is not None else prim_ns()
    measured = float(table.pop("__measured__", 0.0))
    measured_keys = set(table.pop("__measured_keys__", ()))
    stage_ns: Dict[str, float] = {}
    used_prims = set()
    for stage, prim, count in op_inventory(width, n_windows):
        used_prims.add(prim)
        stage_ns[stage] = stage_ns.get(stage, 0.0) + count * table[prim]
    block_ns = sum(stage_ns.values())
    if measured_keys:
        # Report the measured fraction over the primitives the inventory
        # ACTUALLY prices (table entries kept only for reference, like the
        # bare `reduce`, must not dilute it).
        measured = len(measured_keys & used_prims) / len(used_prims)
    # The primitive costs are per (rows, 1024) block = rows·1024 elements;
    # the inventory is one full sweep over the block, and every visibility
    # appears in exactly one block element, so the dump cost is the
    # per-element cost times the dump size.
    n_vis = baselines * channels
    ns_per_dump = block_ns * n_vis / (rows * 1024.0)
    s_per_dump = ns_per_dump * 1e-9
    return {
        "seconds_per_dump": s_per_dump,
        "vis_per_second": n_vis / s_per_dump,
        "block_ns": block_ns,
        "stage_ns": stage_ns,
        "prim_ns_measured": measured,
    }
