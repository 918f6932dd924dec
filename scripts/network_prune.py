#!/usr/bin/env python
"""Search for smaller {6,7}-of-13 selection networks (0-1-principle pruning).

The fused flagger's parity-fill median selects sorted ranks {width//2,
width//2+1} of the 13 window members via a Batcher network pruned by
backward cone-of-influence (ops/rank.py selection_network: 73 min/max ops
at width 13).  Cone pruning is sound but not tight: a comparator inside
the cone can still be useless because the wires it touches are already
ordered on every input that matters.  The 0-1 principle makes exhaustive
verification cheap (2^13 binary vectors), so this script greedily demotes
("both" -> one-sided -> removed) every comparator of several base
networks and reports the smallest verified result.

Base networks tried: Batcher odd-even mergesort (48 CE), the 45-CE
optimal-size sorting network for n=13 (Knuth TAOCP v3 fig. 51 /
sorting-network literature), and split-sort-merge constructions.

Validation: on all 2^n binary inputs, wires[k] must equal
sorted(input)[k] for every requested output k.  Monotone-function
argument: min/max networks compute monotone boolean functions per wire;
agreement with the rank statistic on all 0-1 inputs implies agreement on
all reals (the same argument behind ops/rank.py selection_network).
"""

import itertools
import sys

import numpy as np

sys.path.insert(0, ".")
from katsdpsigproc_tpu.ops.rank import batcher_pairs, selection_network

N = 13
OUTPUTS = (6, 7)

# 45-CE optimal-size sorting network for 13 inputs (literature standard,
# e.g. the network catalogued at bertdobbelaere.github.io/sorting_networks):
NET13_45 = [
    (0, 12), (1, 10), (2, 9), (3, 7), (5, 11), (6, 8),
    (1, 6), (2, 3), (4, 11), (7, 9), (8, 10),
    (0, 4), (1, 2), (3, 6), (7, 8), (9, 10), (11, 12),
    (4, 6), (5, 9), (8, 11), (10, 12),
    (0, 5), (3, 8), (4, 7), (6, 11), (9, 10),
    (0, 1), (2, 5), (6, 9), (7, 8), (10, 11),
    (1, 3), (2, 4), (5, 6), (9, 10),
    (1, 2), (3, 4), (5, 7), (6, 8),
    (2, 3), (4, 5), (6, 7), (8, 9),
    (3, 4), (5, 6),
]


def all_binary(n):
    m = np.arange(1 << n, dtype=np.uint32)
    return ((m[:, None] >> np.arange(n)) & 1).astype(np.uint8)


BIN = all_binary(N)
SORTED = np.sort(BIN, axis=1)


def run(net, outputs=OUTPUTS):
    w = [BIN[:, i].copy() for i in range(N)]
    for i, j, kind in net:
        a, b = w[i], w[j]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        if kind != "max":
            w[i] = lo
        if kind != "min":
            w[j] = hi
    return all(np.array_equal(w[k], SORTED[:, k]) for k in outputs)


def ops(net):
    return sum(2 if kind == "both" else 1 for _, _, kind in net)


def greedy_prune(net, order_seed=None):
    net = [list(c) for c in net]
    rng = np.random.RandomState(order_seed) if order_seed is not None else None
    improved = True
    while improved:
        improved = False
        idxs = list(range(len(net)))
        if rng is not None:
            rng.shuffle(idxs)
        for idx in idxs:
            i, j, kind = net[idx]
            trials = []
            if kind == "both":
                trials = [None, "min", "max"]  # try removal first, then demotion
            else:
                trials = [None]
            for t in trials:
                cand = [tuple(c) for k, c in enumerate(net) if k != idx or t is not None]
                if t is not None:
                    cand = [tuple(c) if k != idx else (i, j, t) for k, c in enumerate(net)]
                if run(cand):
                    if t is None:
                        del net[idx]
                    else:
                        net[idx][2] = t
                    improved = True
                    break
            if improved:
                break
    return [tuple(c) for c in net]


def full(pairs):
    return [(i, j, "both") for i, j in pairs]


def main():
    results = {}

    cur = selection_network(N, OUTPUTS)
    assert run(cur)
    results["batcher-cone (current)"] = cur

    results["batcher-greedy"] = greedy_prune(full(batcher_pairs(N)))
    results["net45-greedy"] = greedy_prune(full(NET13_45))
    results["batcher-cone-greedy"] = greedy_prune(cur)
    cone45 = []
    # cone-prune net45 first, then greedy
    live = set(OUTPUTS)
    kept = []
    for i, j in reversed(NET13_45):
        ml, xl = i in live, j in live
        if not (ml or xl):
            continue
        kept.append((i, j, "both" if (ml and xl) else ("min" if ml else "max")))
        live.add(i)
        live.add(j)
    cone45 = kept[::-1]
    assert run(cone45)
    results["net45-cone"] = cone45
    results["net45-cone-greedy"] = greedy_prune(cone45)

    # randomized restarts on the best seed
    best_name = min(results, key=lambda k: ops(results[k]))
    for seed in range(8):
        r = greedy_prune(results[best_name], order_seed=seed)
        results[f"{best_name}-r{seed}"] = r

    for name, net in sorted(results.items(), key=lambda kv: ops(kv[1])):
        print(f"{ops(net):4d} ops  {len(net):3d} comparators  {name}")
    best = min(results.values(), key=ops)
    print("\nbest network:")
    for c in best:
        print(f"  {c},")


if __name__ == "__main__":
    main()
