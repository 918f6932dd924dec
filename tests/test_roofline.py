"""Compute-roofline model invariants (models/rfi/roofline.py)."""

import json

import numpy as np

from katsdpsigproc_tpu.models.rfi import roofline


def test_inventory_counts():
    inv = roofline.op_inventory(width=13, n_windows=4)
    total = sum(c for _, _, c in inv)
    # The minimum inventory must stay well under the traced kernel's
    # ~330 full-block ops (scripts/opcount.py) — it is a floor, not a
    # census — but large enough to be the dominant cost (>100).
    assert 100 < total < 330
    stages = {s for s, _, _ in inv}
    assert stages == {"amplitude", "median", "rank", "threshold", "output"}
    # rank rounds: 31 bitwise + zeros sweep, priced as the measured
    # serial composite (threshold -> compare+convert -> lane count)
    rank_rounds = sum(c for s, p, c in inv if s == "rank" and p == "rank_round")
    assert rank_rounds == 32


def test_roofline_scales_linearly():
    a = roofline.compute_roofline(2016, 32768)
    b = roofline.compute_roofline(4032, 32768)
    np.testing.assert_allclose(b["seconds_per_dump"], 2 * a["seconds_per_dump"])
    assert a["vis_per_second"] == b["vis_per_second"]
    # wider windows cost more
    c = roofline.compute_roofline(2016, 32768, width=17)
    assert c["seconds_per_dump"] > a["seconds_per_dump"]


def test_prim_table_override(tmp_path):
    p = tmp_path / "prim_ns.json"
    full = {k: 100.0 + i for i, k in enumerate(roofline.DEFAULT_PRIM_NS)}
    p.write_text(json.dumps(dict(full, bogus_key=50.0)))
    t = roofline.prim_ns(str(p))
    assert t["add"] == full["add"]
    assert "bogus_key" not in t
    # every inventory primitive measured -> marked fully measured
    assert t.pop("__measured__", None) == 1.0
    # a partial table overrides per key; measured fraction reflects it
    p.write_text(json.dumps({"add": 42.0}))
    t = roofline.prim_ns(str(p))
    assert t["add"] == 42.0
    assert t.pop("__measured__") == 1.0 / len(roofline.DEFAULT_PRIM_NS)
    assert t["cmp_f32"] == roofline.DEFAULT_PRIM_NS["cmp_f32"]
    # implausibly cheap entries (folded-chain artifacts) are rejected
    p.write_text(json.dumps(dict(full, add=1.0)))
    t = roofline.prim_ns(str(p))
    assert t["add"] == roofline.DEFAULT_PRIM_NS["add"]
    n = len(roofline.DEFAULT_PRIM_NS)
    assert t.pop("__measured__") == (n - 1) / n
    # a missing file falls back to pure defaults, unmarked
    t2 = roofline.prim_ns(str(tmp_path / "absent.json"))
    assert "__measured__" not in t2
    assert t2 == roofline.DEFAULT_PRIM_NS
    # malformed values (null / nested JSON on a real key) fall back to
    # the defaults instead of raising out of bench.py's loader
    # (including a non-dict top level, which would otherwise escape as
    # AttributeError on .items())
    for bad in ('{"add": null}', '{"add": [1, 2]}', "not json at all",
                "[1, 2]", '"just a string"', "3.5"):
        p.write_text(bad)
        assert roofline.prim_ns(str(p)) == roofline.DEFAULT_PRIM_NS
