#!/usr/bin/env python
"""Masked-sum-of-amplitudes benchmark (reference:
scripts/maskedsumabstest.py — the amplitudes variant of maskedsumtest).

Thin alias: runs ``maskedsumtest.py --amplitudes``.
"""

import pathlib
import runpy
import sys

sys.argv = [sys.argv[0], "--amplitudes", *sys.argv[1:]]
runpy.run_path(str(pathlib.Path(__file__).resolve().parent / "maskedsumtest.py"),
               run_name="__main__")
