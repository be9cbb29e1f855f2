#!/usr/bin/env python
"""End-to-end wct_significance wall time on the TPU — the reference's
wall-clock dominator (102 s serial CPU for the same AO/Baltic workload;
see tests/golden/wct_sig_jao_jbaltic.npz provenance)."""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pycwt_tpu.coherence import wct_significance  # noqa: E402

g = np.load(os.path.join(ROOT, "tests/golden/wct_sig_jao_jbaltic.npz"))
t0 = time.perf_counter()
sig95 = wct_significance(float(g["al1"]), float(g["al2"]), dt=float(g["dt"]),
                         dj=float(g["dj"]), s0=float(g["s0"]), J=int(g["J"]),
                         mc_count=300, progress=False, cache=False, seed=11,
                         mc_batch=75)
wall = time.perf_counter() - t0
ref = g["sig95"]
valid = np.isfinite(ref) & (ref != 0)
print(json.dumps({
    "metric": "wct_significance_300_surrogates_wall_s",
    "value": wall,
    "reference_cpu_serial_s": 102.0,
    "speedup": 102.0 / wall,
    "max_abs_diff_vs_reference_curve": float(np.abs(sig95[valid] - ref[valid]).max()),
}))
