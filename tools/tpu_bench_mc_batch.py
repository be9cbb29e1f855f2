#!/usr/bin/env python
"""Batched-alpha MC significance on the chip: P null curves, ONE compile.

The single-pair surface's chunk is specialized on static (al1, al2) — a
sweep over P distinct pairs (e.g. wct_matrix's per-pair nulls) pays P
compiles.  `wct_significance_batch` traces the coefficients, so the sweep
is one compile + one fused run.  Reports cold (trace+compile+run) and
steady (new seed, cached executables) wall times for P pairs.

Usage: timeout 1500 python tools/tpu_bench_mc_batch.py [P]
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pycwt_tpu.coherence import wct_significance_batch  # noqa: E402
from pycwt_tpu.utils.helpers import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

g = np.load(os.path.join(ROOT, "tests/golden/wct_sig_jao_jbaltic.npz"))
P = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rng = np.random.default_rng(0)
al1 = rng.uniform(0.1, 0.9, P)
al2 = rng.uniform(0.1, 0.9, P)
kw = dict(dt=float(g["dt"]), dj=float(g["dj"]), s0=float(g["s0"]),
          J=int(g["J"]), mc_count=300, progress=False, cache=False,
          # This bench measures P INDEPENDENT ensembles: disable the
          # round-5 default dedup, or random alphas collide on the
          # quantization grid and the timing covers fewer nulls than P.
          alpha_quant=0)

t0 = time.perf_counter()
sig = wct_significance_batch(al1, al2, seed=11, **kw)
cold = time.perf_counter() - t0
t0 = time.perf_counter()
sig_b = wct_significance_batch(al1, al2, seed=12, **kw)
steady = time.perf_counter() - t0
assert sig.shape == (P, int(g["J"]) + 1)
valid = np.isfinite(sig) & (sig != 0)
spread = float(np.abs(sig - sig_b)[valid].max())

print(json.dumps({
    "metric": "wct_significance_batch_wall_s",
    "P_alpha_pairs": P,
    "steady_s": steady,
    "steady_s_per_pair": steady / P,
    "cold_s": cold,
    "single_pair_equiv_note": (
        "single-pair surface would pay ~45-60 s compile PER distinct pair "
        "(one static-alpha executable each) plus ~0.08 s run"),
    "max_seed_to_seed_spread": spread,
}))
