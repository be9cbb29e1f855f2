#!/usr/bin/env python
"""Throughput of the batched-pairs coherence surface (wct_pairs core) on the
chip: B full WCT pipelines per device dispatch, chained-loop methodology.

The reference computes one pair per call with a serial CPU pipeline; this
measures how many COMPLETE coherence maps/s one chip sustains when the pair
axis is batched (the all-pairs / sensor-array / climate-grid serving shape).

Usage: timeout 580 python tools/tpu_bench_pairs.py  [PAIRS_N env: pair length]
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("PYCWT_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PYCWT_TPU_PLATFORM"])

from pycwt_tpu.coherence import _pairs_block, _wct_core, _wct_pairs_scan  # noqa: E402
from pycwt_tpu.mothers import Morlet  # noqa: E402
from pycwt_tpu.transform import build_scale_grid  # noqa: E402
from pycwt_tpu.utils.helpers import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(os.environ.get("PAIRS_N", "1024"))
mother = Morlet(6)
grid = build_scale_grid(N, 1.0, dj=1 / 12, mother=mother)
scales = jnp.asarray(grid.sj, jnp.float32)
S = len(grid.sj)
nfft = 1 << (N - 1).bit_length()

BATCHES = tuple(int(b) for b in
                os.environ.get("PAIRS_B", "8,32,128,512,1024").split(","))

results = {}
for B in BATCHES:
    rng = np.random.default_rng(B)
    X = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    # The SHIPPED wct_pairs dispatch policy: whole batch when it fits the
    # bytes model, lax.scan over auto-sized pair-blocks beyond (round 4 —
    # the round-3 whole-batch dispatch collapsed 4x at B=128).
    blk = _pairs_block(B, S, nfft, 4)

    def run_pairs(x, y):
        if B <= blk:
            R, _, _ = _wct_core(x, y, scales, 1.0, mother=mother, nfft=nfft,
                                dj=1 / 12, engine="planar")
            return R
        R, _ = _wct_pairs_scan(x, y, scales, 1.0, mother=mother, nfft=nfft,
                               dj=1 / 12, engine="planar", block=blk)
        return R

    @jax.jit
    def loop(X, Y, iters):
        def body(i, carry):
            x, acc = carry
            R = run_pairs(x, Y)
            return x * (1.0 + R[0, 0, 0] * jnp.float32(1e-12)), acc + R.mean()
        return jax.lax.fori_loop(0, iters, body, (X, jnp.float32(0.0)))[1]

    n_lo, n_hi = (4, 16) if B <= 128 else (2, 6)
    np.asarray(loop(X, Y, n_lo))
    t0 = time.perf_counter(); np.asarray(loop(X, Y, n_lo)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(loop(X, Y, n_hi)); t_hi = time.perf_counter() - t0
    per_iter = (t_hi - t_lo) / (n_hi - n_lo)
    pairs_per_s = B / per_iter
    results[str(B)] = {"ms_per_dispatch": per_iter * 1e3,
                       "full_wct_pairs_per_s": pairs_per_s,
                       "pair_block": int(min(B, blk))}
    print(f"  B={B}: {per_iter * 1e3:.2f} ms/iter -> {pairs_per_s:.0f} "
          f"complete WCT maps/s (S={S}, N={N}, block={min(B, blk)})",
          file=sys.stderr, flush=True)

print(json.dumps({"metric": "wct_pairs_throughput", "N": N, "S": S,
                  "nfft": nfft, "batches": results}))
