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

from pycwt_tpu.coherence import _wct_core  # noqa: E402
from pycwt_tpu.mothers import Morlet  # noqa: E402
from pycwt_tpu.transform import build_scale_grid  # noqa: E402

N = int(os.environ.get("PAIRS_N", "1024"))
mother = Morlet(6)
grid = build_scale_grid(N, 1.0, dj=1 / 12, mother=mother)
scales = jnp.asarray(grid.sj, jnp.float32)
S = len(grid.sj)
nfft = 1 << (N - 1).bit_length()

results = {}
for B in (8, 32, 128):
    rng = np.random.default_rng(B)
    X = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    Y = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)

    @jax.jit
    def loop(X, Y, iters):
        def body(i, carry):
            x, acc = carry
            R, _, _ = _wct_core(x, Y, scales, 1.0, mother=mother, nfft=nfft,
                                dj=1 / 12, engine="planar")
            return x * (1.0 + R[0, 0, 0] * jnp.float32(1e-12)), acc + R.mean()
        return jax.lax.fori_loop(0, iters, body, (X, jnp.float32(0.0)))[1]

    np.asarray(loop(X, Y, 4))
    t0 = time.perf_counter(); np.asarray(loop(X, Y, 4)); t4 = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(loop(X, Y, 16)); t16 = time.perf_counter() - t0
    per_iter = (t16 - t4) / 12
    pairs_per_s = B / per_iter
    results[str(B)] = {"ms_per_dispatch": per_iter * 1e3,
                       "full_wct_pairs_per_s": pairs_per_s}
    print(f"  B={B}: {per_iter * 1e3:.2f} ms/iter -> {pairs_per_s:.0f} "
          f"complete WCT maps/s (S={S}, N={N})", file=sys.stderr, flush=True)

print(json.dumps({"metric": "wct_pairs_throughput", "N": N, "S": S,
                  "nfft": nfft, "batches": results}))
