#!/usr/bin/env python
"""Throughput of the all-pairs coherence matrix core (wct_matrix) on the
chip — shared-CWT amortization vs the independent-pairs surface.

`wct_pairs` pays 2 CWTs + 3 smoothings per pair; `wct_matrix` computes each
signal's CWT + self-smoothing once and only the cross smoothing per pair.
Measures complete coherence maps/s for the all-pairs workload of B signals
(P = B(B−1)/2 maps) with the chained-loop methodology.

Usage: timeout 1500 python tools/tpu_bench_matrix.py
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

from pycwt_tpu.coherence import _pairs_block, _wct_matrix_scan  # noqa: E402
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

results = {}
for B in (16, 32, 64):
    pairs = np.array([(i, j) for i in range(B) for j in range(i + 1, B)],
                     np.int32)
    P = len(pairs)
    blk = min(P, _pairs_block(P, S, nfft, 4, planes=48))
    npad = (-P) % blk
    pi = jnp.asarray(np.concatenate([pairs[:, 0],
                                     np.repeat(pairs[-1, 0], npad)]))
    pj = jnp.asarray(np.concatenate([pairs[:, 1],
                                     np.repeat(pairs[-1, 1], npad)]))
    rng = np.random.default_rng(B)
    Y = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)

    @jax.jit
    def loop(Y, iters):
        def body(i, carry):
            y, acc = carry
            R, _ = _wct_matrix_scan(y, pi, pj, scales, 1.0, mother=mother,
                                    nfft=nfft, dj=1 / 12, engine="planar",
                                    block=blk)
            return y * (1.0 + R[0, 0, 0] * jnp.float32(1e-12)), acc + R.mean()
        return jax.lax.fori_loop(0, iters, body, (Y, jnp.float32(0.0)))[1]

    n_lo, n_hi = 2, 6
    np.asarray(loop(Y, n_lo))
    t0 = time.perf_counter(); np.asarray(loop(Y, n_lo)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); np.asarray(loop(Y, n_hi)); t_hi = time.perf_counter() - t0
    per_iter = (t_hi - t_lo) / (n_hi - n_lo)
    results[str(B)] = {"pairs": P, "ms_per_dispatch": per_iter * 1e3,
                       "full_wct_maps_per_s": P / per_iter,
                       "pair_block": int(blk)}
    print(f"  B={B} (P={P}): {per_iter * 1e3:.2f} ms -> {P / per_iter:.0f} "
          f"maps/s (block={blk})", file=sys.stderr, flush=True)

print(json.dumps({"metric": "wct_matrix_throughput", "N": N, "S": S,
                  "batches": results}))
