#!/usr/bin/env python
"""Batch-scaling curve of the fused CWT on one chip.

VERDICT r1 weak-point 2: the headline bench measures B=1 only and the fused
path is vmapped per signal — this tool measures sample-scales/s at
B ∈ {1, 2, 4, 8} (vmap of the planar fused kernel = one batched Pallas grid)
with the chained-loop methodology, so batched throughput is a recorded fact
rather than an assumption.

Usage: timeout 1500 python tools/tpu_bench_batch.py [iters_lo iters_hi]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pycwt_tpu as wt  # noqa: E402
from pycwt_tpu.transform import build_scale_grid  # noqa: E402
from pycwt_tpu.ops.mxu_dft import fft_of_real_planar  # noqa: E402
from pycwt_tpu.ops.pallas_fft import fused_cwt_planar  # noqa: E402

N0 = 1 << 20
S = 64
DT = 1.0


def main():
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    mother = wt.Morlet(6)
    grid = build_scale_grid(N0, DT, dj=0.25, s0=2 * DT, J=S - 1)
    scales = jnp.asarray(grid.sj, jnp.float32)
    rng = np.random.default_rng(0)

    results = {}
    for B in (1, 2, 4, 8):
        x = jnp.asarray(rng.standard_normal((B, N0)), jnp.float32)

        def pipeline(xb):
            from pycwt_tpu.config import DEFAULT

            sr, si = fft_of_real_planar(xb, N0)           # (B, nfft) planar
            wr, wi = jax.vmap(
                lambda a, b: fused_cwt_planar(a, b, scales, mother=mother,
                                              nfft=N0, dt=DT,
                                              precision=DEFAULT.precision))(
                sr, si)
            return (wr * wr + wi * wi).mean(-1)            # (B, S)

        def chained(xb, salt, iters):
            def body(i, carry):
                v, acc = carry
                g = pipeline(v)
                v = v * (1.0 + g[0, 0] * jnp.float32(1e-12))
                return v, acc + g
            _, acc = jax.lax.fori_loop(
                0, iters, body, (xb + salt, jnp.zeros((B, S), jnp.float32)))
            return acc

        f_lo = jax.jit(lambda v, z: chained(v, z, n_lo))
        f_hi = jax.jit(lambda v, z: chained(v, z, n_hi))
        salt = [0]

        def run(f):
            salt[0] += 1
            t0 = time.perf_counter()
            out = np.asarray(f(x, jnp.float32(salt[0] * 1e-7)))
            return time.perf_counter() - t0, out

        run(f_lo)
        run(f_hi)
        per_iter = None
        for _ in range(3):
            t_lo, _ = run(f_lo)
            t_hi, out = run(f_hi)
            cand = (t_hi - t_lo) / (n_hi - n_lo)
            if 1e-3 <= cand <= 2.0:
                per_iter = cand
                break
        if per_iter is None:
            t_hi, out = run(f_hi)
            per_iter = t_hi / n_hi
        assert np.isfinite(out).all()
        results[f"B={B}"] = {
            "ms_per_batch": per_iter * 1e3,
            "sample_scales_per_s": B * N0 * S / per_iter,
        }
        print(f"  B={B}: {per_iter*1e3:.2f} ms/batch, "
              f"{B*N0*S/per_iter:.3e} ss/s", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
