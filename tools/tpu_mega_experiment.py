#!/usr/bin/env python
"""Single-megakernel CWT at nfft=2^20: worth it?

The production path runs two Pallas kernels with the (S × R1 × R2) planar
intermediate T round-tripping HBM (~16 MB/scale ≈ 1 GB/transform).  The
single-kernel variant (production for nfft ≤ 2^12) keeps everything per scale
in VMEM — at 2^20 the tiles are (1024, 1024), fully (8,128)-aligned, and the
per-program VMEM footprint is ~40-60 MB.  This times both on the chip.

Usage: timeout 1500 python tools/tpu_mega_experiment.py [iters_lo iters_hi]
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
from pycwt_tpu.ops import pallas_fft as pf  # noqa: E402

N0 = 1 << 20
S = 64
DT = 1.0


def main():
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    mother = wt.Morlet(6)
    grid = build_scale_grid(N0, DT, dj=0.25, s0=2 * DT, J=S - 1)
    scales = jnp.asarray(grid.sj, jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N0), jnp.float32)
    sr0, si0 = jax.jit(lambda v: fft_of_real_planar(v, N0))(x)
    sr0 = jax.block_until_ready(sr0)

    variants = {
        "two-kernel": lambda a, b: pf.fused_cwt_planar(
            a, b, scales, mother=mother, nfft=N0, dt=DT),
        "megakernel": lambda a, b: pf._fused_cwt_small(
            a, b, scales, mother=mother, nfft=N0, dt=DT, interpret=False,
            precision=jax.lax.Precision.HIGHEST,
            analytic=mother.analytic_negligible_negative()),
    }

    results = {}
    ref = None
    for name, fn in variants.items():
        try:
            def pipeline(a, b, fn=fn):
                wr, wi = fn(a, b)
                return (wr * wr + wi * wi).mean(-1)

            def chained(a, b, salt, iters):
                def body(i, carry):
                    v, acc = carry
                    g = pipeline(v, b)
                    v = v * (1.0 + g[0] * jnp.float32(1e-12))
                    return v, acc + g
                _, acc = jax.lax.fori_loop(
                    0, iters, body, (a + salt, jnp.zeros((S,), jnp.float32)))
                return acc

            f_lo = jax.jit(lambda a, b, z: chained(a, b, z, n_lo))
            f_hi = jax.jit(lambda a, b, z: chained(a, b, z, n_hi))
            salt = [0]

            def run(f):
                salt[0] += 1
                t0 = time.perf_counter()
                out = np.asarray(f(sr0, si0, jnp.float32(salt[0] * 1e-7)))
                return time.perf_counter() - t0, out

            t0 = time.perf_counter()
            run(f_lo)
            print(f"  {name}: compiled ({time.perf_counter()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
            run(f_hi)
            per_iter = None
            for _ in range(3):
                t_lo, _ = run(f_lo)
                t_hi, _ = run(f_hi)
                cand = (t_hi - t_lo) / (n_hi - n_lo)
                if 1e-3 <= cand <= 1.0:
                    per_iter = cand
                    break
            if per_iter is None:
                t_hi, _ = run(f_hi)
                per_iter = t_hi / n_hi

            gws = np.asarray(jax.jit(pipeline)(sr0, si0))
            if ref is None:
                ref = gws
                err = 0.0
            else:
                err = float(np.abs(gws - ref).max() / np.abs(ref).max())
            results[name] = {"ms_per_transform": per_iter * 1e3,
                             "sample_scales_per_s": N0 * S / per_iter,
                             "rel_diff_vs_two_kernel": err}
            print(f"  {name}: {per_iter*1e3:.2f} ms (diff {err:.1e})",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:150]}
            print(f"  {name}: FAILED {results[name]['error']}",
                  file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
