#!/usr/bin/env python
"""Measure fused-CWT kernel time + accuracy per MXU matmul precision tier.

On TPU, f32 matmuls lower to bf16 passes: DEFAULT = 1 pass (~5e-3 rel err in
a 2-stage DFT), HIGH = 3 passes, HIGHEST = up to 6 passes.  If HIGHEST is
costing 6 passes here, HIGH is a ~2x kernel speedup at ~1e-6 error — worth
promoting to the default.  This script times each tier with the chained
fori_loop methodology (airtight data dependency; see bench.py) and reports
max relative error vs the HIGHEST tier.

The whole pipeline is PLANAR f32 (no complex dtype, no FFT custom call) so it
runs even when the axon backend's complex64/FFT support is flapping.

Usage: timeout 1500 python tools/tpu_precision_experiment.py [iters_lo iters_hi]
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
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    mother = wt.Morlet(6)
    grid = build_scale_grid(N0, DT, dj=0.25, s0=2 * DT, J=S - 1)
    scales = jnp.asarray(grid.sj, jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N0), jnp.float32)
    print("  compiling forward DFT...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    sr0, si0 = jax.jit(lambda v: fft_of_real_planar(v, N0))(x)
    sr0 = jax.block_until_ready(sr0)
    print(f"  forward DFT ready ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    gws_by_prec = {}
    results = {}
    # NOTE: Mosaic's dot lowering supports only DEFAULT and HIGHEST —
    # Precision.HIGH raises NotImplementedError (measured 2026-08-20), so
    # HIGHEST is the accurate tier (bf16x3) and DEFAULT the fast one.
    for prec in ("highest", "high", "fast"):
        def pipeline(sr, si):
            wr, wi = fused_cwt_planar(sr, si, scales, mother=mother,
                                      nfft=N0, dt=DT, precision=prec)
            return (wr * wr + wi * wi).mean(-1)  # (S,)

        def chained(sr, si, salt, iters):
            def body(i, carry):
                a, b, acc = carry
                g = pipeline(a, b)
                a = a * (1.0 + g[0] * jnp.float32(1e-12))
                return a, b, acc + g
            _, _, acc = jax.lax.fori_loop(
                0, iters, body, (sr + salt, si, jnp.zeros((S,), jnp.float32)))
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
        run(f_lo)  # compile
        print(f"  {prec}: lo-loop compiled+run ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        run(f_hi)
        print(f"  {prec}: hi-loop compiled+run ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        per_iter = None
        for _ in range(3):
            t_lo, _ = run(f_lo)
            t_hi, out = run(f_hi)
            cand = (t_hi - t_lo) / (n_hi - n_lo)
            if 1e-3 <= cand <= 0.5:
                per_iter = cand
                break
        if per_iter is None:
            t_hi, out = run(f_hi)
            per_iter = t_hi / n_hi

        gws_by_prec[prec] = np.asarray(jax.jit(pipeline)(sr0, si0))
        err = float(np.max(np.abs(gws_by_prec[prec] - gws_by_prec["highest"])
                           / np.abs(gws_by_prec["highest"])))
        results[prec] = {"ms_per_transform": per_iter * 1e3,
                         "sample_scales_per_s": N0 * S / per_iter,
                         "gws_rel_err_vs_highest": err}
        print(f"  {prec}: {per_iter*1e3:.2f} ms, err {err:.2e}",
              file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
