#!/usr/bin/env python
"""Measure fused-CWT kernel time + accuracy per MXU matmul precision tier.

On TPU, f32 matmuls lower to bf16 passes: DEFAULT = 1 pass (~5e-3 rel err in
a 2-stage DFT), HIGH = 3 passes, HIGHEST = up to 6 passes.  If HIGHEST is
costing 6 passes here, HIGH is a ~2x kernel speedup at ~1e-6 error — worth
promoting to the default.  This script times each tier with the chained
fori_loop methodology (airtight data dependency; see bench.py) and reports
max relative error vs the XLA-FFT f32 path.

Usage: timeout 580 python tools/tpu_precision_experiment.py [iters_lo iters_hi]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.transform import build_scale_grid, cwt_batch
from pycwt_tpu.ops.pallas_fft import fused_cwt

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
    x = jnp.asarray(rng.standard_normal((1, N0)), jnp.float32)

    # Reference: XLA path power spectrum (f32).
    W_ref, sf = cwt_batch(x, scales, DT, mother=mother, nfft=N0, engine="xla")
    gws_ref = np.asarray((jnp.abs(W_ref) ** 2).mean(-1))[0]
    sf0 = sf[0].astype(jnp.complex64)

    results = {}
    for prec in ("highest", "high", "fast"):
        def pipeline(sft):
            W = fused_cwt(sft, scales, mother=mother, nfft=N0, dt=DT,
                          precision=prec)
            return (jnp.abs(W) ** 2).mean(-1)  # (S,)

        def chained(sft, salt, iters):
            def body(i, carry):
                s, acc = carry
                g = pipeline(s)
                s = s * (1.0 + g[0] * jnp.complex64(1e-12))
                return s, acc + g
            _, acc = jax.lax.fori_loop(
                0, iters, body, (sft + salt, jnp.zeros((S,), jnp.float32)))
            return acc

        f_lo = jax.jit(lambda s, z: chained(s, z, n_lo))
        f_hi = jax.jit(lambda s, z: chained(s, z, n_hi))
        salt = [0]

        def run(f):
            salt[0] += 1
            t0 = time.perf_counter()
            out = np.asarray(f(sf0, jnp.complex64(salt[0] * 1e-7)))
            return time.perf_counter() - t0, out

        run(f_lo)  # compile
        run(f_hi)
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

        gws = np.asarray(pipeline(sf0))
        err = float(np.max(np.abs(gws - gws_ref) / np.abs(gws_ref)))
        results[prec] = {"ms_per_transform": per_iter * 1e3,
                         "sample_scales_per_s": N0 * S / per_iter,
                         "gws_rel_err_vs_xla_f32": err}
        print(f"  {prec}: {per_iter*1e3:.2f} ms, err {err:.2e}",
              file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
