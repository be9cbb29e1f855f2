#!/usr/bin/env python
"""Measure the fused-CWT pipeline across (precision tier × output mode).

Round-4 bytes-roofline levers (VERDICT r3 #1): bf16 inter-kernel T at the
``fast`` tier, ``power``/``power_sum`` epilogues that keep planar W out of
HBM.  This times each combination with the chained fori_loop methodology
(airtight data dependency; host fetch as the only trusted barrier — see
bench.py) and reports the modelled HBM traffic + achieved GB/s per mode.

Usage: timeout 1500 python tools/tpu_bench_modes.py [iters_lo iters_hi]
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

MODES = [
    ("high", "planes"),
    ("high", "power"),
    ("high", "power_sum"),
    ("fast", "planes"),
    ("fast", "power"),
    ("fast", "power_sum"),
]


def main():
    sys.path.insert(0, ROOT)
    from bench import V5E_HBM_PEAK, planar_pipeline_bytes

    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    mother = wt.Morlet(6)
    half = mother.analytic_negligible_negative()
    grid = build_scale_grid(N0, DT, dj=0.25, s0=2 * DT, J=S - 1)
    scales = jnp.asarray(grid.sj, jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N0), jnp.float32)
    t0 = time.perf_counter()
    sr0, si0 = jax.jit(lambda v: fft_of_real_planar(v, N0, half=half))(x)
    np.asarray(sr0[:8])
    print(f"  forward DFT ready ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    results = {}
    for prec, mode in MODES:
        def pipeline(sr, si):
            out = fused_cwt_planar(sr, si, scales, mother=mother, nfft=N0,
                                   dt=DT, precision=prec, output=mode)
            if mode == "planes":
                wr, wi = out
                return (wr * wr + wi * wi).mean(-1)
            if mode == "power":
                return out.mean(-1)
            return out / N0

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
        run(f_lo)
        run(f_hi)
        print(f"  {prec}/{mode}: compiled ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        # Min of several sane slopes: tunnel stalls only ever ADD time, so
        # the minimum is the least-contaminated estimate of device pace
        # (mid-run window drift made single-slope cross-mode comparisons
        # unreliable in the first round-4 run).
        cands = []
        for _ in range(4):
            t_lo, _ = run(f_lo)
            t_hi, out = run(f_hi)
            cand = (t_hi - t_lo) / (n_hi - n_lo)
            if 1e-3 <= cand <= 0.5:
                cands.append(cand)
            if len(cands) >= 3:
                break
        if cands:
            per_iter = min(cands)
        else:
            t_hi, out = run(f_hi)
            per_iter = t_hi / n_hi
        assert np.isfinite(out).all()
        bts = planar_pipeline_bytes(N0, S, half, prec, mode)
        results[f"{prec}/{mode}"] = {
            "ms_per_transform": per_iter * 1e3,
            "sample_scales_per_s": N0 * S / per_iter,
            "hbm_model_bytes": bts,
            "achieved_hbm_gbps": bts / per_iter / 1e9,
            "pct_hbm_peak_v5e": 100.0 * (bts / per_iter) / V5E_HBM_PEAK,
        }
        print(f"  {prec}/{mode}: {per_iter*1e3:.2f} ms "
              f"({N0*S/per_iter:.3g} ss/s, "
              f"{bts/per_iter/1e9:.0f} GB/s)", file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
