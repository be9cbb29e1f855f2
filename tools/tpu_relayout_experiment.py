#!/usr/bin/env python
"""Isolate WHERE kernel B's time goes at the Mosaic level.

Round-2/3 established the fused CWT kernel sits at a plateau that no radix
split, block size, precision tier, or megakernel variant moves (BASELINE.md),
and round 4 showed removing 2-3x of its HBM traffic leaves the 'high' tier
flat — the bound is neither MXU FLOPs nor HBM bytes.  This experiment proves
the remaining hypothesis (Mosaic relayout/VPU cost) by timing kernel B — the
dominant kernel — in ablated variants that keep the matmul WORK identical
while removing specific non-matmul stages:

* ``full``       — the real col-DFT: substage 1, twiddle, inter-substage
                   transpose (swapaxes), substage 2;
* ``notwiddle``  — drop the planar twiddle multiply (2 VPU passes over the
                   tile); transpose kept;
* ``noswap``     — drop the inter-substage transpose (for the balanced
                   32x32 split the replacement reshape is shape-identical,
                   i.e. FREE); twiddle kept;
* ``dotsonly``   — both dropped: pure MXU dot chain.

All ablations compute WRONG numbers by design (the structure, not the math,
is under test); each runs the same 8 (or 16 at bf16x2) MXU dots per tile.
full − noswap = transpose relayout cost; full − notwiddle = twiddle VPU
cost; dotsonly = the MXU floor Mosaic actually achieves for this dot chain.

Usage: timeout 1500 python tools/tpu_relayout_experiment.py [precision]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pycwt_tpu.ops.pallas_fft import (_dft_tables, _dot_bf16x2,  # noqa: E402
                                      _read_tables)

S = 64
R1 = R2 = 1 << 10          # N = 2^20, balanced split
CBLK = 256


def make_kernel(variant: str, precision):
    def kernel(tr_ref, ti_ref, f1r, f1i, wr_, wi_, f2r, f2i,
               or_ref, oi_ref):
        (F1r, F1i), (twr, twi), (F2r, F2i), r1, r2, _, _ = _read_tables(
            (f1r, f1i, wr_, wi_, f2r, f2i), 32, 32, 1, 1)
        if precision == "bf16x2":
            dot = _dot_bf16x2
        else:
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
        tr = tr_ref[0]
        ti = ti_ref[0]
        v2r = tr.reshape(r1, r2 * CBLK)
        v2i = ti.reshape(r1, r2 * CBLK)
        pr = dot(F1r, v2r) - dot(F1i, v2i)
        pi = dot(F1r, v2i) + dot(F1i, v2r)
        if variant in ("full", "noswap"):
            p3r = pr.reshape(r1, r2, CBLK)
            p3i = pi.reshape(r1, r2, CBLK)
            qr = (p3r * twr[:, :, None] - p3i * twi[:, :, None])
            qi = (p3r * twi[:, :, None] + p3i * twr[:, :, None])
        else:
            qr = pr.reshape(r1, r2, CBLK)
            qi = pi.reshape(r1, r2, CBLK)
        if variant in ("full", "notwiddle"):
            qr = jnp.swapaxes(qr, 0, 1).reshape(r2, r1 * CBLK)
            qi = jnp.swapaxes(qi, 0, 1).reshape(r2, r1 * CBLK)
        else:  # balanced split: shape-identical reshape, no transpose
            qr = qr.reshape(r2, r1 * CBLK)
            qi = qi.reshape(r2, r1 * CBLK)
        zr = dot(F2r, qr) - dot(F2i, qi)
        zi = dot(F2r, qi) + dot(F2i, qr)
        or_ref[0] = zr.reshape(R1, CBLK)
        oi_ref[0] = zi.reshape(R1, CBLK)

    return kernel


def build(variant: str, precision):
    consts = _dft_tables(R1)
    (f1r, f1i), (wr_, wi_), (f2r, f2i), *_ = consts
    tabs = [jnp.asarray(a) for a in (f1r, f1i, wr_, wi_, f2r, f2i)]
    tab_specs = [pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim)
                 for a in tabs]
    kern = make_kernel(variant, precision)

    def run(tr, ti):
        return pl.pallas_call(
            kern,
            grid=(S, R2 // CBLK),
            in_specs=[pl.BlockSpec((1, R1, CBLK), lambda s, c: (s, 0, c)),
                      pl.BlockSpec((1, R1, CBLK), lambda s, c: (s, 0, c))]
            + tab_specs,
            out_specs=[pl.BlockSpec((1, R1, CBLK), lambda s, c: (s, 0, c)),
                       pl.BlockSpec((1, R1, CBLK), lambda s, c: (s, 0, c))],
            out_shape=[jax.ShapeDtypeStruct((S, R1, R2), jnp.float32),
                       jax.ShapeDtypeStruct((S, R1, R2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tr, ti, *tabs)

    return run


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "high"
    precision = {"highest": jax.lax.Precision.HIGHEST,
                 "high": "bf16x2",
                 "fast": jax.lax.Precision.DEFAULT}[tier]
    rng = np.random.default_rng(0)
    tr0 = jnp.asarray(rng.standard_normal((S, R1, R2)), jnp.float32)
    ti0 = jnp.asarray(rng.standard_normal((S, R1, R2)), jnp.float32)

    results = {}
    for variant in ("full", "notwiddle", "noswap", "dotsonly"):
        run = build(variant, precision)

        @jax.jit
        def loop(tr, ti, iters):
            def body(i, carry):
                a, b, acc = carry
                zr, zi = run(a, b)
                # data dependency: fold one output element back in
                a = a * (1.0 + zr[0, 0, 0] * jnp.float32(1e-12))
                return a, b, acc + zr[0, 0, 0]
            return jax.lax.fori_loop(
                0, iters, body, (tr, ti, jnp.float32(0.0)))[2]

        np.asarray(loop(tr0, ti0, 2))
        per_iter = None
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(loop(tr0, ti0, 5))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); np.asarray(loop(tr0, ti0, 15))
            t_hi = time.perf_counter() - t0
            cand = (t_hi - t_lo) / 10
            if 5e-4 <= cand <= 0.2:
                per_iter = cand
                break
        if per_iter is None:
            per_iter = t_hi / 15
        results[variant] = per_iter * 1e3
        print(f"  {variant:10s}: {per_iter * 1e3:.2f} ms", file=sys.stderr,
              flush=True)

    out = {"metric": "kernel_b_ablation_ms", "tier": tier,
           "S": S, "R1": R1, "R2": R2, **results}
    if "full" in results and "dotsonly" in results:
        out["non_matmul_share_pct"] = 100.0 * (
            results["full"] - results["dotsonly"]) / results["full"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
