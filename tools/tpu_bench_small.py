#!/usr/bin/env python
"""Small-nfft CWT on the chip: direct-DFT Pallas kernel vs planar-XLA matmuls.

VERDICT r2 #4's acceptance check: a NINO3-sized (nfft=512) fused-kernel run
on real Mosaic, measured against the `_small_planar_xla` formulation it
replaces.  Also covers the MC-sized nfft=1024/2048 points.

Methodology: chained `lax.fori_loop` with a data dependency (same as
bench.py); completion forced by host fetch.
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

from pycwt_tpu.mothers import Morlet  # noqa: E402
from pycwt_tpu.ops.mxu_dft import fft_of_real_planar  # noqa: E402
from pycwt_tpu.ops.pallas_fft import (  # noqa: E402
    _fused_cwt_small, _small_planar_xla,
)
from pycwt_tpu.transform import build_scale_grid  # noqa: E402

ITERS = int(os.environ.get("PYCWT_TPU_SMALL_ITERS", "200"))
mother = Morlet(6)
interpret = jax.default_backend() not in ("tpu", "axon")

results = {}
for nfft, n0 in ((512, 504), (1024, 885), (2048, 1771)):
    dt = 0.25
    grid = build_scale_grid(n0, dt, dj=1 / 12, mother=mother)
    scales = jnp.asarray(grid.sj, jnp.float32)
    S = len(grid.sj)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n0), jnp.float32)
    sr, si = fft_of_real_planar(x, nfft)

    def make_loop(fn):
        @jax.jit
        def loop(sr, si):
            def body(i, carry):
                a, b, acc = carry
                wr, wi = fn(a, b)
                w0 = wr[0, 0] * jnp.float32(1e-12)
                return a * (1 + w0), b * (1 + w0), acc + wr.sum()
            _, _, acc = jax.lax.fori_loop(
                0, ITERS, body, (sr, si, jnp.float32(0)))
            return acc
        return loop

    def pallas_fn(a, b):
        return _fused_cwt_small(a, b, scales, mother=mother, nfft=nfft,
                                dt=dt, interpret=interpret,
                                precision=jax.lax.Precision.HIGHEST,
                                analytic=mother.analytic_negligible_negative())

    def xla_fn(a, b):
        return _small_planar_xla(a, b, scales, mother=mother, nfft=nfft,
                                 dt=dt,
                                 precision=jax.lax.Precision.HIGHEST)

    row = {"S": S}
    for name, fn in (("pallas_direct", pallas_fn), ("planar_xla", xla_fn)):
        try:
            loop = make_loop(fn)
            np.asarray(loop(sr, si))          # compile + warm
            t0 = time.perf_counter()
            out = np.asarray(loop(sr, si))
            wall = time.perf_counter() - t0
            assert np.isfinite(out)
            row[name] = {
                "us_per_transform": wall / ITERS * 1e6,
                "sample_scales_per_s": n0 * S * ITERS / wall,
            }
        except Exception as e:
            row[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(f"  nfft={nfft} {name}: {row[name]}", file=sys.stderr,
              flush=True)
    # cross-check numerics between the two formulations
    try:
        wr_p, wi_p = jax.jit(pallas_fn)(sr, si)
        wr_x, wi_x = jax.jit(xla_fn)(sr, si)
        m = float(np.abs(np.asarray(wr_x)).max())
        row["max_rel_diff"] = float(
            max(np.abs(np.asarray(wr_p) - np.asarray(wr_x)).max(),
                np.abs(np.asarray(wi_p) - np.asarray(wi_x)).max()) / m)
    except Exception as e:
        row["max_rel_diff"] = f"{type(e).__name__}: {e}"[:120]
    results[str(nfft)] = row

print(json.dumps({"metric": "small_nfft_kernel_bench", "iters": ITERS,
                  "sizes": results}))
