#!/usr/bin/env python
"""Single-chip measurement of the PLANAR pencil-FFT spectral CWT stages.

`sharded_cwt_spectral_planar` exists for multi-chip sequence parallelism
(3 × all_to_all over ICI); on ONE device the collectives are degenerate, so
this measures the pure compute cost of its planar MXU-DFT stages on the real
chip — the runtime the planar re-expression was built for (VERDICT r3 #3
'Done' clause: a single-chip measurement of the planar stages).

Compares against the fused single-chip pipeline (which is what you should
use on one chip — the pencil path's value is its O(N/D) memory and exact
spectrum across devices).

Usage: timeout 1500 python tools/tpu_bench_spectral.py [N_pow] [S]
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
from jax.sharding import Mesh  # noqa: E402

from pycwt_tpu.mothers import Morlet  # noqa: E402
from pycwt_tpu.parallel.dist_fft import (  # noqa: E402
    sharded_cwt_spectral_planar)
from pycwt_tpu.transform import build_scale_grid  # noqa: E402
from pycwt_tpu.utils.helpers import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dt = 1.0
    mother = Morlet(6)
    grid = build_scale_grid(N, dt, dj=0.25, s0=2 * dt, J=S - 1)
    scales = jnp.asarray(grid.sj, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(N), jnp.float32)

    @jax.jit
    def loop(x, iters):
        def body(i, carry):
            v, acc = carry
            wr, wi = sharded_cwt_spectral_planar(mesh, v, scales, dt,
                                                 mother=mother)
            g = (wr[0, 0] * wr[0, 0] + wi[0, 0] * wi[0, 0])
            return v * (1.0 + g * jnp.float32(1e-12)), acc + g
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))[1]

    t0 = time.perf_counter()
    np.asarray(loop(x0, 2))
    compile_s = time.perf_counter() - t0
    per_iter = None
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(loop(x0, 4))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(loop(x0, 12))
        t_hi = time.perf_counter() - t0
        cand = (t_hi - t_lo) / 8
        if 1e-3 <= cand <= 1.0:
            per_iter = cand
            break
    if per_iter is None:
        per_iter = t_hi / 12
    print(json.dumps({
        "metric": "planar_pencil_spectral_cwt_single_chip",
        "N": N, "S": S,
        "ms_per_transform": per_iter * 1e3,
        "sample_scales_per_s": N * S / per_iter,
        "compile_s": compile_s,
    }))


if __name__ == "__main__":
    main()
