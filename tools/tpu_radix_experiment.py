#!/usr/bin/env python
"""Which radix factorization of the col-DFT runs fastest on this MXU?

Kernel B (the second four-step stage) is ~60% of transform time; its col-DFT
of size R1 = 1024 currently runs as two radix-32 substages (K=32 matmuls, the
MXU's depth-utilization worst case).  This times kernel B standalone under
several factorizations:

    (32, 32)   — balanced (current default)
    (128, 8)   — first substage at full MXU depth
    (8, 128)   — second substage at full MXU depth
    (64, 16) / (16, 64) — intermediate

with the chained-loop methodology, plus a correctness check per variant.

Usage: timeout 1500 python tools/tpu_radix_experiment.py [iters_lo iters_hi]
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from pycwt_tpu.ops import pallas_fft as pf  # noqa: E402

NFFT = 1 << 20
S = 64
R1, R2 = pf._nfft_factors(NFFT)   # 1024, 1024
Cblk = 256

SPLITS = [(32, 32), (128, 8), (8, 128), (64, 16), (16, 64)]


def kernel_b_variant(split, precision=jax.lax.Precision.HIGHEST):
    consts1 = pf._dft_tables(R1, split=split)
    (f1r, f1i), (wr_, wi_), (f2r, f2i), r1, r2, G1, G2 = consts1
    tabs = [jnp.asarray(a) for a in (f1r, f1i, wr_, wi_, f2r, f2i)]
    tab_specs = [pl.BlockSpec(a.shape, lambda *_: (0,) * a.ndim) for a in tabs]
    kern = pf._make_kernel_b(R1, R2, Cblk, r1, r2, G1, G2, 1.0 / NFFT,
                             power_out=False, precision=precision)
    out_shape = [jax.ShapeDtypeStruct((S, R1, R2), jnp.float32)] * 2

    def run(tr, ti):
        return pl.pallas_call(
            kern,
            grid=(S, R2 // Cblk),
            in_specs=[pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c)),
                      pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c))]
            + tab_specs,
            out_specs=[pl.BlockSpec((1, R1, Cblk), lambda s, c: (s, 0, c))] * 2,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tr, ti, *tabs)

    return run


def main():
    n_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    rng = np.random.default_rng(0)
    tr = jnp.asarray(rng.standard_normal((S, R1, R2)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((S, R1, R2)), jnp.float32)

    # Correctness reference from the balanced split on a small slice.
    ref = None
    results = {}
    for split in SPLITS:
        name = f"{split[0]}x{split[1]}"
        try:
            run1 = kernel_b_variant(split)

            def chained(a, b, salt, iters):
                def body(i, carry):
                    a, acc = carry
                    wr, wi = run1(a, b)
                    a = a * (1.0 + wr[0, 0, 0] * jnp.float32(1e-12))
                    return a, acc + wr[0, 0, 0]
                _, acc = jax.lax.fori_loop(
                    0, iters, body, (a + salt, jnp.float32(0)))
                return acc

            f_lo = jax.jit(lambda a, b, z: chained(a, b, z, n_lo))
            f_hi = jax.jit(lambda a, b, z: chained(a, b, z, n_hi))
            salt = [0]

            def timed(f):
                salt[0] += 1
                t0 = time.perf_counter()
                out = np.asarray(f(tr, ti, jnp.float32(salt[0] * 1e-7)))
                return time.perf_counter() - t0, out

            timed(f_lo)
            timed(f_hi)
            per_iter = None
            for _ in range(3):
                t_lo, _ = timed(f_lo)
                t_hi, _ = timed(f_hi)
                cand = (t_hi - t_lo) / (n_hi - n_lo)
                if 5e-4 <= cand <= 1.0:
                    per_iter = cand
                    break
            if per_iter is None:
                t_hi, _ = timed(f_hi)
                per_iter = t_hi / n_hi

            wr, wi = run1(tr, ti)
            got = np.asarray(wr[0, :4, :4])
            if ref is None:
                ref = got
                err = 0.0
            else:
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
            results[name] = {"ms_per_call": per_iter * 1e3,
                             "rel_diff_vs_32x32": err}
            print(f"  {name}: {per_iter*1e3:.2f} ms  (diff {err:.1e})",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:120]}
            print(f"  {name}: FAILED {results[name]['error']}",
                  file=sys.stderr, flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
