#!/usr/bin/env python
"""XLA einsum precision tiers for the planar smoothing DFT (MC's dominant
remaining stage): HIGHEST vs HIGH vs DEFAULT, on the MC smoothing shape.

Decides whether threading CWTConfig.precision into smooth_planar_pair is a
real win (XLA-TPU: DEFAULT = 1 bf16 pass; HIGH = 3; HIGHEST = 6 for f32
operands) and what it costs numerically.

Usage: timeout 580 python tools/tpu_smooth_precision_experiment.py
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
from pycwt_tpu.ops.smoothing import smooth_planar_pair  # noqa: E402

# MC chunk smoothing shape: batch=75 members, S=76 scales, n=885 samples.
B, S, N = 75, 76, 885
rng = np.random.default_rng(0)
Ta = jnp.asarray(rng.standard_normal((B, S, N)), jnp.float32)
Tb = jnp.asarray(rng.standard_normal((B, S, N)), jnp.float32)
scales = jnp.asarray(2.0 * 2 ** (np.arange(S) * 0.1), jnp.float32)
mother = Morlet(6)
ITERS = 10

results = {}
ref = None
for name, prec in [("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("HIGH", jax.lax.Precision.HIGH),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)]:
    @jax.jit
    def loop(Ta, Tb):
        def body(i, carry):
            a, b = carry
            sa, sb = smooth_planar_pair(a, b, 0.25, 1 / 12, scales, mother,
                                        precision=prec)
            # data dependency so iterations can't be elided
            return sa + 1e-12 * i, sb
        return jax.lax.fori_loop(0, ITERS, body, (Ta, Tb))

    out = np.asarray(loop(Ta, Tb)[0])  # compile + warm
    t0 = time.perf_counter()
    out = np.asarray(loop(Ta, Tb)[0])
    wall = time.perf_counter() - t0
    if ref is None:
        ref = out
        err = 0.0
    else:
        err = float(np.abs(out - ref).max() / np.abs(ref).max())
    results[name] = {"ms_per_pair_smooth": wall / ITERS * 1e3,
                     "rel_err_vs_highest": err}
    print(f"  {name}: {wall / ITERS * 1e3:.2f} ms, err {err:.2e}",
          file=sys.stderr, flush=True)

print(json.dumps({"metric": "smooth_planar_pair_precision", "shape": [B, S, N],
                  "tiers": results}))
