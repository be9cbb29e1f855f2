#!/usr/bin/env python
"""Benchmark harness — headline metric per BASELINE.json:

    sample-scales/s/chip on a 1M-point Morlet-6 CWT with 64 scales (f32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` is the ratio against the 1e9 sample-scales/s/chip target
(the reference publishes no numbers of its own — BASELINE.md).
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

TARGET = 1e9  # sample-scales/s/chip north-star target (BASELINE.json)


def main():
    import pycwt_tpu as wt
    from pycwt_tpu.config import DEFAULT
    from pycwt_tpu.transform import build_scale_grid, cwt_batch

    B = 1
    N0 = 1 << 20          # 1M points
    S = 64                # scales
    dt = 1.0
    dj = 0.25             # 64 scales: s0=2dt, J=63 → sj up to 2·2^15.75
    mother = wt.Morlet(6)
    grid = build_scale_grid(N0, dt, dj=dj, s0=2 * dt, J=S - 1)
    assert len(grid.sj) == S
    nfft = DEFAULT.fft_length(N0)
    scales = jnp.asarray(grid.sj, dtype=jnp.float32)

    def fwd(x):
        W, _ = cwt_batch(x, scales, dt, mother=mother, nfft=nfft)
        power = jnp.abs(W) ** 2
        return power.mean(-1)  # global wavelet spectrum keeps W from being DCE'd

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N0)), dtype=jnp.float32)

    fn = jax.jit(fwd)
    # Warmup / compile
    out = jax.block_until_ready(fn(x))
    assert np.isfinite(np.asarray(out)).all()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    jax.block_until_ready(out)
    dt_s = (time.perf_counter() - t0) / iters

    sample_scales_per_s = B * N0 * S / dt_s
    print(json.dumps({
        "metric": "sample_scales_per_s_per_chip",
        "value": sample_scales_per_s,
        "unit": "sample-scales/s (1M-pt Morlet-6, 64 scales, f32)",
        "vs_baseline": sample_scales_per_s / TARGET,
    }))


if __name__ == "__main__":
    main()
