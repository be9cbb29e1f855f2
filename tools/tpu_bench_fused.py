#!/usr/bin/env python
"""TPU validation + benchmark of the fused Pallas CWT vs the XLA path.

Avoids complex64 device→host transfers (planar fetch) and uses chained
fori_loop timing with unique salts (robust to tunnel caching/latency).
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.ops.pallas_fft import fused_cwt
from pycwt_tpu.ops.filterbank import filter_bank, angular_frequencies
from pycwt_tpu.transform import build_scale_grid, cwt_batch


def fetch(x):
    if jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def main():
    mother = wt.Morlet(6)
    rng = np.random.default_rng(0)

    # ---- correctness at 2^14 --------------------------------------------
    nfft = 1 << 14
    X = jnp.fft.fft(jnp.asarray(rng.standard_normal(nfft), jnp.float32)).astype(jnp.complex64)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(8) * 0.5), jnp.float32)
    ftf = angular_frequencies(nfft, 1.0, jnp.float32)
    bank = filter_bank(mother, scales, ftf, 1.0).astype(jnp.complex64)
    W_ref = fetch(jnp.fft.ifft(X[None] * bank, axis=-1))
    W = fetch(fused_cwt(X, scales, mother=mother, nfft=nfft, dt=1.0,
                        Ablk=128, Cblk=128))
    print("TPU fused W rel err:",
          np.abs(W - W_ref).max() / np.abs(W_ref).max(), flush=True)
    p = np.asarray(fused_cwt(X, scales, mother=mother, nfft=nfft, dt=1.0,
                             Ablk=128, Cblk=128, power_only=True))
    p_ref = (np.abs(W_ref) ** 2).sum(-1)
    print("TPU power rel err:", np.abs(p - p_ref).max() / p_ref.max(),
          flush=True)

    # ---- benchmark at 2^20, 64 scales -----------------------------------
    N0 = 1 << 20
    S = 64
    grid = build_scale_grid(N0, 1.0, dj=0.25, s0=2.0, J=S - 1)
    scales_np = np.asarray(grid.sj, np.float32)
    x = jnp.asarray(rng.standard_normal((1, N0)), jnp.float32)

    def xla_pipeline(xb):
        Wb, _ = cwt_batch(xb, jnp.asarray(scales_np), 1.0, mother=mother, nfft=N0)
        return (jnp.abs(Wb) ** 2).sum(-1)

    def fused_power_pipeline(xb):
        Xf = jnp.fft.fft(xb[0].astype(jnp.complex64))
        return fused_cwt(Xf, jnp.asarray(scales_np), mother=mother, nfft=N0,
                         dt=1.0, Ablk=256, Cblk=256, power_only=True)[None]

    def fused_fullW_pipeline(xb):
        Xf = jnp.fft.fft(xb[0].astype(jnp.complex64))
        Wf = fused_cwt(Xf, jnp.asarray(scales_np), mother=mother, nfft=N0,
                       dt=1.0, Ablk=256, Cblk=256, power_only=False)
        return (jnp.abs(Wf) ** 2).sum(-1)[None]

    # cross-check pipelines agree on TPU
    a = np.asarray(xla_pipeline(x))
    b = np.asarray(fused_power_pipeline(x))
    c = np.asarray(fused_fullW_pipeline(x))
    print("pipeline agreement: fused-power vs xla %.3e ; fused-W vs xla %.3e"
          % (np.abs(b - a).max() / np.abs(a).max(),
             np.abs(c - a).max() / np.abs(a).max()), flush=True)

    def chained(pipeline, xb, salt, iters):
        def body(i, carry):
            xb, acc = carry
            out = pipeline(xb)
            xb = xb * (1.0 + out[0, 0] * jnp.float32(1e-14))
            return xb, acc + out
        _, accv = jax.lax.fori_loop(0, iters, body,
                                    (xb + salt, jnp.zeros((1, S), jnp.float32)))
        return accv

    results = {}
    salt_counter = [0]
    for name, pipe in [("xla", xla_pipeline), ("fused_power", fused_power_pipeline),
                       ("fused_fullW", fused_fullW_pipeline)]:
        times = {}
        for iters in (20, 60):
            f = jax.jit(functools.partial(chained, pipe), static_argnums=2)
            salt_counter[0] += 1
            jax.block_until_ready(f(x, jnp.float32(salt_counter[0] * 1e-7), iters))
            salt_counter[0] += 1
            t0 = time.perf_counter()
            jax.block_until_ready(f(x, jnp.float32(salt_counter[0] * 1e-7), iters))
            times[iters] = time.perf_counter() - t0
        per = (times[60] - times[20]) / 40
        results[name] = per
        print(f"{name}: per-iter {per*1e3:.2f} ms -> "
              f"{N0 * S / per:.3e} sample-scales/s", flush=True)

    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
