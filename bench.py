#!/usr/bin/env python
"""Benchmark harness — headline metric per BASELINE.json:

    sample-scales/s/chip on a 1M-point Morlet-6 CWT with 64 scales (f32).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` is the ratio against the 1e9 sample-scales/s/chip target
(the reference publishes no numbers of its own — BASELINE.md).

Methodology: the pipeline is iterated on-device inside a single jitted
``lax.fori_loop`` whose carry feeds each iteration's output back into the next
input (airtight data dependency — no host round-trips, no transfer overhead,
and robust against any result caching in the runtime).  Reported time is the
slope between two loop counts, which cancels fixed dispatch cost.

Completion is forced by fetching the (tiny, B×S) result to host with
``np.asarray`` — on the tunneled "axon" platform ``block_until_ready`` has
been observed to return before device execution finishes, which silently
turns a timing loop into a dispatch-latency measurement; a host transfer of
the output cannot return early.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

TARGET = 1e9  # sample-scales/s/chip north-star target (BASELINE.json)

# v5e MXU peak (bf16 FLOP/s) for the roofline row in BASELINE.md.
V5E_BF16_PEAK = 197e12
# v5e HBM bandwidth for the BYTES roofline row (VERDICT r3 #1a).
V5E_HBM_PEAK = 819e9


def planar_pipeline_bytes(N: int, S: int, analytic: bool, precision: str,
                          output: str) -> float:
    """HBM bytes moved by one planar fused-CWT transform — the bytes-roofline
    model (VERDICT r3 weak #1).  Streams: forward-DFT read/write, kernel A's
    X read + T write, kernel B's T read + epilogue write.  T is bf16 at the
    ``fast`` tier (pallas_fft), f32 otherwise."""
    half_n = N // 2 if analytic else N
    t_item = 2 if precision == "fast" else 4
    fwd = 4 * N + 2 * 4 * half_n                 # x in, (re, im) spectrum out
    ka = 2 * 4 * half_n + 2 * t_item * S * N     # X planes in, T planes out
    kb = 2 * t_item * S * N                      # T planes in
    if output == "planes":
        kb += 2 * 4 * S * N
    elif output == "power":
        kb += 4 * S * N
    else:   # power_sum: |W|² map out + XLA reduction read-back
        kb += 2 * 4 * S * N
    return float(fwd + ka + kb)


def _col_dft_flops(R: int, A: int, rows_present: int | None = None) -> float:
    """MXU FLOPs of one planar in-VMEM col-DFT of size R over A columns
    (two balanced radix substages of 4 real matmuls each + twiddle)."""
    p = R.bit_length() - 1
    r1 = 1 << (p // 2)
    r2 = R // r1
    h1 = (rows_present // r2) if rows_present else r1
    sub1 = 4 * 2 * r1 * h1 * (r2 * A)     # (r1,h1)@(h1, r2*A) ×4
    sub2 = 4 * 2 * r2 * r2 * (r1 * A)     # (r2,r2)@(r2, r1*A) ×4
    return sub1 + sub2 + 6 * R * A


def planar_pipeline_flops(N: int, S: int, analytic: bool) -> float:
    """f32-equivalent FLOPs of one planar CWT transform (forward half DFT +
    S × fused two-kernel four-step inverse).  Used for the roofline /
    MFU accounting (VERDICT r2 #7); multiply by the precision pass count
    (bf16x3 → 3) for MXU issue rate."""
    p = N.bit_length() - 1
    R1 = 1 << (p // 2)
    R2 = N // R1
    # forward four-step (real input, half output when analytic)
    fr1 = 1 << ((p + 1) // 2)
    fr2 = N // fr1
    out_cols = fr2 // 2 if analytic else fr2
    fwd = 2 * 2 * fr1 * fr1 * fr2 + 4 * 2 * fr1 * fr2 * out_cols + 6 * N
    rows = R2 // 2 if analytic else R2
    kernel_a = _col_dft_flops(R2, R1, rows_present=rows) + 12 * R1 * R2
    kernel_b = _col_dft_flops(R1, R2)
    return fwd + S * (kernel_a + kernel_b)


def main():
    import pycwt_tpu as wt
    from pycwt_tpu.transform import build_scale_grid, cwt_batch
    from pycwt_tpu.utils.helpers import enable_compilation_cache

    # Persistent XLA/Mosaic compile cache: the ~45-60 s "compile+warm" phase
    # is per-machine, not per-process (VERDICT r3 #5) — a re-run of this
    # bench in a fresh process starts warm.
    enable_compilation_cache()

    B = 1
    N0 = 1 << 20          # 1M points (pow-2: no padding)
    S = 64                # scales
    dt = 1.0
    mother = wt.Morlet(6)
    grid = build_scale_grid(N0, dt, dj=0.25, s0=2 * dt, J=S - 1)
    assert len(grid.sj) == S
    scales_np = np.asarray(grid.sj, np.float32)

    # Engine ladder, most- to least-preferred:
    #   1. "planar-pallas": MXU four-step forward DFT + fused Pallas kernel,
    #      all PLANAR f32 — touches neither the XLA FFT custom call nor any
    #      complex dtype (both observed to be intermittently UNIMPLEMENTED on
    #      the tunneled axon runtime).  ~1.5× the XLA FFT path on v5e.
    #   2. complex engines via cwt_batch ("pallas" → "mxu" → "xla") for
    #      backends where planar Pallas itself doesn't compile.
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar
    from pycwt_tpu.ops.pallas_fft import fused_cwt_planar

    scales_j = jnp.asarray(scales_np)
    # Morlet-6 is analytic below f32 round-off: the forward DFT only needs
    # the positive-frequency half (~2/3 the compute, half the write).
    half = mother.analytic_negligible_negative()

    # The kernel tier follows the LIBRARY default (CWTConfig.precision) so
    # the headline measures what wt.cwt users actually get.
    from pycwt_tpu.config import DEFAULT as _CFG
    precision = _CFG.precision

    def pipeline_planar(x):                  # x: (1, N0) f32
        sr, si = fft_of_real_planar(x[0], N0, half=half)
        # Σ_t |W|² is computed inside kernel B's epilogue (output="power_sum")
        # — the planar W planes never round-trip HBM, removing a third of the
        # pipeline's traffic for this (global-spectrum) consumer while still
        # executing the full inverse DFT per (scale, t) (VERDICT r3 #1c).
        pw = fused_cwt_planar(sr, si, scales_j, mother=mother,
                              nfft=N0, dt=dt, precision=precision,
                              output="power_sum")
        return (pw / N0)[None]                      # (1, S) mean power

    def make_pipeline_complex(eng):
        def pipeline(x):
            W, _ = cwt_batch(x, scales_j, dt, mother=mother, nfft=N0,
                             engine=eng)
            return (jnp.abs(W) ** 2).mean(-1)       # (B, S)
        return pipeline

    pipeline = None
    engine = "planar-pallas"
    try:
        probe = jnp.zeros((1, N0), jnp.float32)
        np.asarray(jax.jit(pipeline_planar)(probe))
        pipeline = pipeline_planar
    except Exception:
        for eng in ("pallas", "mxu", "xla"):
            try:
                cand = make_pipeline_complex(eng)
                np.asarray(jax.jit(cand)(jnp.zeros((1, N0), jnp.float32)))
                pipeline, engine = cand, eng
                break
            except Exception:
                continue
    if pipeline is None:
        raise RuntimeError("no CWT engine compiles+runs on this backend")

    def chained(x, salt, iters):
        def body(i, carry):
            x, acc = carry
            gws = pipeline(x)
            # Data dependency: fold a scalar of the output back into the input
            # so iterations can neither be elided, cached, nor overlapped.
            x = x * (1.0 + gws[0, 0] * jnp.float32(1e-12))
            return x, acc + gws
        _, acc = jax.lax.fori_loop(
            0, iters, body, (x + salt, jnp.zeros((x.shape[0], S), jnp.float32))
        )
        return acc

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N0)), jnp.float32)

    # Loop counts sized so device time (~1s / ~3s) dominates tunnel jitter.
    n_lo, n_hi = 50, 150
    f_lo = jax.jit(lambda x, s: chained(x, s, n_lo))
    f_hi = jax.jit(lambda x, s: chained(x, s, n_hi))

    from pycwt_tpu.utils.profiling import PhaseTimer

    timer = PhaseTimer()
    salt_box = [0]

    def run(f):
        """Each call gets a unique salt input so no runtime layer can ever
        serve a cached/deduped result for an identical (executable, inputs).
        np.asarray forces a host fetch of the (B, S) output — the only
        completion barrier that provably waits on the axon tunnel."""
        salt_box[0] += 1
        t0 = time.perf_counter()
        out = np.asarray(f(x, jnp.float32(salt_box[0] * 1e-7)))
        return time.perf_counter() - t0, out

    with timer.phase("compile+warm"):
        run(f_lo)   # warm/compile
        run(f_hi)

    # One timed call per loop count; retry the pair until the slope lands in
    # a physically-sane window (the runtime occasionally injects multi-second
    # stalls or returns early — both are detectable for this workload).
    per_iter = None
    for _ in range(4):
        with timer.phase("measure", samples=B * N0 * (n_lo + n_hi), scales=S):
            t_lo, _ = run(f_lo)
            t_hi, out_hi = run(f_hi)
        cand = (t_hi - t_lo) / (n_hi - n_lo)
        if 1e-3 <= cand <= 0.2:  # 1 ms .. 200 ms per 64×1M-pt transform
            per_iter = cand
            break
    if per_iter is None:
        # Conservative upper bound: whole-run time incl. fixed overhead.
        t_hi, out_hi = run(f_hi)
        per_iter = t_hi / n_hi
    assert np.isfinite(np.asarray(out_hi)).all()
    sample_scales_per_s = B * N0 * S / per_iter

    # Roofline / MFU accounting (planar path only — the complex-engine
    # fallbacks have different FLOP shapes; report null there).
    roofline = {}
    if engine == "planar-pallas":
        flops = planar_pipeline_flops(N0, S, half)
        achieved = flops / per_iter
        # MXU passes per f32-equivalent FLOP for the active tier.
        passes = {"highest": 3, "high": 2, "fast": 1}[precision]
        issue = achieved * passes
        hbm_bytes = planar_pipeline_bytes(N0, S, half, precision, "power_sum")
        roofline = {
            "flops_per_transform": flops,
            "achieved_tflops_f32equiv": achieved / 1e12,
            "mxu_issue_tflops_bf16": issue / 1e12,
            "pct_mxu_peak_v5e": 100.0 * issue / V5E_BF16_PEAK,
            # Bytes roofline (VERDICT r3 #1a): modelled HBM traffic of the
            # active pipeline vs v5e's ~819 GB/s.
            "hbm_bytes_per_transform": hbm_bytes,
            "achieved_hbm_gbps": hbm_bytes / per_iter / 1e9,
            "pct_hbm_peak_v5e": 100.0 * (hbm_bytes / per_iter) / V5E_HBM_PEAK,
        }
    print(json.dumps({
        "metric": "sample_scales_per_s_per_chip",
        "value": sample_scales_per_s,
        "unit": (f"sample-scales/s (1M-pt Morlet-6, 64 scales, f32, {engine} "
                 f"engine, precision={precision})"),
        "vs_baseline": sample_scales_per_s / TARGET,
        "phases": timer.report(),
        **roofline,
    }))


if __name__ == "__main__":
    main()
