#!/usr/bin/env python
"""Mosaic lowering smoke for every Pallas kernel variant — seconds, not
minutes.

The pytest suite runs the kernels in interpret mode on CPU, which skips
Mosaic's lowering constraints entirely (e.g. "Can only load scalars from
SMEM", small-tile relayout rejections).  This tool `jax.jit(...).lower()`s
every kernel variant against the REAL TPU backend — that executes the
Pallas→Mosaic module lowering (where those constraints are enforced) without
paying device compile/execute time, so it stays fast even when the tunneled
backend is degraded.

Run on any change to pycwt_tpu/ops/pallas_fft.py:

    timeout 120 python tools/tpu_lower_check.py

Exit code 0 = all variants lower; non-zero prints the failing variant(s).
"""
from __future__ import annotations

import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("PYCWT_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PYCWT_TPU_PLATFORM"])

from pycwt_tpu.mothers import DOG, Morlet  # noqa: E402
from pycwt_tpu.ops.pallas_fft import fused_cwt_planar  # noqa: E402

S = 20  # deliberately not a multiple of 8 — exercises the S_pad path


def variants():
    """(name, nfft, spectrum_len, mother, output, precision, small_kernel)
    cases covering every dispatch branch of fused_cwt_planar — the small
    sizes under BOTH formulations (default planar-XLA and the opt-in
    direct-DFT Pallas kernel)."""
    morlet, dog = Morlet(6), DOG(2)
    for sk, tag in ((True, "kern"), (False, "xla")):
        for nfft in (512, 4096):
            yield f"small{nfft}-{tag}-morlet-full", nfft, nfft, morlet, "planes", "highest", sk
            yield f"small{nfft}-{tag}-morlet-half", nfft, nfft // 2, morlet, "planes", "highest", sk
            yield f"small{nfft}-{tag}-dog-full", nfft, nfft, dog, "planes", "highest", sk
        yield f"small512-{tag}-morlet-high", 512, 512, morlet, "planes", "high", sk
        yield f"small512-{tag}-morlet-fast", 512, 512, morlet, "planes", "fast", sk
    # Mid sizes 2^13/2^14: the smallest two-kernel sizes — their analytic
    # half-spectrum path once produced a Mosaic-rejected sublane-collapsing
    # reshape (round-4 regression; fixed by a shallower R2 split).
    for mid in (1 << 13, 1 << 14):
        yield f"mid{mid}-morlet-full", mid, mid, morlet, "planes", "highest", False
        yield f"mid{mid}-morlet-half", mid, mid // 2, morlet, "planes", "highest", False
        yield f"mid{mid}-dog-full", mid, mid, dog, "planes", "highest", False
    big = 1 << 20  # two-kernel four-step pipeline
    yield "big-morlet-full", big, big, morlet, "planes", "highest", False
    yield "big-morlet-half", big, big // 2, morlet, "planes", "highest", False
    yield "big-dog-full", big, big, dog, "planes", "highest", False
    yield "big-morlet-powersum", big, big, morlet, "power_sum", "highest", False
    yield "big-morlet-powermap", big, big, morlet, "power", "high", False
    yield "big-morlet-high", big, big, morlet, "planes", "high", False
    # "fast" now stores the inter-kernel T in bf16 — these two exercise the
    # bf16 block specs in both kernels (VERDICT r4 #1b).
    yield "big-morlet-fast", big, big, morlet, "planes", "fast", False
    yield "big-morlet-fast-powersum", big, big, morlet, "power_sum", "fast", False


def main():
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: backend is {backend!r}, not a TPU — Mosaic lowering "
              "constraints are only enforced against the TPU target.")
        return 0
    failures = []
    for (name, nfft, n_in, mother, output, precision,
         small_kernel) in variants():
        sr = jnp.zeros((n_in,), jnp.float32)
        si = jnp.zeros((n_in,), jnp.float32)
        sj = jnp.geomspace(2.0, 64.0, S, dtype=jnp.float32)
        f = functools.partial(fused_cwt_planar, mother=mother, nfft=nfft,
                              dt=0.25, output=output,
                              precision=precision, interpret=False,
                              small_kernel=small_kernel)
        t0 = time.time()
        try:
            jax.jit(f).lower(sr, si, sj)
            print(f"  ok   {name:30s} {time.time() - t0:5.1f}s", flush=True)
        except Exception as e:
            failures.append((name, f"{type(e).__name__}: {e}"[:160]))
            print(f"  FAIL {name:30s} {failures[-1][1]}", flush=True)

    # Planar pencil-FFT spectral CWT: must lower against the TPU target with
    # NO complex dtype in the HLO (VERDICT r3 #3 'Done' clause) — checked on
    # a 1-device mesh (the collectives are degenerate but present).
    try:
        from jax.sharding import Mesh

        import pycwt_tpu as wt
        from pycwt_tpu.parallel.dist_fft import sharded_cwt_spectral_planar

        mesh = Mesh(jax.devices()[:1], ("data",))
        x = jnp.zeros((1 << 12,), jnp.float32)
        sjs = jnp.geomspace(2.0, 64.0, 4, dtype=jnp.float32)
        t0 = time.time()
        lowered = jax.jit(lambda v: sharded_cwt_spectral_planar(
            mesh, v, sjs, 0.25, mother=Morlet(6))).lower(x)
        hlo = lowered.as_text()
        if "c64[" in hlo or "c128[" in hlo:
            failures.append(("spectral-planar", "complex dtype in lowered HLO"))
            print("  FAIL spectral-planar: complex dtype in lowered HLO")
        else:
            print(f"  ok   {'spectral-planar-nocomplex':30s} "
                  f"{time.time() - t0:5.1f}s", flush=True)
    except Exception as e:
        failures.append(("spectral-planar", f"{type(e).__name__}: {e}"[:160]))
        print(f"  FAIL spectral-planar {failures[-1][1]}", flush=True)

    if failures:
        print(f"{len(failures)} variant(s) failed Mosaic lowering")
        return 1
    print("all variants lower on Mosaic")
    return 0


if __name__ == "__main__":
    sys.exit(main())
