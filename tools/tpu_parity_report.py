#!/usr/bin/env python
"""f32 parity report vs the f64 reference goldens — BASELINE.json's parity
clause for the throughput path ("error reported vs f64 goldens").

Runs the NINO3 CWT-power, AO/Baltic XWT, and AO/Baltic WCT golden workloads
through the f32 pipeline under each engine (xla / mxu / pallas) on the current
default backend (the real TPU chip under axon; CPU when forced) and records
max relative error against the stored f64 reference goldens
(tests/golden/*.npz, generated from /root/reference by tools/make_goldens.py).

Prints one JSON document and (with --append-baseline) appends a markdown table
to BASELINE.md.

Usage:  timeout 580 python tools/tpu_parity_report.py [--append-baseline]
                                                      [--expect-complex]

``--expect-complex``: exit non-zero if any complex-dtype engine row (xla /
mxu / pallas) fails.  On the current tunneled axon runtime complex64 is
UNIMPLEMENTED in every observed window, so those rows are expected to fail
there and the default is lenient; run with this flag on the day a standard
TPU runtime (with complex64) is available to assert the full four-engine
table in one command (VERDICT r3 #7).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS=axon; honor an explicit override
# the same way the example scripts do (env var beaten only by jax.config).
if os.environ.get("PYCWT_TPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PYCWT_TPU_PLATFORM"])

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "golden")

ENGINES = ("xla", "mxu", "pallas", "planar", "twofloat")


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mask = np.abs(b) > 1e-12 * np.nanmax(np.abs(b))
    err = np.abs(a - b) / np.maximum(np.abs(b), 1e-300)
    return float(err[mask].max()) if mask.any() else float(np.abs(a - b).max())


def main():
    from pycwt_tpu.coherence import _wct_core
    from pycwt_tpu.config import CWTConfig
    from pycwt_tpu.mothers import Morlet
    from pycwt_tpu.transform import build_scale_grid, cwt_batch

    platform = jax.devices()[0].platform
    mother = Morlet(6)
    results = {}

    g_cwt = np.load(os.path.join(GOLD, "cwt_nino3_morlet6.npz"))
    g_xwt = np.load(os.path.join(GOLD, "xwt_jao_jbaltic_norm1.npz"))
    g_wct = np.load(os.path.join(GOLD, "wct_jao_jbaltic.npz"))

    single = None
    for a in sys.argv[1:]:
        if a.startswith("--engine="):
            single = a.split("=", 1)[1]

    if single is not None:
        # Child mode: one engine, one process (a failed op can poison the
        # whole tunneled-backend process, so the parent isolates engines).
        try:
            row = _engine_row(single, mother, g_cwt, g_xwt, g_wct)
        except Exception as e:
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row))
        return

    import subprocess
    import time

    # The tunneled backend's complex64/FFT support FLAPS (round-2's table
    # recorded 3 UNIMPLEMENTED rows captured in one bad window): retry each
    # failed engine a few times with a pause so one outage doesn't poison
    # the whole table.
    retries = int(os.environ.get("PYCWT_TPU_PARITY_RETRIES", "3"))
    for engine in ENGINES:
        for attempt in range(retries):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     f"--engine={engine}"],
                    capture_output=True, text=True, timeout=580,
                    env=os.environ, cwd=ROOT)
                results[engine] = json.loads(
                    out.stdout.strip().splitlines()[-1])
            except Exception as e:
                results[engine] = {"error": f"{type(e).__name__}: {e}"[:200]}
            if "error" not in results[engine]:
                break
            print(f"  engine={engine} attempt {attempt + 1}/{retries}: "
                  f"FAILED {results[engine]['error']}",
                  file=sys.stderr, flush=True)
            if attempt + 1 < retries:
                time.sleep(20)
        if "error" not in results[engine]:
            print(f"  engine={engine}: " + ", ".join(
                f"{k}={v:.2e}" for k, v in results[engine].items()),
                file=sys.stderr, flush=True)

    doc = {"metric": "f32_parity_vs_f64_goldens_max_rel_err",
           "platform": platform, "engines": results}
    print(json.dumps(doc))

    if "--expect-complex" in sys.argv:
        bad = [e for e, row in results.items() if "error" in row]
        if bad:
            print(f"--expect-complex: engine rows FAILED on this runtime: "
                  f"{bad}", file=sys.stderr)
            sys.exit(1)

    if "--append-baseline" in sys.argv:
        lines = [
            "",
            f"### Measured f32 parity vs f64 reference goldens ({platform})",
            "",
            "Max relative error of the f32 throughput path against the f64",
            "reference goldens (BASELINE.json parity clause; generated by",
            "`tools/tpu_parity_report.py`):",
            "",
            "| Engine | CWT power (NINO3) | XWT (AO/Baltic) | WCT (AO/Baltic) |",
            "|---|---|---|---|",
        ]
        for e, row in results.items():
            if "error" in row:
                lines.append(f"| {e} | — ({row['error'][:40]}…) | — | — |")
            else:
                lines.append(
                    f"| {e} | {row['cwt_power_nino3']:.2e} | "
                    f"{row['xwt_jao_jbaltic']:.2e} | "
                    f"{row['wct_jao_jbaltic']:.2e} |")
        with open(os.path.join(ROOT, "BASELINE.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
        print("appended parity table to BASELINE.md", file=sys.stderr)


def _planar_smooth_real(T, scales, dt, dj, mother):
    """WCT smoothing of a REAL (S, N) array with no complex dtype — delegates
    to the library implementation so the reported parity numbers measure
    exactly what the library computes."""
    from pycwt_tpu.ops.smoothing import smooth_planar_real

    return smooth_planar_real(T, dt, dj, scales, mother)


def _engine_row_planar(mother, g_cwt, g_xwt, g_wct):
    """The three parity rows computed with NO complex dtype and NO FFT custom
    call — the exact headline TPU path (fft_of_real_planar → fused planar
    kernel), robust to the axon runtime's complex64/FFT flaps."""
    from pycwt_tpu.config import CWTConfig
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar
    from pycwt_tpu.ops.pallas_fft import fused_cwt_planar
    from pycwt_tpu.transform import build_scale_grid

    cfg = CWTConfig(dtype=jnp.float32)
    row = {}

    interpret = jax.default_backend() not in ("tpu", "axon")

    def planar_w(sig_f32, sj, nfft, dt):
        sr, si = fft_of_real_planar(jnp.asarray(sig_f32), nfft)
        return fused_cwt_planar(sr, si, jnp.asarray(sj, jnp.float32),
                                mother=mother, nfft=nfft, dt=dt,
                                interpret=interpret)

    # CWT power on NINO3.
    sig = np.asarray(g_cwt["signal"], np.float32)
    dt = float(g_cwt["dt"])
    n0 = len(sig)
    nfft = cfg.fft_length(n0)
    wr, wi = planar_w(sig, g_cwt["sj"], nfft, dt)
    p = (np.asarray(wr) ** 2 + np.asarray(wi) ** 2)[:, :n0]
    row["cwt_power_nino3"] = rel_err(p, np.abs(g_cwt["W"]) ** 2)

    # XWT magnitude on AO/Baltic.
    y1 = np.asarray(g_xwt["y1"], np.float64)
    y2 = np.asarray(g_xwt["y2"], np.float64)
    dtx = float(g_xwt["dt"])
    n = len(y1)
    grid = build_scale_grid(n, dtx, dj=1 / 12, mother=mother)
    nfftx = cfg.fft_length(n)
    y1n = ((y1 - y1.mean()) / y1.std()).astype(np.float32)
    y2n = ((y2 - y2.mean()) / y2.std()).astype(np.float32)
    w1r, w1i = planar_w(y1n, grid.sj, nfftx, dtx)
    w2r, w2i = planar_w(y2n, grid.sj, nfftx, dtx)
    w1r, w1i = w1r[:, :n], w1i[:, :n]
    w2r, w2i = w2r[:, :n], w2i[:, :n]
    # W12 = W1 · conj(W2), planar.
    w12r = w1r * w2r + w1i * w2i
    w12i = w1i * w2r - w1r * w2i
    mag = np.sqrt(np.asarray(w12r) ** 2 + np.asarray(w12i) ** 2)
    row["xwt_jao_jbaltic"] = rel_err(mag, np.abs(g_xwt["W12"]))

    # WCT: planar smoothing per plane (linearity), real coherence.
    sj = jnp.asarray(grid.sj, jnp.float32)
    s_col = sj[:, None]
    S1 = _planar_smooth_real((w1r ** 2 + w1i ** 2) / s_col, sj, dtx, 1 / 12,
                             mother)
    S2 = _planar_smooth_real((w2r ** 2 + w2i ** 2) / s_col, sj, dtx, 1 / 12,
                             mother)
    S12r = _planar_smooth_real(w12r / s_col, sj, dtx, 1 / 12, mother)
    S12i = _planar_smooth_real(w12i / s_col, sj, dtx, 1 / 12, mother)
    R = np.asarray((S12r ** 2 + S12i ** 2) / (S1 * S2))
    row["wct_jao_jbaltic"] = rel_err(R, g_wct["WCT"])
    return {k: float(v) for k, v in row.items()}


def _engine_row_twofloat(g_cwt, g_xwt, g_wct):
    """Parity rows for the opt-in compensated two-float (double-f32) chip
    mode (``ops/twofloat.py``) — the SURVEY §7 'f64 on TPU' answer: expected
    ≤1e-6 (measured ~1e-11 on chip), vs ~1e-3 for the f32 throughput path."""
    from pycwt_tpu.ops.twofloat import (cwt_twofloat, wct_twofloat,
                                        xwt_twofloat)

    row = {}
    W, *_ = cwt_twofloat(g_cwt["signal"], float(g_cwt["dt"]))
    row["cwt_power_nino3"] = rel_err(np.abs(W) ** 2, np.abs(g_cwt["W"]) ** 2)
    W12, *_ = xwt_twofloat(g_xwt["y1"], g_xwt["y2"], float(g_xwt["dt"]))
    row["xwt_jao_jbaltic"] = rel_err(np.abs(W12), np.abs(g_xwt["W12"]))
    WCT, *_ = wct_twofloat(g_wct["y1"], g_wct["y2"], float(g_wct["dt"]))
    row["wct_jao_jbaltic"] = rel_err(WCT, g_wct["WCT"])
    return row


def _engine_row(engine, mother, g_cwt, g_xwt, g_wct):
    from pycwt_tpu.coherence import _wct_core
    from pycwt_tpu.config import CWTConfig
    from pycwt_tpu.transform import build_scale_grid, cwt_batch

    if engine == "twofloat":
        return _engine_row_twofloat(g_cwt, g_xwt, g_wct)
    if engine == "planar":
        return _engine_row_planar(mother, g_cwt, g_xwt, g_wct)

    cfg = CWTConfig(dtype=jnp.float32, engine=engine)
    row = {}
    # --- CWT power on NINO3 (f64 golden power from the reference) ------
    sig = np.asarray(g_cwt["signal"], np.float32)
    dt = float(g_cwt["dt"])
    sj = np.asarray(g_cwt["sj"])
    nfft = cfg.fft_length(len(sig))
    W, _ = cwt_batch(jnp.asarray(sig)[None], jnp.asarray(sj, jnp.float32),
                     dt, mother=mother, nfft=nfft, config=cfg)
    row["cwt_power_nino3"] = rel_err(np.abs(np.asarray(W[0])) ** 2,
                                     np.abs(g_cwt["W"]) ** 2)

    # --- XWT on AO/Baltic ----------------------------------------------
    y1 = np.asarray(g_xwt["y1"], np.float64)
    y2 = np.asarray(g_xwt["y2"], np.float64)
    dtx = float(g_xwt["dt"])
    n = len(y1)
    grid = build_scale_grid(n, dtx, dj=1 / 12, mother=mother)
    nfftx = cfg.fft_length(n)
    y1n = (y1 - y1.mean()) / y1.std()
    y2n = (y2 - y2.mean()) / y2.std()
    W1, _ = cwt_batch(jnp.asarray(y1n, jnp.float32)[None],
                      jnp.asarray(grid.sj, jnp.float32), dtx,
                      mother=mother, nfft=nfftx, config=cfg)
    W2, _ = cwt_batch(jnp.asarray(y2n, jnp.float32)[None],
                      jnp.asarray(grid.sj, jnp.float32), dtx,
                      mother=mother, nfft=nfftx, config=cfg)
    W12 = np.asarray(W1[0]) * np.conj(np.asarray(W2[0]))
    row["xwt_jao_jbaltic"] = rel_err(np.abs(W12), np.abs(g_xwt["W12"]))

    # --- WCT on AO/Baltic (2 CWTs + 3 smoothings + coherence) ----------
    R, aR, _ = _wct_core(jnp.asarray(y1n, jnp.float32)[None],
                         jnp.asarray(y2n, jnp.float32)[None],
                         jnp.asarray(grid.sj, jnp.float32), dtx,
                         mother=mother, nfft=nfftx, dj=1 / 12,
                         engine=engine)
    row["wct_jao_jbaltic"] = rel_err(np.asarray(R[0]), g_wct["WCT"])

    return {k: float(v) for k, v in row.items()}


if __name__ == "__main__":
    main()
