#!/usr/bin/env python
"""Cross-wavelet and wavelet-coherence analysis of the Arctic Oscillation vs
Baltic sea-ice pair — TPU-native counterpart of ``pycwt/sample/sample_xwt.py``
(boxpdf preprocessing, XWT at the 86.46% Grinsted convention, WCT with
Monte-Carlo significance sharded over the device, phase quivers).
"""
import os
import sys

try:  # prefer an installed pycwt_tpu; fall back to the repo checkout
    import pycwt_tpu  # noqa: F401
except ImportError:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PYCWT_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["PYCWT_TPU_PLATFORM"])

import pycwt_tpu as wt
from pycwt_tpu.analysis import phase_arrows, wct_analysis, xwt_analysis
from pycwt_tpu.sample import load


def main(outdir: str = "/tmp"):
    jao = load("jao")
    jbaltic = load("jbaltic")
    n = min(jao.values.size, jbaltic.values.size)
    y1, y2 = jao.values[:n], jbaltic.values[:n]
    dt = jao.dt

    x = xwt_analysis(y1, y2, dt, boxpdf_transform=True)
    print(f"XWT: {x['W12'].shape}, max cross power {x['cross_power'].max():.3f}")

    # PYCWT_TPU_MC_COUNT lets tests/CI run the full script with a cheap MC
    # ensemble (the statistics are meaningless below ~100 — demo only).
    mc_count = int(os.environ.get("PYCWT_TPU_MC_COUNT", "300"))
    w = wct_analysis(y1, y2, dt, sig=True, mc_count=mc_count, progress=True,
                     cache=mc_count == 300)
    print(f"WCT: mean coherence {np.nanmean(w['WCT']):.3f}")
    u, v = phase_arrows(w["phase"])

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    # Figure layout/labels follow the reference's sample_xwt.py:174-213
    # ('Cross-Wavelet' / 'Cross-Correlation' titles, COI hatch, Torrence &
    # Webster phase quivers with the angle = π/2 − aWCT convention).
    t = jao.t0 + np.arange(n) * dt

    def coi_fill(axis, coi, period):
        axis.fill(
            np.concatenate([t, t[-1:] + dt, t[-1:] + dt, t[:1] - dt,
                            t[:1] - dt]),
            np.concatenate([np.log2(coi), [np.log2(1e-9)],
                            np.log2(period[-1:]), np.log2(period[-1:]),
                            [np.log2(1e-9)]]),
            "k", alpha=0.3, hatch="x")

    fig, (a, b) = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    a.contourf(t, np.log2(x["period"]), np.log2(x["cross_power"]), 12,
               cmap="viridis")
    a.contour(t, np.log2(x["period"]), x["cross_sig"], [-99, 1], colors="k",
              linewidths=2)
    coi_fill(a, x["coi"], x["period"])
    a.set_title("Cross-Wavelet")
    a.set_ylabel("log2(Period)")
    a.set_ylim(np.log2([x["period"].min(), x["period"].max()]))
    a.invert_yaxis()
    b.contourf(t, np.log2(w["period"]), w["WCT"], 12, cmap="viridis")
    sig = w["sig95"]
    if np.ndim(sig) == 1 and len(sig) == len(w["period"]):
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = w["WCT"] / sig[:, None]
        b.contour(t, np.log2(w["period"]), ratio, [-99, 1], colors="k",
                  linewidths=2)
    coi_fill(b, w["coi"], w["period"])
    step = max(1, n // 40)
    b.quiver(t[::step], np.log2(w["period"][::4]),
             u[::4, ::step], v[::4, ::step], units="width", angles="uv",
             pivot="mid", scale=40)
    b.set_title("Cross-Correlation")
    b.set_ylabel("log2(Period)")
    b.set_xlabel("Time (year)")
    b.invert_yaxis()
    out = os.path.join(outdir, "sample_xwt.png")
    fig.savefig(out, dpi=96)
    print(f"figure saved to {out}")


if __name__ == "__main__":
    args = sys.argv[1:]
    outdir = "/tmp"
    if "--outdir" in args:
        i = args.index("--outdir")
        outdir = args[i + 1]
    main(outdir)
