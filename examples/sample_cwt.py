#!/usr/bin/env python
"""Complete Torrence & Compo Figure-1 analysis on a bundled dataset.

TPU-native counterpart of the reference demo (``pycwt/sample/sample.py``):
the whole pipeline (CWT, significance, global/scale-averaged spectra,
reconstruction) runs through the jitted batched cores; this script just
orchestrates and plots.

Usage:  python examples/sample_cwt.py [nino3|mauna|monsoon|sunspots|soi]
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
from pycwt_tpu.analysis import cwt_analysis
from pycwt_tpu.sample import load


def main(name: str = "nino3"):
    ds = load(name)
    res = cwt_analysis(ds.values, ds.dt, t0=ds.t0, mother=wt.Morlet(6),
                       avg_band=(2, 8))
    print(f"{ds.label}: N={len(ds.values)}, {len(res.scales)} scales, "
          f"alpha={res.alpha:.3f}")
    print(f"reconstruction rms err: "
          f"{np.sqrt(np.mean((res.iwave / res.std - res.signal) ** 2)):.4f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable — skipping figure")
        return

    fig = plt.figure(figsize=(11, 8))
    ax = plt.axes([0.1, 0.75, 0.65, 0.2])
    ax.plot(res.t, res.iwave / res.std, "-", lw=1, color="0.5")
    ax.plot(res.t, res.signal, "k", lw=1.5)
    ax.set_title(f"a) {ds.label}")

    bx = plt.axes([0.1, 0.37, 0.65, 0.28], sharex=ax)
    levels = [0.0625, 0.125, 0.25, 0.5, 1, 2, 4, 8, 16]
    bx.contourf(res.t, np.log2(res.period), np.log2(res.power),
                np.log2(levels), extend="both", cmap="viridis")
    bx.contour(res.t, np.log2(res.period), res.sig95, [-99, 1], colors="k",
               linewidths=2)
    bx.fill(np.concatenate([res.t, res.t[-1:], res.t[-1:], res.t[:1], res.t[:1]]),
            np.concatenate([np.log2(res.coi), [1e-9], [np.log2(res.period[-1])],
                            [np.log2(res.period[-1])], [1e-9]]),
            "k", alpha=0.3, hatch="x")
    bx.set_title("b) Wavelet power spectrum")
    bx.set_ylabel("log2(Period)")
    bx.invert_yaxis()

    cx = plt.axes([0.77, 0.37, 0.18, 0.28], sharey=bx)
    cx.plot(res.global_signif, np.log2(res.period), "k--")
    cx.plot(res.global_power, np.log2(res.period), "k-", lw=1.5)
    cx.set_title("c) Global spectrum")

    dx = plt.axes([0.1, 0.07, 0.65, 0.2], sharex=ax)
    dx.axhline(res.scale_avg_signif, color="k", linestyle="--")
    dx.plot(res.t, res.scale_avg, "k-", lw=1.5)
    dx.set_title(f"d) {res.avg_band[0]}-{res.avg_band[1]} period scale-avg power")

    out = f"/tmp/pycwt_tpu_{name}.png"
    fig.savefig(out, dpi=100)
    print(f"figure saved to {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nino3")
