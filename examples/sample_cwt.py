#!/usr/bin/env python
"""Complete Torrence & Compo Figure-1 analysis on a bundled dataset.

TPU-native counterpart of the reference demo (``pycwt/sample/sample.py``):
the whole pipeline (CWT, significance, global/scale-averaged spectra,
reconstruction) runs through the jitted batched cores; this script just
orchestrates and plots.  The figure reproduces the reference's label-for-
label (titles, axis labels, units from the dataset registry — reference
``sample/sample.py:125-195``); the rendered outputs are committed under
``docs/img/`` as the visual-regression counterparts of the reference's
``sample_*.png``.

Usage:  python examples/sample_cwt.py [nino3|mauna|monsoon|sunspots|soi|--all]
        [--outdir DIR]   (default /tmp)
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


def main(name: str = "nino3", outdir: str = "/tmp"):
    ds = load(name)
    mother = wt.Morlet(6)
    res = cwt_analysis(ds.values, ds.dt, t0=ds.t0, mother=mother,
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

    # Labels follow the reference's sample.py:125-195 exactly (dataset
    # registry titles/units; no-TeX variants — their figures use usetex).
    lab = ds.labels(usetex=False)
    plt.rcParams.update({"font.size": 13.0, "axes.grid": True})
    fig = plt.figure(figsize=(11, 8))
    ax = plt.axes([0.1, 0.75, 0.65, 0.2])
    ax.plot(res.t, res.iwave / res.std, "-", lw=1, color="0.5")
    ax.plot(res.t, res.signal, "k", lw=1.5)
    ax.set_title(f"a) {lab['title']}")
    ax.set_ylabel(f"{lab['label']} [{lab['units']}]" if lab["units"]
                  else lab["label"])

    bx = plt.axes([0.1, 0.37, 0.65, 0.28], sharex=ax)
    levels = [0.0625, 0.125, 0.25, 0.5, 1, 2, 4, 8, 16]
    bx.contourf(res.t, np.log2(res.period), np.log2(res.power),
                np.log2(levels), extend="both", cmap="viridis")
    bx.contour(res.t, np.log2(res.period), res.sig95, [-99, 1], colors="k",
               linewidths=2)
    bx.fill(np.concatenate([res.t, res.t[-1:] + ds.dt, res.t[-1:] + ds.dt,
                            res.t[:1] - ds.dt, res.t[:1] - ds.dt]),
            np.concatenate([np.log2(res.coi), [1e-9], [np.log2(res.period[-1])],
                            [np.log2(res.period[-1])], [1e-9]]),
            "k", alpha=0.3, hatch="x")
    bx.set_title(f"b) {lab['label']} Wavelet Power Spectrum ({mother.name})")
    bx.set_ylabel("Period (years)")
    yticks = 2 ** np.arange(np.ceil(np.log2(res.period.min())),
                            np.ceil(np.log2(res.period.max())))
    bx.set_yticks(np.log2(yticks))
    bx.set_yticklabels(yticks)

    # Panel c extras for reference parity (sample.py:165-176): the signal's
    # one-sided Fourier power spectrum and the theoretical red-noise
    # spectrum, both in light gray.
    var = res.std ** 2
    nfft = 1 << (len(res.signal) - 1).bit_length()
    fft = np.fft.fft(res.signal, nfft)[1:nfft // 2] / nfft ** 0.5
    fftfreqs = np.fft.fftfreq(nfft, ds.dt)[1:nfft // 2]
    _, fft_theor = wt.significance(1.0, ds.dt, res.scales, 0,
                                   alpha=res.alpha, wavelet=mother)

    cx = plt.axes([0.77, 0.37, 0.2, 0.28], sharey=bx)
    cx.plot(res.global_signif, np.log2(res.period), "k--")
    cx.plot(var * fft_theor, np.log2(res.period), "--", color="#cccccc")
    cx.plot(var * np.abs(fft) ** 2, np.log2(1.0 / fftfreqs), "-",
            color="#cccccc", lw=1.0)
    cx.plot(res.global_power, np.log2(res.period), "k-", lw=1.5)
    cx.set_title("c) Global Wavelet Spectrum")
    cx.set_xlabel(f"Power [{lab['units2']}]" if lab["units2"] else "Power")
    cx.set_xlim([0, res.global_power.max() + var])
    cx.set_ylim(np.log2([res.period.min(), res.period.max()]))
    cx.set_yticks(np.log2(yticks))
    cx.set_yticklabels(yticks)
    plt.setp(cx.get_yticklabels(), visible=False)

    dx = plt.axes([0.1, 0.07, 0.65, 0.2], sharex=ax)
    dx.axhline(res.scale_avg_signif, color="k", linestyle="--", lw=1)
    dx.plot(res.t, res.scale_avg, "k-", lw=1.5)
    dx.set_title(f"d) {res.avg_band[0]}–{res.avg_band[1]} year "
                 "scale-averaged power")
    dx.set_xlabel("Time (year)")
    dx.set_ylabel(f"Average variance [{lab['units']}]" if lab["units"]
                  else "Average variance")
    ax.set_xlim([res.t.min(), res.t.max()])

    out = os.path.join(outdir, f"sample_{name}.png")
    fig.savefig(out, dpi=96)
    plt.close(fig)
    print(f"figure saved to {out}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    outdir = "/tmp"
    if "--outdir" in args:
        i = args.index("--outdir")
        outdir = args[i + 1]
        del args[i:i + 2]
    if args and args[0] == "--all":
        for n in ("nino3", "mauna", "monsoon", "sunspots", "soi"):
            main(n, outdir)
    else:
        main(args[0] if args else "nino3", outdir)
