#!/usr/bin/env python
"""Generate the demo-figure golden arrays (tests/golden/figure_*.npz).

The reference's de-facto regression artifact is its checked-in sample PNGs
(`/root/reference/MANIFEST.in:7`, `pycwt/sample/sample_NINO3.png`): figures
are regenerated and eyeballed.  Here we pin the *plotted arrays* instead —
every array each panel of `examples/sample_cwt.py` / `examples/sample_xwt.py`
draws — so a regression anywhere in the demo pipeline (normalize → cwt →
significance → spectra → reconstruction → coherence) fails a test rather
than subtly changing a picture.

Run on the CPU f64 parity path (same env as the test suite).
"""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import pycwt_tpu as wt  # noqa: E402
from pycwt_tpu.analysis import cwt_analysis, wct_analysis, xwt_analysis  # noqa: E402
from pycwt_tpu.sample import load  # noqa: E402

GOLD = os.path.join(ROOT, "tests", "golden")


def main():
    ds = load("nino3")
    res = cwt_analysis(ds.values, ds.dt, t0=ds.t0, mother=wt.Morlet(6),
                       avg_band=(2, 8))
    np.savez_compressed(
        os.path.join(GOLD, "figure_nino3.npz"),
        t=res.t, signal=res.signal, iwave=res.iwave, std=res.std,
        period=res.period, power=res.power, sig95=res.sig95, coi=res.coi,
        global_power=res.global_power, global_signif=res.global_signif,
        scale_avg=res.scale_avg, scale_avg_signif=res.scale_avg_signif,
        alpha=res.alpha,
    )

    jao = load("jao")
    jba = load("jbaltic")
    n = min(jao.values.size, jba.values.size)
    y1, y2 = jao.values[:n], jba.values[:n]
    x = xwt_analysis(y1, y2, jao.dt, significance_level=0.8646)
    w = wct_analysis(y1, y2, jao.dt, sig=False)
    np.savez_compressed(
        os.path.join(GOLD, "figure_jao_jbaltic.npz"),
        cross_power=x["cross_power"], cross_sig=x["cross_sig"],
        xwt_coi=x["coi"], xwt_period=x["period"],
        wct=w["WCT"], wct_phase=w["phase"], wct_period=w["period"],
        wct_coi=w["coi"],
    )
    print("figure goldens written to", GOLD)


if __name__ == "__main__":
    main()
