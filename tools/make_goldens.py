#!/usr/bin/env python
"""Generate golden parity fixtures by running the REFERENCE pycwt (CPU, f64,
scipy-FFT pow-2-padded path) on the bundled sample datasets.

Run once (reference mounted at /root/reference):

    python tools/make_goldens.py

Outputs:
  tests/golden/*.npz            — golden arrays for parity tests
  pycwt_tpu/sample/data/*.npz   — sample datasets repackaged for the framework

The goldens pin the reference's exact numerical behavior per SURVEY.md §4:
scipy pow-2 padding, NaN-row drops, COI convention, significance modes,
smoothing semantics, XWT/WCT surfaces, and a fixed-seed MC significance curve
(for distributional comparison only).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
import pycwt as ref  # noqa: E402
from pycwt.helpers import ar1 as ref_ar1  # noqa: E402
from pycwt.helpers import ar1_spectrum as ref_ar1_spectrum  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "golden")
DATA = os.path.join(ROOT, "pycwt_tpu", "sample", "data")
REF_SAMPLE = "/root/reference/pycwt/sample"

os.makedirs(GOLD, exist_ok=True)
os.makedirs(DATA, exist_ok=True)


def load_dat(name):
    return np.loadtxt(os.path.join(REF_SAMPLE, name))


def main():
    # ------------------------------------------------------------------ data
    datasets = {
        "nino3": dict(values=load_dat("sst_nino3.dat"), t0=1871.0, dt=0.25,
                      title="NINO3 SST", units="degC"),
        "mauna": dict(values=load_dat("mauna.dat"), t0=1958.0, dt=1 / 12,
                      title="Mauna Loa CO2", units="ppm"),
        "monsoon": dict(values=load_dat("monsoon.dat"), t0=1871.0, dt=1 / 12,
                        title="All-India monsoon rainfall", units="mm"),
        "sunspots": dict(values=load_dat("sunspot.dat"), t0=1748.0, dt=0.25,
                         title="Wolf's sunspot number", units="count"),
        "soi": dict(values=load_dat("soi.dat"), t0=1896.0, dt=0.25,
                    title="Southern Oscillation Index", units="mb"),
    }
    jao = load_dat("jao.dat")
    jbaltic = load_dat("jbaltic.dat")
    datasets["jao"] = dict(values=jao[:, 1], time=jao[:, 0], t0=jao[0, 0],
                           dt=0.25, title="Arctic Oscillation", units="")
    datasets["jbaltic"] = dict(values=jbaltic[:, 1], time=jbaltic[:, 0],
                               t0=jbaltic[0, 0], dt=0.25,
                               title="Baltic maximum sea ice extent", units="")
    for name, d in datasets.items():
        np.savez_compressed(os.path.join(DATA, f"{name}.npz"), **d)
    print(f"wrote {len(datasets)} datasets")

    nino = datasets["nino3"]["values"]
    dt = 0.25
    std = nino.std()
    nino_std = (nino - nino.mean()) / std

    # ------------------------------------------------------------- cwt/icwt
    mothers = {
        "morlet6": ref.Morlet(6),
        "paul4": ref.Paul(4),
        "dog2": ref.DOG(2),
        "dog6": ref.DOG(6),
        "mexicanhat": ref.MexicanHat(),
    }
    for key, mother in mothers.items():
        W, sj, freqs, coi, sfft, fftfreqs = ref.cwt(nino_std, dt, wavelet=mother)
        iw = ref.icwt(W, sj, dt, wavelet=mother)
        np.savez_compressed(
            os.path.join(GOLD, f"cwt_nino3_{key}.npz"),
            signal=nino_std, dt=dt, W=W, sj=sj, freqs=freqs, coi=coi,
            sfft=sfft, fftfreqs=fftfreqs, icwt=iw,
        )
        print(f"cwt golden {key}: W{W.shape} dropped={97 - W.shape[0] if key=='paul4' else 0}")

    # custom-frequency grid
    cfreqs = np.linspace(0.05, 1.5, 40)
    W, sj, freqs, coi, sfft, fftfreqs = ref.cwt(nino_std, dt, freqs=cfreqs)
    np.savez_compressed(
        os.path.join(GOLD, "cwt_nino3_customfreqs.npz"),
        signal=nino_std, dt=dt, cfreqs=cfreqs, W=W, sj=sj, freqs=freqs,
        coi=coi, sfft=sfft, fftfreqs=fftfreqs,
    )

    # icwt transpose-orientation quirk (b == c branch, wavelet.py:163-166)
    W, sj, *_ = ref.cwt(nino_std, dt)
    iw_t = ref.icwt(W.T, sj, dt)
    np.savez_compressed(os.path.join(GOLD, "icwt_transposed.npz"),
                        W=W, sj=sj, dt=dt, icwt_t=iw_t)

    # ------------------------------------------------------- significance
    W, sj, freqs, coi, _, _ = ref.cwt(nino_std, dt)
    n0 = len(nino_std)
    g_auto, a_noise, mu2 = ref_ar1(nino_std)
    sig0, th0 = ref.significance(1.0, dt, sj, 0, alpha=g_auto)
    # mode 1: global-spectrum dof (sample/sample.py style)
    dof1 = n0 - sj
    sig1, th1 = ref.significance(1.0, dt, sj, 1, alpha=g_auto, dof=dof1.copy())
    # mode 2: scale-average between 2 and 8 years
    sig2, th2 = ref.significance(1.0, dt, sj, 2, alpha=g_auto, dof=[2, 8])
    # array-signal input path (variance computed internally, alpha auto)
    sig0b, th0b = ref.significance(nino_std, dt, sj, 0)
    np.savez_compressed(
        os.path.join(GOLD, "significance_nino3.npz"),
        sj=sj, dt=dt, alpha=g_auto, ar1_a=a_noise, ar1_mu2=mu2,
        sig0=sig0, th0=th0, dof1=dof1, sig1=sig1, sig2=np.atleast_1d(sig2),
        th2=np.atleast_1d(th2), sig0b=sig0b, th0b=th0b, n0=n0,
    )
    # DOG mother (dofmin=1) significance
    Wd, sjd, *_ = ref.cwt(nino_std, dt, wavelet=ref.DOG(2))
    sig0d, th0d = ref.significance(1.0, dt, sjd, 0, alpha=g_auto,
                                   wavelet=ref.DOG(2))
    np.savez_compressed(os.path.join(GOLD, "significance_dog2.npz"),
                        sj=sjd, dt=dt, alpha=g_auto, sig0=sig0d, th0=th0d)

    # ----------------------------------------------------------------- ar1
    ar1_rows = []
    for nm in ["nino3", "jao", "jbaltic", "soi"]:
        v = datasets[nm]["values"]
        g, a, m2 = ref_ar1(v)
        ar1_rows.append([g, a, m2])
    fgrid = np.linspace(0, 0.5, 101)
    np.savez_compressed(
        os.path.join(GOLD, "ar1.npz"),
        names=np.array(["nino3", "jao", "jbaltic", "soi"]),
        gam=np.array(ar1_rows),
        fgrid=fgrid, spec_g05=ref_ar1_spectrum(fgrid, 0.5),
        spec_g072=ref_ar1_spectrum(fgrid, 0.72),
    )

    # -------------------------------------------------------------- smooth
    rng = np.random.RandomState(42)
    m = ref.Morlet(6)
    Wr = rng.randn(33, 210)
    Wc = rng.randn(33, 210) + 1j * rng.randn(33, 210)
    scales_s = 2 * dt * 2 ** (np.arange(33) * (1 / 8))
    sm_r = m.smooth(Wr, dt, 1 / 8, scales_s)
    sm_c = m.smooth(Wc, dt, 1 / 8, scales_s)
    np.savez_compressed(os.path.join(GOLD, "smooth.npz"),
                        Wr=Wr, Wc=Wc, scales=scales_s, dt=dt, dj=1 / 8,
                        sm_r=sm_r, sm_c=sm_c)

    # ------------------------------------------------------------- xwt/wct
    s1 = datasets["jao"]["values"]
    s2 = datasets["jbaltic"]["values"]
    n = min(s1.size, s2.size)
    s1, s2 = s1[:n], s2[:n]
    for norm in (True, False):
        W12, coi_x, freq_x, signif_x = ref.xwt(
            s1, s2, dt, significance_level=0.8646, normalize=norm)
        np.savez_compressed(
            os.path.join(GOLD, f"xwt_jao_jbaltic_norm{int(norm)}.npz"),
            y1=s1, y2=s2, dt=dt, W12=W12, coi=coi_x, freq=freq_x,
            signif=signif_x,
        )
    WCT, aWCT, coi_w, freq_w, _ = ref.wct(s1, s2, dt, sig=False)
    np.savez_compressed(os.path.join(GOLD, "wct_jao_jbaltic.npz"),
                        y1=s1, y2=s2, dt=dt, WCT=WCT, aWCT=aWCT, coi=coi_w,
                        freq=freq_w)

    # --------------------------------------- MC significance (fixed seed)
    a1, _, _ = ref_ar1(s1)
    a2, _, _ = ref_ar1(s2)
    flambda = ref.Morlet(6).flambda()
    s0 = 2 * dt / flambda
    J = int(np.round(np.log2(n * dt / s0) / (1 / 12)))
    np.random.seed(1234)
    t0 = time.time()
    sig95 = ref.wct_significance(a1, a2, dt=dt, dj=1 / 12, s0=s0, J=J,
                                 wavelet=ref.Morlet(6), mc_count=300,
                                 progress=True, cache=False)
    print(f"reference wct_significance took {time.time() - t0:.1f}s")
    np.savez_compressed(os.path.join(GOLD, "wct_sig_jao_jbaltic.npz"),
                        al1=a1, al2=a2, dt=dt, dj=1 / 12, s0=s0, J=J,
                        mc_count=300, sig95=sig95)
    print("done")


if __name__ == "__main__":
    main()
