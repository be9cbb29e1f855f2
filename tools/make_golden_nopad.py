#!/usr/bin/env python
"""Golden fixture for the reference's NO-PADDING FFT policy.

The reference pads to the next pow-2 only on its scipy fallback path; with
pyfftw installed it transforms at the exact signal length
(``/root/reference/pycwt/helpers.py:15-19`` — ``kwargs['n'] = len(signal)``).
pyfftw isn't available here, so we emulate that policy exactly by pointing the
reference's ``fft_kwargs`` at the identity length — the FFT values are backend
independent.  This pins the ``CWTConfig(pad_pow2=False)`` path of the new
framework (``pycwt_tpu/config.py``).

Run: python tools/make_golden_nopad.py  →  tests/golden/cwt_nino3_nopad.npz
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")
import pycwt.helpers  # noqa: E402

pycwt.helpers.fft_kwargs = lambda signal, **kw: {"n": len(signal)}

import pycwt.wavelet  # noqa: E402

# pycwt.wavelet binds fft_kwargs at import time (`from .helpers import ...`);
# rebind its module-level name too so the patch takes effect.
pycwt.wavelet.fft_kwargs = pycwt.helpers.fft_kwargs

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "tests", "golden")


def main():
    sst = np.loadtxt("/root/reference/pycwt/sample/sst_nino3.dat")
    dt = 0.25
    std = sst.std()
    sig = (sst - sst.mean()) / std
    W, sj, freqs, coi, fft, fftfreqs = pycwt.wavelet.cwt(sig, dt, dj=1 / 12)
    assert fft.shape[0] == len(sst) // 2 - 1, "no-padding policy not in effect"
    np.savez(
        os.path.join(GOLD, "cwt_nino3_nopad.npz"),
        signal=sig, dt=dt, dj=1 / 12,
        W=W, sj=sj, freqs=freqs, coi=coi, fft=fft, fftfreqs=fftfreqs,
    )
    print("wrote cwt_nino3_nopad.npz", W.shape, fft.shape)


if __name__ == "__main__":
    main()
