#!/usr/bin/env python
"""All-pairs coherence analysis of a station NETWORK — the round-5 composed
production workflow (``pycwt_tpu.analysis.wct_matrix_analysis``).

The reference computes one pair and one Monte-Carlo null per call
(``/root/reference/pycwt/wavelet.py:422, :531``); a B-station network is
B·(B−1)/2 serial runs.  Here the whole network is three fused stages:

1. every station's CWT + self-smoothing computed ONCE and shared across its
   pairs (``wct_matrix``);
2. per-station AR(1) fits in one batched dispatch (``ar1_batch``);
3. the per-pair Monte-Carlo nulls deduplicated to distinct, noise-calibrated
   hypotheses and run in ONE compiled sweep with an incremental disk cache
   (``wct_significance_batch`` — BASELINE.md round 5: 32 stations = 496
   pairs collapse to ~44 distinct nulls, 197.7 s → 40.0 s on one v5e chip).

Synthetic stations: AR(1) backgrounds plus a common 8-sample oscillation
injected into half the network, so the significant-coherence mask found by
the analysis has known structure to eyeball.
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

from pycwt_tpu.analysis import wct_matrix_analysis


def make_network(B=8, n0=512, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n0)
    common = np.sin(2 * np.pi * t / 8.0)
    y = np.empty((B, n0))
    for b in range(B):
        g = rng.uniform(0.4, 0.7)
        e = rng.standard_normal(n0 + 128)
        for i in range(1, len(e)):
            e[i] += g * e[i - 1]
        y[b] = e[128:]
        if b < B // 2:               # stations 0..B/2-1 share the oscillation
            y[b] += 2.0 * common
    return y


def main():
    B = int(os.environ.get("PYCWT_TPU_NETWORK_B", "8"))
    mc_count = int(os.environ.get("PYCWT_TPU_MC_COUNT", "300"))
    y = make_network(B=B)

    res = wct_matrix_analysis(y, dt=1.0, mc_count=mc_count, cache=False)
    WCT, sig95, pairs = res["WCT"], res["sig95"], res["pairs"]
    period = res["period"]

    print(f"network: {B} stations -> {len(pairs)} pairs; "
          f"coherence maps {WCT.shape}, alphas "
          f"{np.round(res['alpha'], 2).tolist()}")

    # Fraction of the 6-12-sample band that is significantly coherent, per
    # pair: the injected common mode makes coupled-station pairs stand out.
    band = (period >= 6) & (period <= 12)
    coupled, uncoupled = [], []
    for p, (i, j) in enumerate(pairs):
        frac = float(np.mean(
            WCT[p][band, :] > sig95[p][band][:, None]))
        (coupled if (i < B // 2 and j < B // 2) else uncoupled).append(frac)
    print(f"significant fraction in the 6-12 band: coupled pairs "
          f"{np.mean(coupled):.2f} vs background pairs "
          f"{np.mean(uncoupled):.2f}")
    assert np.mean(coupled) > np.mean(uncoupled), (
        "injected common mode should dominate the significance mask")
    print("OK")


if __name__ == "__main__":
    main()
