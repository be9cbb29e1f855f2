"""Golden-parity and property tests for the forward/inverse CWT.

Parity target: <=1e-10 max relative error vs the reference pycwt on its
bundled NINO3 sample (BASELINE.json), on the CPU f64 path.
"""
import numpy as np
import pytest

import pycwt_tpu as wt
from tests.conftest import rel_err

MOTHERS = {
    "morlet6": wt.Morlet(6),
    "paul4": wt.Paul(4),
    "dog2": wt.DOG(2),
    "dog6": wt.DOG(6),
    "mexicanhat": wt.MexicanHat(),
}


@pytest.mark.parametrize("key", sorted(MOTHERS))
def test_cwt_golden_parity(golden, key):
    g = golden(f"cwt_nino3_{key}")
    W, sj, freqs, coi, sfft, fftfreqs = wt.cwt(g["signal"], float(g["dt"]),
                                               wavelet=MOTHERS[key])
    assert W.shape == g["W"].shape, f"shape {W.shape} vs golden {g['W'].shape}"
    assert rel_err(sj, g["sj"]) < 1e-12
    assert rel_err(freqs, g["freqs"]) < 1e-12
    assert rel_err(coi, g["coi"]) < 1e-12
    assert rel_err(fftfreqs, g["fftfreqs"]) < 1e-12
    assert rel_err(sfft, g["sfft"]) < 1e-10
    assert rel_err(W, g["W"]) < 1e-10


def test_cwt_custom_freqs(golden):
    g = golden("cwt_nino3_customfreqs")
    W, sj, freqs, coi, sfft, fftfreqs = wt.cwt(g["signal"], float(g["dt"]),
                                               freqs=g["cfreqs"])
    assert rel_err(sj, g["sj"]) < 1e-12
    assert rel_err(W, g["W"]) < 1e-10


@pytest.mark.parametrize("key", sorted(MOTHERS))
def test_icwt_golden_parity(golden, key):
    g = golden(f"cwt_nino3_{key}")
    iw = wt.icwt(g["W"], g["sj"], float(g["dt"]), wavelet=MOTHERS[key])
    assert rel_err(iw, g["icwt"]) < 1e-10


def test_icwt_transposed_orientation(golden):
    """The reference's b==c orientation branch (wavelet.py:163-166)."""
    g = golden("icwt_transposed")
    iw = wt.icwt(g["W"].T, g["sj"], float(g["dt"]))
    assert rel_err(iw, g["icwt_t"]) < 1e-10


def test_icwt_shape_mismatch_raises(golden):
    g = golden("cwt_nino3_morlet6")
    with pytest.raises(Warning):
        wt.icwt(g["W"], g["sj"][:-5], float(g["dt"]))


def test_reconstruction_snr():
    """icwt∘cwt round trip recovers the signal (TC98 eq. 11 fidelity)."""
    rng = np.random.default_rng(0)
    t = np.arange(512) * 0.25
    x = np.sin(2 * np.pi * t / 16) + 0.5 * np.sin(2 * np.pi * t / 4)
    x = (x - x.mean()) / x.std()
    W, sj, *_ = wt.cwt(x, 0.25, dj=1 / 24)
    xr = wt.icwt(W, sj, 0.25, dj=1 / 24)
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - np.real(xr)) ** 2))
    assert snr > 20, f"reconstruction SNR too low: {snr:.1f} dB"


def test_parseval_filterbank_normalization(golden):
    """TC98 eq. 14 variance preservation, deterministically:

        σ² ≈ dj·dt/(C_δ·N) · Σ_{j,t} |W[j,t]|² / s_j

    On unit-variance NINO3 with the default Morlet-6 grid the reference's own
    transform gives exactly 0.97499972839683 (goldens), so (a) our eq.-14 sum
    must match the golden-W-derived sum to ≤1e-10 relative — a 40% (or 0.1%)
    normalization bug cannot pass — and (b) both must sit within TC98's
    few-percent discretization band of the true variance."""
    g = golden("cwt_nino3_morlet6")
    x, dt, dj = g["signal"], float(g["dt"]), 1 / 12
    W, sj, *_ = wt.cwt(x, dt, dj=dj)
    cdelta = wt.Morlet(6).cdelta

    def eq14(Wm, s):
        return dj * dt / (cdelta * x.size) * float(
            (np.abs(Wm) ** 2 / np.asarray(s)[:, None]).sum())

    ours = eq14(W, sj)
    theirs = eq14(g["W"], g["sj"])
    assert abs(ours - theirs) / theirs < 1e-10
    assert 0.95 < ours < 1.0  # TC98 eq.-14 discretization band around σ²=1


def test_batched_matches_single():
    """The batched TPU core gives identical rows to independent 1-D calls."""
    import jax.numpy as jnp
    from pycwt_tpu.transform import build_scale_grid, cwt_batch
    from pycwt_tpu.config import DEFAULT

    rng = np.random.default_rng(3)
    X = rng.standard_normal((4, 300))
    grid = build_scale_grid(300, 0.5)
    nfft = DEFAULT.fft_length(300)
    Wb, _ = cwt_batch(jnp.asarray(X), jnp.asarray(grid.sj), 0.5,
                      mother=wt.Morlet(6), nfft=nfft)
    Wb = np.asarray(Wb)
    for i in range(4):
        Wi, *_ = wt.cwt(X[i], 0.5)
        assert rel_err(Wb[i], Wi) < 1e-12


def test_cwt_power_matches_cwt_abs2():
    """cwt_power (complex-free device path under engine='planar') equals
    |cwt|^2 — the transform surface for complex-free runtimes."""
    import pycwt_tpu as wt
    from pycwt_tpu.config import CWTConfig

    rng = np.random.default_rng(21)
    x = rng.standard_normal(400)
    W, sj, freqs, coi, _, _ = wt.cwt(x, 0.25, dj=1 / 8)
    ref = np.abs(W) ** 2
    p, sj2, freqs2, coi2 = wt.cwt_power(
        x, 0.25, dj=1 / 8, config=CWTConfig(engine="planar"))
    np.testing.assert_allclose(sj2, sj)
    np.testing.assert_allclose(coi2, coi)
    scale = ref.max()
    np.testing.assert_allclose(p, ref, atol=2e-5 * scale, rtol=0)
    # non-planar fallback branch
    p2, *_ = wt.cwt_power(x, 0.25, dj=1 / 8, config=CWTConfig(engine="xla"))
    np.testing.assert_allclose(p2, ref, rtol=1e-12)
