"""Parity and property tests for AR(1) statistics, red-noise surrogates,
the native chi-square PPF, and the TC98 significance tests."""
import numpy as np
import pytest
import scipy.stats

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.ops.special import chi2_ppf, gammaincinv
from tests.conftest import rel_err


def test_ar1_golden(golden):
    g = golden("ar1")
    import pycwt_tpu.sample as sample

    for i, name in enumerate(g["names"]):
        data = sample.load(str(name))
        gam, a, mu2 = wt.ar1(data.values)
        assert rel_err([gam, a, mu2], g["gam"][i]) < 1e-10, name


def test_ar1_spectrum_golden(golden):
    g = golden("ar1")
    assert rel_err(wt.ar1_spectrum(g["fgrid"], 0.5), g["spec_g05"]) < 1e-12
    assert rel_err(wt.ar1_spectrum(g["fgrid"], 0.72), g["spec_g072"]) < 1e-12


def test_ar1_short_series_raises():
    """Reference raises Warning when the discriminant is non-positive
    (helpers.py:95-96) — e.g. a strongly trending series."""
    with pytest.raises(Warning):
        wt.ar1(np.arange(100.0))


def test_chi2_ppf_vs_scipy():
    ps = np.array([0.05, 0.5, 0.8646, 0.90, 0.95, 0.99, 0.999])
    dfs = np.array([0.5, 1.0, 2.0, 2.7, 10.0, 64.3, 500.0])
    for df in dfs:
        ours = np.asarray(chi2_ppf(jnp.asarray(ps, jnp.float64), float(df)))
        ref = scipy.stats.chi2.ppf(ps, df)
        assert rel_err(ours, ref) < 1e-11, df


def test_gammaincinv_vs_scipy():
    import scipy.special

    ps = np.linspace(0.01, 0.99, 23)
    for a in [0.5, 1.0, 3.3, 48.0]:
        ours = np.asarray(gammaincinv(float(a), jnp.asarray(ps, jnp.float64)))
        ref = scipy.special.gammaincinv(a, ps)
        assert rel_err(ours, ref) < 1e-11, a


def test_rednoise_statistics():
    """Surrogates have the requested lag-1 autocorrelation and variance
    (distributional test — reference helpers.py:146-173)."""
    from pycwt_tpu.stats import rednoise_batch

    g = 0.72
    y = np.asarray(rednoise_batch(jax.random.PRNGKey(0), 4000, g, 1.0,
                                  batch=64, dtype=jnp.float64))
    yc = y - y.mean(axis=1, keepdims=True)
    lag1 = (yc[:, :-1] * yc[:, 1:]).sum(1) / (yc ** 2).sum(1)
    assert abs(lag1.mean() - g) < 0.02
    # AR(1) stationary variance = a²/(1−g²)
    assert abs(y.var() / (1 / (1 - g ** 2)) - 1) < 0.1


def test_rednoise_g0_is_white():
    """g=0 must work (the reference crashes on np.randn, helpers.py:166)."""
    y = wt.rednoise(1000, 0.0, 2.0, seed=3)
    assert y.shape == (1000,)
    assert abs(y.std() - 2.0) < 0.2


def test_rednoise_exact_recurrence():
    """associative_scan path is bit-equivalent to the sequential IIR."""
    from pycwt_tpu.stats import _ar1_recurrence
    import scipy.signal

    rng = np.random.default_rng(0)
    z = rng.standard_normal((3, 500))
    g = 0.8
    ours = np.asarray(_ar1_recurrence(jnp.asarray(z), jnp.float64(g)))
    ref = scipy.signal.lfilter([1, 0], [1, -g], z, axis=1)
    assert rel_err(ours, ref) < 1e-12


def test_significance_mode0_golden(golden):
    g = golden("significance_nino3")
    sig0, th0 = wt.significance(1.0, float(g["dt"]), g["sj"], 0,
                                alpha=float(g["alpha"]))
    assert rel_err(sig0, g["sig0"]) < 1e-10
    assert rel_err(th0, g["th0"]) < 1e-10


def test_significance_mode0_array_signal(golden):
    g = golden("significance_nino3")
    import pycwt_tpu.sample as sample

    nino = sample.load("nino3").values
    nino_std = (nino - nino.mean()) / nino.std()
    sig0b, th0b = wt.significance(nino_std, float(g["dt"]), g["sj"], 0)
    assert rel_err(sig0b, g["sig0b"]) < 1e-10
    assert rel_err(th0b, g["th0b"]) < 1e-10


def test_significance_mode1_golden(golden):
    g = golden("significance_nino3")
    sig1, _ = wt.significance(1.0, float(g["dt"]), g["sj"], 1,
                              alpha=float(g["alpha"]), dof=g["dof1"])
    assert rel_err(sig1, g["sig1"]) < 1e-10


def test_significance_mode1_scalar_dof(golden):
    """Scalar dof broadcast (the reference crashes here — documented fix)."""
    g = golden("significance_nino3")
    sig1, _ = wt.significance(1.0, float(g["dt"]), g["sj"], 1,
                              alpha=float(g["alpha"]), dof=300.0)
    assert sig1.shape == g["sj"].shape
    assert np.all(np.isfinite(sig1))


def test_significance_mode2_golden(golden):
    g = golden("significance_nino3")
    sig2, th2 = wt.significance(1.0, float(g["dt"]), g["sj"], 2,
                                alpha=float(g["alpha"]), dof=[2, 8])
    assert rel_err(np.atleast_1d(sig2), g["sig2"]) < 1e-10
    assert rel_err(np.atleast_1d(th2), g["th2"]) < 1e-10


def test_significance_dog_golden(golden):
    g = golden("significance_dog2")
    sig0, th0 = wt.significance(1.0, float(g["dt"]), g["sj"], 0,
                                alpha=float(g["alpha"]), wavelet=wt.DOG(2))
    assert rel_err(sig0, g["sig0"]) < 1e-10


def test_significance_bad_mode_raises(golden):
    g = golden("significance_nino3")
    with pytest.raises(ValueError):
        wt.significance(1.0, 0.25, g["sj"], 7, alpha=0.5)


def test_significance_mode2_requires_tabulated_cdelta(golden):
    g = golden("significance_nino3")
    with pytest.raises(ValueError):
        wt.significance(1.0, 0.25, g["sj"], 2, alpha=0.5, dof=[2, 8],
                        wavelet=wt.Morlet(5))  # f0≠6 → cdelta sentinel −1


def test_rednoise_fresh_entropy_by_default():
    """seed=None (default) draws fresh entropy each call — two successive
    calls give INDEPENDENT surrogates (reference semantics: global numpy RNG,
    helpers.py:169-171); determinism is opt-in via an explicit seed."""
    a = wt.rednoise(64, 0.5)
    b = wt.rednoise(64, 0.5)
    assert not np.array_equal(a, b)
    c = wt.rednoise(64, 0.5, seed=42)
    d = wt.rednoise(64, 0.5, seed=42)
    np.testing.assert_array_equal(c, d)


def test_chi2_ppf_matches_tc98_z_table():
    """TC98 Table 3 (docs/comments.md): cross-wavelet significance levels
    from eqs. (30)-(31).

    For two independent chi-square variates the cross power follows the
    sqrt-product distribution: complex wavelet (2 DOF) Z has survival
    P(Z>z) = z*K1(z); real wavelet (1 DOF) |W1*W2| has PDF K0(z)/pi*2.
    The published table values must satisfy those closed forms, and the
    Grinsted et al. (2004) convention -- chi2_ppf at the 86.46 % level
    reproduces Z2(95 %) = 3.999 -- must hold for our native PPF."""
    import scipy.integrate
    import scipy.special

    table = {0.10: (1.595, 3.214), 0.05: (2.182, 3.999), 0.01: (3.604, 5.767)}
    for alpha, (z1, z2) in table.items():
        # complex wavelet, 2 DOF: P(Z > z) = z K1(z)
        assert abs(z2 * scipy.special.k1(z2) - alpha) < 2e-4
        # real wavelet, 1 DOF: P(|W1 W2| > z) = (2/pi) ∫_z^∞ K0
        tail, _ = scipy.integrate.quad(scipy.special.k0, z1, np.inf)
        assert abs(2 / np.pi * tail - alpha) < 2e-4
    # Grinsted's Z2 = 3.999 convention via our native chi-square PPF
    # (the xwt docstring's "use 86.46 % confidence" note).
    z = float(np.asarray(chi2_ppf(jnp.asarray(0.8646, jnp.float64), 2)))
    assert abs(z - 3.999) < 2e-3


def test_ar1_batch_matches_per_series():
    """ar1_batch == per-series ar1 for every row (device-batched dots,
    host f64 quadratic — VERDICT r3 #2)."""
    from pycwt_tpu.stats import ar1, ar1_batch, rednoise

    rows = [np.asarray(rednoise(400, g, seed=i))
            for i, g in enumerate([0.0, 0.3, 0.7, 0.9])]
    x = np.stack(rows)
    g_b, a_b, mu2_b = ar1_batch(x)
    for i, row in enumerate(rows):
        g, a, mu2 = ar1(row)
        np.testing.assert_allclose(g_b[i], g, rtol=1e-9)
        np.testing.assert_allclose(a_b[i], a, rtol=1e-9)
        np.testing.assert_allclose(mu2_b[i], mu2, rtol=1e-9)


def test_ar1_batch_bad_row_is_nan():
    """Rows where ar1 raises Warning (e.g. a strong trend) come back NaN
    instead of aborting the whole batch."""
    from pycwt_tpu.stats import ar1, ar1_batch

    trend = np.linspace(0.0, 50.0, 200)  # discriminant <= 0 in ar1
    good = np.sin(np.linspace(0, 20, 200)) + 0.1 * np.arange(200) % 3
    with pytest.raises(Warning):
        ar1(trend)
    g, a, mu2 = ar1_batch(np.stack([trend, good]))
    assert np.isnan(g[0]) and np.isnan(a[0])
    assert np.isfinite(g[1])


def test_chi2_ppf_np_matches_f64_device_ppf():
    """The host float64 PPF twin (used by significance on no-x64 chip
    processes) matches the jnp f64 PPF to ~1e-12."""
    from pycwt_tpu.ops.special import chi2_ppf, chi2_ppf_np

    ps = np.array([0.05, 0.5, 0.8646, 0.95, 0.99, 0.999])
    for df in [0.5, 1.0, 2.0, 3.7, 10.0, 100.0]:
        a = np.asarray(chi2_ppf(jnp.asarray(ps, jnp.float64), df))
        b = chi2_ppf_np(ps, df)
        np.testing.assert_allclose(b, a, rtol=1e-12)


def test_significance_f64_without_x64():
    """significance must return f64-exact results even when the process has
    x64 DISABLED (the chip regime — measured 3e-5 f32 drift before the
    round-5 host-PPF fix)."""
    import jax

    scales = np.array([0.5, 1.0, 2.0, 4.0, 8.0])
    ref0, _ = wt.significance(1.0, 0.25, scales, 0, alpha=0.72)
    ref1, _ = wt.significance(1.0, 0.25, scales, 1, alpha=0.72,
                              dof=np.full(len(scales), 100.0))
    with jax.enable_x64(False):
        got0, _ = wt.significance(1.0, 0.25, scales, 0, alpha=0.72)
        got1, _ = wt.significance(1.0, 0.25, scales, 1, alpha=0.72,
                                  dof=np.full(len(scales), 100.0))
    np.testing.assert_allclose(got0, ref0, rtol=1e-12)
    np.testing.assert_allclose(got1, ref1, rtol=1e-12)
