"""Engine-policy tests (VERDICT r1 items 1/6/10): every FFT consumer honors the
engine knob, the MXU DFT path agrees with the XLA path through the full
WCT/MC pipelines, the pad_pow2=False policy matches the reference's pyfftw
no-padding path, and MC results are invariant to chunking.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import CWTConfig
from pycwt_tpu.coherence import _wct_core, wct_significance
from pycwt_tpu.ops.spectra import global_power_parseval
from pycwt_tpu.transform import build_scale_grid, cwt_batch
from tests.conftest import rel_err

MOTHER = wt.Morlet(6)
N0 = 256
DT = 0.5


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(7)
    return rng.standard_normal((2, N0)), rng.standard_normal((2, N0))


def test_cwt_nopad_matches_reference_pyfftw_path(golden):
    """CWTConfig(pad_pow2=False) == the reference's no-padding (pyfftw) policy
    (``/root/reference/pycwt/helpers.py:15-19``), golden ≤ 1e-10."""
    g = golden("cwt_nino3_nopad")
    cfg = CWTConfig(pad_pow2=False)
    W, sj, freqs, coi, fft, fftfreqs = wt.cwt(
        g["signal"], float(g["dt"]), dj=float(g["dj"]), config=cfg)
    assert W.shape == g["W"].shape
    assert fft.shape == g["fft"].shape  # (n0//2 - 1,) not (nfft//2 - 1,)
    assert rel_err(W, g["W"]) < 1e-10
    assert rel_err(sj, g["sj"]) < 1e-12
    assert rel_err(fft, g["fft"]) < 1e-10
    assert rel_err(fftfreqs, g["fftfreqs"]) < 1e-12
    assert rel_err(coi, g["coi"]) < 1e-12


def test_wct_core_engine_mxu_matches_xla(pair):
    """The full WCT pipeline (2 CWTs + 3 smoothings) under the MXU DFT engine
    equals the XLA-FFT engine to f64 round-off — proving WCT/MC compile and
    agree on backends where the FFT custom call is unavailable."""
    y1, y2 = pair
    grid = build_scale_grid(N0, DT, dj=1 / 8)
    kw = dict(mother=MOTHER, nfft=N0, dj=grid.dj)
    R_x, a_x, W_x = _wct_core(jnp.asarray(y1), jnp.asarray(y2),
                              jnp.asarray(grid.sj), DT, engine="xla", **kw)
    R_m, a_m, W_m = _wct_core(jnp.asarray(y1), jnp.asarray(y2),
                              jnp.asarray(grid.sj), DT, engine="mxu", **kw)
    assert rel_err(np.asarray(R_m), np.asarray(R_x)) < 1e-9
    assert rel_err(np.asarray(W_m), np.asarray(W_x)) < 1e-9
    assert np.abs(np.asarray(a_m) - np.asarray(a_x)).max() < 1e-9


def test_cwt_batch_engine_fallback_non_pow2():
    """Non-pow-2 nfft under engine='mxu' must still work (falls back to the
    XLA lowering rather than erroring) so the engine knob is safe globally."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 100))
    grid = build_scale_grid(100, DT, dj=1 / 4)
    W_m, _ = cwt_batch(jnp.asarray(x), jnp.asarray(grid.sj), DT,
                       mother=MOTHER, nfft=100, engine="mxu")
    W_x, _ = cwt_batch(jnp.asarray(x), jnp.asarray(grid.sj), DT,
                       mother=MOTHER, nfft=100, engine="xla")
    assert rel_err(np.asarray(W_m), np.asarray(W_x)) < 1e-12


def test_global_power_parseval_engines(pair):
    y1, _ = pair
    grid = build_scale_grid(N0, DT, dj=1 / 8)
    kw = dict(dt=DT, mother=MOTHER, nfft=N0)
    p_x = global_power_parseval(jnp.asarray(y1), jnp.asarray(grid.sj),
                                engine="xla", **kw)
    p_m = global_power_parseval(jnp.asarray(y1), jnp.asarray(grid.sj),
                                engine="mxu", **kw)
    assert rel_err(np.asarray(p_m), np.asarray(p_x)) < 1e-10


def test_wct_significance_chunk_invariance():
    """Same (seed, mc_count) must give the IDENTICAL significance curve for
    any on-device chunking — member streams are keyed by global ensemble
    index (stats.rednoise_members)."""
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=3)
    s_a = wct_significance(0.5, 0.6, mc_batch=12, **kw)
    s_b = wct_significance(0.5, 0.6, mc_batch=5, **kw)
    valid = np.isfinite(s_a)
    assert valid.any()
    np.testing.assert_array_equal(s_a[valid], s_b[valid])
    assert np.array_equal(np.isfinite(s_a), np.isfinite(s_b))


def test_wct_significance_engine_mxu_close_to_xla():
    """The MC curve under the MXU engine matches the XLA engine to within one
    histogram bin (engines differ only by FFT round-off; bin width 1e-3)."""
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=3, mc_batch=6)
    s_x = wct_significance(0.5, 0.6, config=CWTConfig(engine="xla"), **kw)
    s_m = wct_significance(0.5, 0.6, config=CWTConfig(engine="mxu"), **kw)
    valid = np.isfinite(s_x)
    assert valid.any()
    assert np.abs(s_x[valid] - s_m[valid]).max() <= 2e-3


def test_wct_core_planar_matches_complex(pair):
    """The fully planar WCT pipeline (no complex dtype anywhere — the
    flap-resilient TPU path) matches the complex pipeline at f32 round-off."""
    y1, y2 = pair
    grid = build_scale_grid(N0, DT, dj=1 / 8)
    kw = dict(mother=MOTHER, nfft=N0, dj=grid.dj)
    R_c, a_c, W12_c = _wct_core(
        jnp.asarray(y1, jnp.float32), jnp.asarray(y2, jnp.float32),
        jnp.asarray(grid.sj, jnp.float32), DT, engine="mxu", **kw)
    R_p, a_p, (w12r, w12i) = _wct_core(
        jnp.asarray(y1, jnp.float32), jnp.asarray(y2, jnp.float32),
        jnp.asarray(grid.sj, jnp.float32), DT, engine="planar", **kw)
    assert rel_err(np.asarray(R_p), np.asarray(R_c)) < 1e-3
    assert np.abs(np.asarray(a_p) - np.asarray(a_c)).max() < 1e-3
    W12_p = np.asarray(w12r) + 1j * np.asarray(w12i)
    assert rel_err(np.abs(W12_p), np.abs(np.asarray(W12_c))) < 1e-3


def test_wct_significance_engine_planar_close_to_mxu():
    """MC significance under the planar engine matches the complex engines
    to within a few histogram bins (f32 pipelines with different round-off)."""
    kw = dict(dt=1.0, dj=1 / 4, s0=2.0, J=7, mc_count=12, progress=False,
              cache=False, seed=3, mc_batch=6)
    s_m = wct_significance(0.5, 0.6, config=CWTConfig(engine="mxu",
                                                      dtype=jnp.float32), **kw)
    s_p = wct_significance(0.5, 0.6, config=CWTConfig(engine="planar",
                                                      dtype=jnp.float32), **kw)
    valid = np.isfinite(s_m)
    assert valid.any()
    assert np.abs(s_m[valid] - s_p[valid]).max() <= 5e-3


@pytest.mark.parametrize("engine", ["xla", "mxu"])
def test_f32_parity_vs_f64_goldens(golden, engine):
    """The f32 throughput path's error vs the f64 reference goldens stays
    within the documented bounds (BASELINE.json parity clause; measured and
    recorded by tools/tpu_parity_report.py).  Runs the same workloads here so
    any regression fails CI, not just the TPU report."""
    g = golden("cwt_nino3_morlet6")
    cfg = CWTConfig(dtype=jnp.float32, engine=engine)
    sig = np.asarray(g["signal"], np.float32)
    nfft = cfg.fft_length(len(sig))
    W, _ = cwt_batch(jnp.asarray(sig)[None], jnp.asarray(g["sj"], jnp.float32),
                     float(g["dt"]), mother=MOTHER, nfft=nfft, config=cfg)
    assert rel_err(np.abs(np.asarray(W[0])) ** 2, np.abs(g["W"]) ** 2) < 5e-3

    gw = golden("wct_jao_jbaltic")
    y1 = np.asarray(gw["y1"], np.float64)
    y2 = np.asarray(gw["y2"], np.float64)
    dtx = float(gw["dt"])
    grid = build_scale_grid(len(y1), dtx, dj=1 / 12)
    y1n = (y1 - y1.mean()) / y1.std()
    y2n = (y2 - y2.mean()) / y2.std()
    R, _, _ = _wct_core(jnp.asarray(y1n, jnp.float32)[None],
                        jnp.asarray(y2n, jnp.float32)[None],
                        jnp.asarray(grid.sj, jnp.float32), dtx,
                        mother=MOTHER, nfft=cfg.fft_length(len(y1)),
                        dj=1 / 12, engine=engine)
    assert rel_err(np.asarray(R[0]), gw["WCT"]) < 1e-3


def test_wct_public_api_planar_engine():
    """Public wct() under the planar engine (the axon default) returns finite
    coherence in [0, ~1] and phases matching the complex engine."""
    rng = np.random.default_rng(13)
    y1 = np.cumsum(rng.standard_normal(200))
    y2 = np.cumsum(rng.standard_normal(200))
    cfgp = CWTConfig(engine="planar", dtype=jnp.float32)
    cfgm = CWTConfig(engine="mxu", dtype=jnp.float32)
    Wp, ap, coi, f, _ = wt.wct(y1, y2, 1.0, dj=1 / 6, sig=False, config=cfgp)
    Wm, am, _, _, _ = wt.wct(y1, y2, 1.0, dj=1 / 6, sig=False, config=cfgm)
    assert np.isfinite(Wp).all()
    assert rel_err(Wp, Wm) < 1e-3
    assert np.abs(ap - am).max() < 1e-3


def test_wct_public_api_accepts_config():
    """wct(..., config=) threads padding + engine through the compat surface."""
    rng = np.random.default_rng(11)
    y1 = np.cumsum(rng.standard_normal(200))
    y2 = np.cumsum(rng.standard_normal(200))
    cfg = CWTConfig(pad_pow2=False)
    W1, a1, coi1, f1, _ = wt.wct(y1, y2, 1.0, dj=1 / 6, sig=False, config=cfg)
    W2, a2, coi2, f2, _ = wt.wct(y1, y2, 1.0, dj=1 / 6, sig=False)
    # Padding policy changes the FFT length → numerically different but close
    # in the interior; both must be finite, same shapes and grids.
    assert W1.shape == W2.shape
    np.testing.assert_allclose(f1, f2, rtol=1e-12)
    assert np.isfinite(W1).all() and np.isfinite(W2).all()


def test_explicit_engine_warns_on_xla_fallback():
    """An explicitly requested non-xla engine must not silently ride the XLA
    FFT custom call for non-pow-2 lengths (ADVICE r2)."""
    import pytest
    from pycwt_tpu.ops import fft as efft

    x = jnp.asarray(np.random.default_rng(0).standard_normal(100))
    with pytest.warns(UserWarning, match="power-of-two"):
        efft.fft(x, engine="mxu")
    with pytest.warns(UserWarning, match="power-of-two"):
        efft.ifft(x.astype(jnp.complex128), engine="planar")
