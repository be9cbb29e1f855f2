"""Smoke + consistency tests for the high-level analysis pipelines and the
example scripts."""
import numpy as np

import pycwt_tpu as wt
from pycwt_tpu.analysis import cwt_analysis, wct_analysis, xwt_analysis
from pycwt_tpu.sample import list_datasets, load
from tests.conftest import rel_err


def test_datasets_load():
    names = list_datasets()
    assert set(names) >= {"nino3", "mauna", "monsoon", "sunspots", "soi",
                          "jao", "jbaltic"}
    for n in names:
        ds = load(n)
        assert ds.values.ndim == 1 and len(ds.values) > 100
        assert np.isfinite(ds.values).all()
        assert len(ds.time) == len(ds.values)


def test_cwt_analysis_nino3_consistency(golden):
    ds = load("nino3")
    res = cwt_analysis(ds.values, ds.dt, t0=ds.t0)
    g = golden("cwt_nino3_morlet6")
    assert rel_err(res.W, g["W"]) < 1e-10
    assert res.power.shape == res.sig95.shape == res.W.shape
    # significance ratio: some but not all points significant
    frac = (res.sig95 > 1).mean()
    assert 0.01 < frac < 0.5
    # reconstruction resembles the input
    snr = 10 * np.log10(np.mean(res.signal ** 2) /
                        np.mean((res.signal - res.iwave / res.std) ** 2))
    assert snr > 10
    assert np.isfinite(res.scale_avg).all()
    assert np.isfinite(res.scale_avg_signif)
    assert np.isfinite(res.global_signif).all()


def test_xwt_wct_analysis_smoke():
    jao, jbaltic = load("jao"), load("jbaltic")
    n = min(jao.values.size, jbaltic.values.size)
    x = xwt_analysis(jao.values[:n], jbaltic.values[:n], jao.dt,
                     boxpdf_transform=True)
    assert np.isfinite(x["cross_power"]).all()
    w = wct_analysis(jao.values[:n], jbaltic.values[:n], jao.dt, sig=False)
    assert np.isfinite(w["WCT"]).all()


def test_example_scripts_run():
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYCWT_TPU_PLATFORM": "cpu",
           "PYCWT_TPU_MC_COUNT": "10",
           "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}
    for script in ["examples/sample_cwt.py", "examples/sample_xwt.py",
                   "examples/sample_network.py"]:
        r = subprocess.run(
            [sys.executable, os.path.join(repo, script)], capture_output=True,
            text=True, timeout=600, env=env, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-2000:]


def test_figure_arrays_golden_nino3(golden):
    """Pin every array the 4-panel demo figure plots (the reference's
    de-facto regression artifact is its checked-in sample PNGs —
    /root/reference/MANIFEST.in:7; we pin the plotted DATA instead, so a
    plotting-path regression fails a test, not an eyeball diff)."""
    import pycwt_tpu as wt
    from pycwt_tpu.analysis import cwt_analysis
    from pycwt_tpu.sample import load

    g = golden("figure_nino3")
    ds = load("nino3")
    res = cwt_analysis(ds.values, ds.dt, t0=ds.t0, mother=wt.Morlet(6),
                       avg_band=(2, 8))
    for name in ("t", "signal", "iwave", "period", "power", "sig95", "coi",
                 "global_power", "global_signif", "scale_avg"):
        np.testing.assert_allclose(
            getattr(res, name), g[name], rtol=1e-10, atol=1e-12,
            err_msg=f"figure panel array {name!r} drifted")
    np.testing.assert_allclose(res.scale_avg_signif, g["scale_avg_signif"],
                               rtol=1e-10)
    np.testing.assert_allclose(res.alpha, g["alpha"], rtol=1e-10)


def test_figure_arrays_golden_jao_jbaltic(golden):
    """Same for the XWT/WCT demo figure arrays."""
    from pycwt_tpu.analysis import wct_analysis, xwt_analysis
    from pycwt_tpu.sample import load

    g = golden("figure_jao_jbaltic")
    jao, jba = load("jao"), load("jbaltic")
    n = min(jao.values.size, jba.values.size)
    x = xwt_analysis(jao.values[:n], jba.values[:n], jao.dt,
                     significance_level=0.8646)
    w = wct_analysis(jao.values[:n], jba.values[:n], jao.dt, sig=False)
    np.testing.assert_allclose(x["cross_power"], g["cross_power"], rtol=1e-10)
    np.testing.assert_allclose(x["cross_sig"], g["cross_sig"], rtol=1e-10)
    np.testing.assert_allclose(x["coi"], g["xwt_coi"], rtol=1e-10)
    np.testing.assert_allclose(w["WCT"], g["wct"], rtol=1e-10)
    np.testing.assert_allclose(w["phase"], g["wct_phase"], rtol=1e-10)


def test_cwt_analysis_planar_engine_matches(monkeypatch):
    """cwt_analysis under the planar engine (complex-free runtimes) matches
    the complex path to f32 round-off across every output field."""
    import pycwt_tpu.sample.dataset as dsm
    from pycwt_tpu.analysis import cwt_analysis

    ds = dsm.load("nino3")
    ref = cwt_analysis(ds.values, ds.dt, t0=ds.t0)
    monkeypatch.setenv("PYCWT_TPU_ENGINE", "planar")
    got = cwt_analysis(ds.values, ds.dt, t0=ds.t0)
    for field in ("power", "sig95", "global_power", "scale_avg", "iwave"):
        a = getattr(got, field)
        b = getattr(ref, field)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=5e-5 * scale, rtol=0,
                                   err_msg=field)
    # result.W must carry BOTH planes under the planar engine (ADVICE r3:
    # W held only Re(W), silently corrupting phase consumers).
    assert np.iscomplexobj(got.W)
    wscale = np.abs(ref.W).max()
    np.testing.assert_allclose(got.W.real, ref.W.real, atol=5e-5 * wscale,
                               rtol=0)
    np.testing.assert_allclose(got.W.imag, ref.W.imag, atol=5e-5 * wscale,
                               rtol=0)


def test_xwt_analysis_planar_engine_matches(monkeypatch):
    """xwt_analysis under the planar engine matches the complex path."""
    from pycwt_tpu.analysis import xwt_analysis

    rng = np.random.default_rng(23)
    y1 = rng.standard_normal(250)
    y2 = 0.5 * y1 + rng.standard_normal(250)
    ref = xwt_analysis(y1, y2, 0.25)
    monkeypatch.setenv("PYCWT_TPU_ENGINE", "planar")
    got = xwt_analysis(y1, y2, 0.25)
    scale = ref["cross_power"].max()
    np.testing.assert_allclose(got["cross_power"], ref["cross_power"],
                               atol=5e-5 * scale, rtol=0)
    np.testing.assert_allclose(got["signif"], ref["signif"], rtol=1e-10)
    m = ref["cross_power"] > 1e-3 * scale
    dphi = np.angle(np.exp(1j * (got["phase"] - ref["phase"])))
    assert np.abs(dphi[m]).max() < 1e-3


def test_wct_matrix_analysis_composes_pieces():
    """wct_matrix_analysis == wct_matrix + ar1_batch + batched nulls,
    with the degenerate-fit white-noise fallback applied."""
    from pycwt_tpu.analysis import wct_matrix_analysis
    from pycwt_tpu.coherence import wct_matrix, wct_significance_batch
    from pycwt_tpu.stats import ar1_batch

    rng = np.random.default_rng(51)
    B, N = 4, 220
    y = rng.standard_normal((B, N))
    out = wct_matrix_analysis(y, 0.5, dj=1 / 8, mc_count=8, cache=False,
                              seed=5)
    P = B * (B - 1) // 2
    assert out["WCT"].shape[0] == P and out["sig95"].shape[0] == P
    WCT_ref, _, _, _, pairs = wct_matrix(y, 0.5, dj=1 / 8)
    np.testing.assert_allclose(out["WCT"], WCT_ref, atol=1e-12)
    g, _, _ = ar1_batch(y)
    import pycwt_tpu as wt
    m = wt.Morlet(6)
    s0 = 2 * 0.5 / m.flambda()
    J = int(np.round(np.log2(N * 0.5 / s0) / (1 / 8)))
    sig_ref = wct_significance_batch(g[pairs[:, 0]], g[pairs[:, 1]], dt=0.5,
                                     dj=1 / 8, s0=s0, J=J,
                                     significance_level=0.8646, mc_count=8,
                                     seed=5, cache=False, progress=False)
    np.testing.assert_array_equal(out["sig95"], sig_ref)
    assert out["alpha"].shape == (B,) and np.isfinite(out["alpha"]).all()
