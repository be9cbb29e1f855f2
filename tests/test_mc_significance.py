"""Monte-Carlo WCT significance: distributional parity with the reference's
fixed-seed 300-surrogate curve, determinism, and the disk-cache contract.

Bitwise parity with the reference is impossible (it uses the global numpy RNG,
``helpers.py:170``); BASELINE.json asks for distributional agreement of the
300-surrogate significance curves.
"""
import os

import numpy as np
import pytest

import pycwt_tpu as wt
from pycwt_tpu.coherence import wct_significance


@pytest.fixture(scope="module")
def sig_inputs(request):
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "wct_sig_jao_jbaltic.npz"))
    return g


def test_mc_distributional_parity(sig_inputs):
    g = sig_inputs
    sig95 = wct_significance(float(g["al1"]), float(g["al2"]),
                             dt=float(g["dt"]), dj=float(g["dj"]),
                             s0=float(g["s0"]), J=int(g["J"]),
                             mc_count=300, progress=False, cache=False,
                             seed=7)
    ref = g["sig95"]
    assert sig95.shape == ref.shape
    # NaN/zero structure must match exactly (COI bookkeeping).
    assert np.array_equal(np.isnan(sig95), np.isnan(ref))
    assert np.array_equal(sig95 == 0, ref == 0)
    valid = np.isfinite(ref) & (ref != 0)
    diff = np.abs(sig95[valid] - ref[valid])
    # 95th-percentile-of-coherence curves from two independent 300-sample
    # ensembles: allow a modest MC tolerance band.
    assert diff.max() < 0.06, f"max |Δsig95| = {diff.max():.4f}"
    assert diff.mean() < 0.02, f"mean |Δsig95| = {diff.mean():.4f}"


def test_mc_deterministic_given_seed(sig_inputs):
    g = sig_inputs
    kw = dict(dt=float(g["dt"]), dj=float(g["dj"]), s0=float(g["s0"]),
              J=int(g["J"]), mc_count=20, progress=False, cache=False, seed=3)
    a = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    b = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    np.testing.assert_array_equal(a, b)


def test_mc_cache_roundtrip(sig_inputs, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("PYCWT_TPU_CACHE_DIR", str(tmp_path))
    g = sig_inputs
    kw = dict(dt=float(g["dt"]), dj=float(g["dj"]), s0=float(g["s0"]),
              J=int(g["J"]), mc_count=10, progress=False, cache=True, seed=0)
    a = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].name.startswith("wct_sig_")
    b = wct_significance(float(g["al1"]), float(g["al2"]), **kw)
    out = capsys.readouterr().out
    assert "loaded from cache" in out
    np.testing.assert_allclose(a, b, atol=1e-12)
