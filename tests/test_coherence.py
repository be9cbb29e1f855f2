"""Parity tests for the WCT smoothing operator, XWT, WCT, and helpers."""
import numpy as np
import pytest

import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.ops.smoothing import smooth
from tests.conftest import rel_err


def test_smooth_real_golden(golden):
    g = golden("smooth")
    out = smooth(jnp.asarray(g["Wr"]), float(g["dt"]), float(g["dj"]),
                 jnp.asarray(g["scales"]), wt.Morlet(6))
    assert rel_err(np.asarray(out), g["sm_r"]) < 1e-10


def test_smooth_complex_golden(golden):
    g = golden("smooth")
    out = smooth(jnp.asarray(g["Wc"]), float(g["dt"]), float(g["dj"]),
                 jnp.asarray(g["scales"]), wt.Morlet(6))
    assert rel_err(np.asarray(out), g["sm_c"]) < 1e-10


def test_smooth_batched_consistency(golden):
    g = golden("smooth")
    batch = jnp.stack([jnp.asarray(g["Wr"]), 2 * jnp.asarray(g["Wr"])])
    out = np.asarray(smooth(batch, float(g["dt"]), float(g["dj"]),
                            jnp.asarray(g["scales"]), wt.Morlet(6)))
    assert rel_err(out[0], g["sm_r"]) < 1e-10
    assert rel_err(out[1], 2 * g["sm_r"]) < 1e-10


def test_smooth_nontabulated_deltaj0_raises(golden):
    g = golden("smooth")
    with pytest.raises(ValueError):
        smooth(jnp.asarray(g["Wr"]), 0.25, 1 / 8, jnp.asarray(g["scales"]),
               wt.Morlet(5))


@pytest.mark.parametrize("norm", [0, 1])
def test_xwt_golden(golden, norm):
    g = golden(f"xwt_jao_jbaltic_norm{norm}")
    W12, coi, freq, signif = wt.xwt(g["y1"], g["y2"], float(g["dt"]),
                                    significance_level=0.8646,
                                    normalize=bool(norm))
    assert rel_err(W12, g["W12"]) < 1e-10
    assert rel_err(coi, g["coi"]) < 1e-12
    assert rel_err(freq, g["freq"]) < 1e-12
    assert rel_err(signif, g["signif"]) < 1e-10


def test_wct_golden(golden):
    g = golden("wct_jao_jbaltic")
    WCT, aWCT, coi, freq, _ = wt.wct(g["y1"], g["y2"], float(g["dt"]),
                                     sig=False)
    assert rel_err(WCT, g["WCT"]) < 1e-10
    # phases compared absolutely (angles near ±π wrap)
    d = np.angle(np.exp(1j * (aWCT - g["aWCT"])))
    assert np.abs(d).max() < 1e-10
    assert rel_err(coi, g["coi"]) < 1e-12
    assert rel_err(freq, g["freq"]) < 1e-12


def test_wct_bounded():
    """Coherence is in [0, 1] up to smoothing numerics."""
    g1 = np.sin(np.arange(400) * 0.3) + np.random.default_rng(0).standard_normal(400)
    g2 = np.sin(np.arange(400) * 0.3) + np.random.default_rng(1).standard_normal(400)
    WCT, *_ = wt.wct(g1, g2, 1.0, sig=False)
    assert WCT.min() > -1e-9
    assert WCT.max() < 1.0 + 1e-6


def test_wct_works_for_all_mothers():
    """The reference crashes for Paul/DOG (smooth only on Morlet) — fixed."""
    rng = np.random.default_rng(2)
    y1 = rng.standard_normal(256)
    y2 = rng.standard_normal(256)
    for mother in [wt.Paul(4), wt.DOG(2), wt.DOG(6), wt.MexicanHat()]:
        WCT, aWCT, coi, freq, _ = wt.wct(y1, y2, 1.0, sig=False,
                                         wavelet=mother)
        assert np.isfinite(WCT).all()


def test_rect_and_boxpdf():
    win = wt.rect(5)
    assert np.allclose(win, [0.5, 1, 1, 1, 0.5])
    win = wt.rect(5, normalize=True)
    assert abs(win.sum() - 1) < 1e-15

    rng = np.random.default_rng(0)
    x = rng.exponential(size=300)
    bx, X, Y = wt.boxpdf(x)
    assert bx.min() >= 0 and bx.max() <= 1
    # rank transform preserves ordering
    assert np.all(np.argsort(bx) == np.argsort(x))


def test_planar_engine_warns_on_f64():
    """engine='planar' is f32-only: f64 (parity-mode) inputs must warn about
    the downcast instead of silently returning f32 results (VERDICT r2)."""
    import pytest
    from pycwt_tpu.config import CWTConfig

    rng = np.random.default_rng(5)
    y1 = rng.standard_normal(100)
    y2 = rng.standard_normal(100)
    cfg = CWTConfig(engine="planar")  # x64 on (conftest) → f64 inputs
    with pytest.warns(UserWarning, match="float32"):
        wt.wct(y1, y2, 1.0, sig=False, config=cfg)


def test_smooth_planar_pair_matches_single_plane():
    """smooth_planar_pair (two real planes in one complex planar DFT) equals
    two smooth_planar_real calls to f32 round-off — the linearity packing the
    WCT/MC hot path relies on (coherence._wct_core_planar)."""
    import jax.numpy as jnp

    from pycwt_tpu.ops.smoothing import smooth_planar_pair, smooth_planar_real

    rng = np.random.default_rng(3)
    S, N = 12, 300
    scales = jnp.asarray(2.0 * 2 ** (np.arange(S) * 0.25), jnp.float32)
    Ta = jnp.asarray(rng.standard_normal((S, N)), jnp.float32)
    Tb = jnp.asarray(rng.standard_normal((S, N)), jnp.float32)
    mother = wt.Morlet(6)
    sa_ref = np.asarray(smooth_planar_real(Ta, 0.25, 1 / 8, scales, mother))
    sb_ref = np.asarray(smooth_planar_real(Tb, 0.25, 1 / 8, scales, mother))
    sa, sb = smooth_planar_pair(Ta, Tb, 0.25, 1 / 8, scales, mother)
    scale = max(np.abs(sa_ref).max(), np.abs(sb_ref).max())
    np.testing.assert_allclose(np.asarray(sa), sa_ref, atol=1e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(sb), sb_ref, atol=1e-5 * scale, rtol=0)


def test_wct_pairs_matches_per_pair_wct():
    """wct_pairs (B pairs, one dispatch) equals B independent wct calls —
    the batched public surface the reference has no counterpart for."""
    rng = np.random.default_rng(11)
    B, N = 3, 240
    y1 = rng.standard_normal((B, N))
    y2 = 0.4 * y1 + rng.standard_normal((B, N))
    Wb, ab, coi, freq = wt.wct_pairs(y1, y2, 0.25, dj=1 / 8)
    assert Wb.shape == ab.shape and Wb.shape[0] == B
    for b in range(B):
        W1, a1_, coi1, freq1, _ = wt.wct(y1[b], y2[b], 0.25, dj=1 / 8,
                                         sig=False)
        np.testing.assert_allclose(Wb[b], W1, rtol=0, atol=1e-10)
        np.testing.assert_allclose(ab[b], a1_, rtol=0, atol=1e-10)
        np.testing.assert_allclose(coi, coi1)
        np.testing.assert_allclose(freq, freq1)


def test_xwt_pairs_matches_per_pair_xwt():
    """xwt_pairs equals B independent xwt calls (values + significance)."""
    rng = np.random.default_rng(12)
    B, N = 3, 220
    y1 = rng.standard_normal((B, N))
    y2 = 0.3 * y1 + rng.standard_normal((B, N))
    Wb, coi, freq, sigb = wt.xwt_pairs(y1, y2, 0.5, dj=1 / 8)
    assert Wb.shape[0] == B and sigb.shape[0] == B
    for b in range(B):
        W1, coi1, freq1, sig1 = wt.xwt(y1[b], y2[b], 0.5, dj=1 / 8)
        np.testing.assert_allclose(Wb[b], W1, rtol=0, atol=1e-10)
        np.testing.assert_allclose(sigb[b], sig1, rtol=1e-12)
        np.testing.assert_allclose(coi, coi1)


def test_xwt_planar_matches_complex_xwt():
    """xwt_planar (complex-free) reproduces xwt's |W12|, phase, and signif."""
    from pycwt_tpu.config import CWTConfig

    rng = np.random.default_rng(13)
    N = 260
    y1 = rng.standard_normal(N)
    y2 = 0.4 * y1 + rng.standard_normal(N)
    W12, coi, freq, sig = wt.xwt(y1, y2, 0.5, dj=1 / 8)
    mag, phase, coi2, freq2, sig2 = wt.xwt_planar(
        y1, y2, 0.5, dj=1 / 8, config=CWTConfig(engine="planar"))
    scale = np.abs(W12).max()
    np.testing.assert_allclose(mag, np.abs(W12), atol=2e-5 * scale, rtol=0)
    # phase compared where the magnitude is non-negligible
    m = np.abs(W12) > 1e-3 * scale
    dphi = np.angle(np.exp(1j * (phase - np.angle(W12))))
    assert np.abs(dphi[m]).max() < 1e-3
    np.testing.assert_allclose(sig2, sig, rtol=1e-10)
    np.testing.assert_allclose(coi2, coi)


def test_wct_pairs_scan_blocking_invariant():
    """Scan-chunked wct_pairs (pair_block < B, incl. a ragged tail) is
    bit-for-bit the unchunked dispatch — large batches never change results,
    only bound memory (VERDICT r3 #2)."""
    rng = np.random.default_rng(21)
    B, N = 7, 180
    y1 = rng.standard_normal((B, N))
    y2 = 0.5 * y1 + rng.standard_normal((B, N))
    Wa, aa, coi_a, freq_a = wt.wct_pairs(y1, y2, 0.25, dj=1 / 8,
                                         pair_block=B)
    Wb, ab, coi_b, freq_b = wt.wct_pairs(y1, y2, 0.25, dj=1 / 8,
                                         pair_block=3)  # 3 blocks, ragged
    np.testing.assert_allclose(Wb, Wa, rtol=0, atol=1e-12)
    np.testing.assert_allclose(ab, aa, rtol=0, atol=1e-12)
    np.testing.assert_allclose(coi_b, coi_a)
    np.testing.assert_allclose(freq_b, freq_a)


def test_xwt_pairs_scan_blocking_invariant():
    rng = np.random.default_rng(22)
    B, N = 5, 200
    y1 = rng.standard_normal((B, N))
    y2 = rng.standard_normal((B, N))
    Wa, _, _, siga = wt.xwt_pairs(y1, y2, 0.5, dj=1 / 8, pair_block=B)
    Wb, _, _, sigb = wt.xwt_pairs(y1, y2, 0.5, dj=1 / 8, pair_block=2)
    np.testing.assert_allclose(Wb, Wa, rtol=0, atol=1e-12)
    np.testing.assert_allclose(sigb, siga, rtol=1e-12)


def test_pairs_block_bytes_model():
    """The auto block stays at/below the measured-cliff scale and never
    exceeds B."""
    from pycwt_tpu.coherence import _pairs_block

    blk = _pairs_block(1024, 110, 1024, 4)
    assert 8 <= blk <= 64          # well under the measured B=128 collapse
    assert _pairs_block(4, 110, 1024, 4) == 4
    assert _pairs_block(1024, 8, 64, 4) >= 512  # tiny maps: big blocks fine


def test_xwt_pairs_nan_row_drop_matches_per_pair():
    """Paul at large scales triggers the reference NaN-row drop; the batched
    surface must keep the same (filtered) scale axis as per-pair xwt
    (ADVICE r3)."""
    rng = np.random.default_rng(23)
    B, N = 2, 300
    y1 = rng.standard_normal((B, N))
    y2 = rng.standard_normal((B, N))
    kw = dict(dj=1 / 8, wavelet="paul", s0=0.5, J=40)
    Wb, _, freqb, sigb = wt.xwt_pairs(y1, y2, 0.25, **kw)
    W0, _, freq0, sig0 = wt.xwt(y1[0], y2[0], 0.25, **kw)
    assert Wb.shape[1] == W0.shape[0]
    np.testing.assert_allclose(freqb, freq0)
    np.testing.assert_allclose(Wb[0], W0, rtol=0, atol=1e-10)
    np.testing.assert_allclose(sigb[0], sig0, rtol=1e-12)


def test_xwt_planar_non_pow2_nfft_raises():
    """pad_pow2=False with a non-pow-2 length must fail with a clear error,
    not an opaque low-level one (ADVICE r3)."""
    from pycwt_tpu.config import CWTConfig

    y = np.random.default_rng(0).standard_normal(300)
    with pytest.raises(ValueError, match="power-of-two"):
        wt.xwt_planar(y, y, 1.0, config=CWTConfig(pad_pow2=False,
                                                  engine="planar"))


def test_xwt_pairs_planar_matches_complex_pairs():
    """Batched complex-free XWT pairs == xwt_pairs magnitude/phase/signif
    (the complex-free batched serving surface for the axon runtime)."""
    from pycwt_tpu.config import CWTConfig

    rng = np.random.default_rng(31)
    B, N = 5, 256
    y1 = rng.standard_normal((B, N))
    y2 = 0.4 * y1 + rng.standard_normal((B, N))
    W12, coi, freq, sig = wt.xwt_pairs(y1, y2, 0.5, dj=1 / 8)
    mag, phase, coi2, freq2, sig2 = wt.xwt_pairs_planar(
        y1, y2, 0.5, dj=1 / 8, config=CWTConfig(engine="planar"),
        pair_block=2)  # exercise the scan path too
    scale = np.abs(W12).max()
    np.testing.assert_allclose(mag, np.abs(W12), atol=2e-5 * scale, rtol=0)
    m = np.abs(W12) > 1e-3 * scale
    dphi = np.angle(np.exp(1j * (phase - np.angle(W12))))
    assert np.abs(dphi[m]).max() < 1e-3
    np.testing.assert_allclose(sig2, sig, rtol=1e-10)
    np.testing.assert_allclose(coi2, coi)
    np.testing.assert_allclose(freq2, freq)


def test_xwt_pairs_planar_non_pow2_raises():
    from pycwt_tpu.config import CWTConfig

    y = np.random.default_rng(0).standard_normal((2, 300))
    with pytest.raises(ValueError, match="power-of-two"):
        wt.xwt_pairs_planar(y, y, 1.0,
                            config=CWTConfig(pad_pow2=False,
                                             engine="planar"))


def test_wct_matrix_matches_per_pair_wct():
    """wct_matrix (shared-CWT all-pairs core) equals independent wct calls
    for every pair, default all-pairs enumeration, both engine families."""
    from pycwt_tpu.config import CWTConfig

    rng = np.random.default_rng(41)
    B, N = 4, 240
    y = rng.standard_normal((B, N))
    for cfg in (None, CWTConfig(engine="planar")):
        kw = dict(dj=1 / 8)
        if cfg is not None:
            kw["config"] = cfg
        WCT, aWCT, coi, freq, pairs = wt.wct_matrix(y, 0.25, pair_block=2,
                                                    **kw)
        assert len(pairs) == B * (B - 1) // 2
        for p, (i, j) in enumerate(pairs):
            Wij, aij, coi1, freq1, _ = wt.wct(y[i], y[j], 0.25, dj=1 / 8,
                                              sig=False)
            tol = 1e-10 if cfg is None else 5e-5 * np.abs(Wij).max()
            np.testing.assert_allclose(WCT[p], Wij, rtol=0, atol=tol,
                                       err_msg=f"pair {(i, j)} cfg={cfg}")
            if cfg is None:
                np.testing.assert_allclose(aWCT[p], aij, rtol=0, atol=1e-10)
        np.testing.assert_allclose(coi, coi1)
        np.testing.assert_allclose(freq, freq1)


def test_wct_matrix_explicit_pairs_and_validation():
    rng = np.random.default_rng(42)
    y = rng.standard_normal((5, 200))
    sel = np.array([[0, 3], [2, 2], [4, 1]])
    WCT, aWCT, _, _, pairs = wt.wct_matrix(y, 1.0, dj=1 / 8, pairs=sel)
    assert WCT.shape[0] == 3 and (pairs == sel).all()
    # self-pair coherence is ~1 outside numerical edges
    assert np.nanmedian(WCT[1]) > 0.99
    with pytest.raises(ValueError, match="out of range"):
        wt.wct_matrix(y, 1.0, pairs=[[0, 7]])
    with pytest.raises(ValueError, match="no pairs"):
        wt.wct_matrix(y, 1.0, pairs=np.zeros((0, 2), int))


def test_wct_matrix_resident_set_guard():
    """A request whose shared (B, S, nfft) residents exceed the budget
    fails fast with an actionable message instead of an opaque device OOM
    (VERDICT r4 weak #6); the default budget admits ordinary workloads."""
    rng = np.random.default_rng(7)
    y = rng.standard_normal((6, 256))
    with pytest.raises(ValueError, match="sharded_wct_matrix"):
        wt.wct_matrix(y, 1.0, dj=1 / 8, max_bytes=1e5)
    # Same request inside the default budget runs.
    WCT, *_ = wt.wct_matrix(y, 1.0, dj=1 / 8)
    assert np.isfinite(WCT).any()


def test_wct_nan_row_drop_matches_reference_semantics():
    """wct/wct_pairs/wct_matrix inherit cwt's NaN-row drop (reference
    wavelet.py:499-514 builds its WCT on cwt's FILTERED scale axis) — for
    drop-triggering mothers (Paul at large scales) the scale count must
    match api.cwt's."""
    rng = np.random.default_rng(61)
    N = 300
    y1 = rng.standard_normal(N)
    y2 = rng.standard_normal(N)
    kw = dict(dj=1 / 8, wavelet="paul", s0=0.5, J=40)
    W_cwt, sj_cwt, freq_cwt, *_ = wt.cwt(y1, 0.25, **kw)
    WCT, aW, coi, freq, _ = wt.wct(y1, y2, 0.25, sig=False, **kw)
    assert WCT.shape[0] == len(sj_cwt)
    np.testing.assert_allclose(freq, freq_cwt)
    Wp, ap, _, freq_p = wt.wct_pairs(y1[None], y2[None], 0.25, **kw)
    assert Wp.shape[1] == len(sj_cwt)
    np.testing.assert_allclose(Wp[0], WCT, rtol=0, atol=1e-10)
    Wm, am, _, freq_m, pairs = wt.wct_matrix(np.stack([y1, y2]), 0.25, **kw)
    assert Wm.shape[1] == len(sj_cwt)
    np.testing.assert_allclose(freq_m, freq_cwt)


def test_wct_matrix_as_numpy_false_returns_device_arrays():
    """as_numpy=False skips the host fetch (the maps can be ~450 MB and the
    fetch dominates on slow links — BASELINE.md round 5); values match."""
    import jax

    rng = np.random.default_rng(12)
    y = rng.standard_normal((4, 128))
    Wn, An, coi, fr, pairs = wt.wct_matrix(y, 1.0, dj=1 / 8)
    Wd, Ad, coi2, fr2, pairs2 = wt.wct_matrix(y, 1.0, dj=1 / 8,
                                              as_numpy=False)
    assert isinstance(Wd, jax.Array) and isinstance(Ad, jax.Array)
    np.testing.assert_allclose(np.asarray(Wd), Wn, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Ad), An, rtol=0, atol=1e-12)
