"""Compensated two-float (double-f32) parity mode — the chip-side answer to
SURVEY §7's 'f64 on TPU' hard part (VERDICT r4 missing #1 / next #2).

These run on the CPU backend (f32 arithmetic is IEEE-identical across
backends, so the error-free transformations behave the same); the real-chip
bound is asserted by ``tests/test_tpu_chip.py::test_twofloat_parity_on_chip``
and recorded in BASELINE.md round 5 (~1e-11 measured on the v5e)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pycwt_tpu.ops import twofloat as tf

from conftest import rel_err


def test_eft_primitives_are_error_free():
    """two_sum/two_prod recover the exact f32 rounding error."""
    b32 = float(np.float32(1e-8))
    s, e = jax.jit(tf._two_sum)(jnp.float32(1.0), jnp.float32(1e-8))
    assert float(s) == 1.0 and float(e) == b32  # s + e == a + b EXACTLY
    a = np.float32(1.0 / 3.0)
    p, err = jax.jit(tf._two_prod)(jnp.float32(a), jnp.float32(3.0))
    exact = float(a) * 3.0  # f64 product of the f32 values is exact here
    assert float(p) + float(err) == exact


def test_df_split_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000) * 10.0 ** rng.integers(-6, 6, 1000)
    hi, lo = tf.df_from_f64(x)
    # |lo| bounded by hi's f32 ulp, elementwise (non-overlapping components).
    assert (np.abs(lo) <= np.spacing(np.abs(hi))).all()
    # hi + lo reproduces x to the pair's ~2^-48 working precision (lo is
    # itself rounded to f32, leaving a 0.5·ulp(lo) residual).
    np.testing.assert_allclose(tf.df_to_f64(hi, lo), x, rtol=4e-15)


@pytest.mark.parametrize("N", [8, 64, 512, 4096])
def test_fft_df_matches_numpy_f64(N):
    rng = np.random.default_rng(N)
    x = rng.standard_normal(N) + 1j * rng.standard_normal(N)
    rh, rl = tf.df_from_f64(x.real)
    ih, il = tf.df_from_f64(x.imag)
    o = tf.fft_df(jnp.asarray(rh), jnp.asarray(rl), jnp.asarray(ih),
                  jnp.asarray(il), N, -1)
    got = (tf.df_to_f64(np.asarray(o[0]), np.asarray(o[1]))
           + 1j * tf.df_to_f64(np.asarray(o[2]), np.asarray(o[3])))
    ref = np.fft.fft(x)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-13
    # Inverse round-trips (sign=+1, caller scales by the exact 1/N).
    b = tf.fft_df(*[jnp.asarray(v) for v in (*tf.df_from_f64(got.real),
                                             *tf.df_from_f64(got.imag))],
                  N, +1)
    back = (tf.df_to_f64(np.asarray(b[0]), np.asarray(b[1]))
            + 1j * tf.df_to_f64(np.asarray(b[2]), np.asarray(b[3]))) / N
    assert np.abs(back - x).max() < 1e-13 * np.abs(x).max() + 1e-13


def test_fft_df_rejects_non_pow2():
    with pytest.raises(ValueError, match="power-of-two"):
        tf.fft_df(jnp.zeros(12), jnp.zeros(12), jnp.zeros(12), jnp.zeros(12),
                  12)


@pytest.mark.parametrize("wavelet", ["morlet", "paul", "dog", "mexicanhat"])
def test_envelope_f64_matches_jnp_mothers(wavelet):
    """The host numpy envelope mirror cannot drift from the jnp mothers:
    under x64 both evaluate in f64 and must agree to round-off."""
    from pycwt_tpu.mothers import as_mother

    m = as_mother(wavelet)
    F = np.linspace(-40.0, 40.0, 1001)
    ours = tf._envelope_f64(m, F)
    theirs = np.asarray(m.psi_ft_envelope(jnp.asarray(F, jnp.float64)))
    # numpy and XLA libm exp() may differ by >1e-14 relative deep in the
    # underflow tails; parity matters where the envelope is non-negligible.
    np.testing.assert_allclose(ours, theirs, rtol=1e-13,
                               atol=1e-16 * float(theirs.max()))


def test_cwt_twofloat_matches_f64_golden(golden):
    g = golden("cwt_nino3_morlet6")
    W, sj, fr, coi = tf.cwt_twofloat(g["signal"], float(g["dt"]))
    assert W.shape == g["W"].shape
    np.testing.assert_allclose(sj, g["sj"], rtol=1e-12)
    assert rel_err(np.abs(W) ** 2, np.abs(g["W"]) ** 2) < 1e-9


def test_cwt_twofloat_custom_freqs_matches_golden(golden):
    g = golden("cwt_nino3_customfreqs")
    W, sj, fr, coi = tf.cwt_twofloat(g["signal"], float(g["dt"]),
                                     freqs=g["cfreqs"])
    assert rel_err(np.abs(W) ** 2, np.abs(g["W"]) ** 2) < 1e-9


def test_xwt_wct_twofloat_match_f64_goldens(golden):
    gx = golden("xwt_jao_jbaltic_norm1")
    W12, coi, fr = tf.xwt_twofloat(gx["y1"], gx["y2"], float(gx["dt"]))
    assert rel_err(np.abs(W12), np.abs(gx["W12"])) < 1e-10

    gw = golden("wct_jao_jbaltic")
    WCT, aW, coi2, fr2 = tf.wct_twofloat(gw["y1"], gw["y2"], float(gw["dt"]))
    assert rel_err(WCT, gw["WCT"]) < 1e-10
    # Phase agrees where coherence is meaningful.
    m = gw["WCT"] > 0.5
    assert np.abs(((aW - gw["aWCT"]) + np.pi) % (2 * np.pi) - np.pi)[m].max() \
        < 1e-9


def test_smooth_twofloat_matches_f64_smooth(golden):
    """Two-float smoothing equals the f64 engine smoothing (same semantics
    as reference mothers.py:61-104) to working precision."""
    from pycwt_tpu.mothers import Morlet
    from pycwt_tpu.ops.smoothing import smooth

    g = golden("smooth")
    T = np.abs(np.asarray(g["Wc"])) ** 2  # real (S, n) field
    scales = np.asarray(g["scales"])
    dt, dj = float(g["dt"]), float(g["dj"])
    ours = tf.smooth_twofloat(T / scales[:, None], scales, dt, dj, Morlet(6))
    ref = np.asarray(smooth(jnp.asarray(T / scales[:, None]),
                            dt, dj, jnp.asarray(scales), Morlet(6),
                            engine="xla"))
    assert rel_err(ours, ref) < 1e-11


def test_icwt_of_twofloat_w_reconstructs(golden):
    """Full-circle parity mode: icwt (host f64 math, api.py) applied to the
    two-float W matches the reference's reconstruction — the inverse needs
    no two-float arithmetic of its own."""
    import pycwt_tpu as wt

    g = golden("cwt_nino3_morlet6")
    W, sj, fr, coi = tf.cwt_twofloat(g["signal"], float(g["dt"]))
    iw = wt.icwt(W, sj, float(g["dt"]), dj=1 / 12, wavelet="morlet")
    ref = np.asarray(g["icwt"])
    assert np.abs(iw - ref).max() < 1e-10 * max(1.0, np.abs(ref).max())


def test_cwt_twofloat_batched_matches_per_signal(golden):
    """A (B, n0) batch runs in one dispatch and equals per-signal calls."""
    g = golden("cwt_nino3_morlet6")
    y = np.asarray(g["signal"], np.float64)
    batch = np.stack([y, 0.5 * y - 1.0])
    Wb, sj, fr, coi = tf.cwt_twofloat(batch, float(g["dt"]))
    assert Wb.shape == (2,) + g["W"].shape
    for b in range(2):
        W1, *_ = tf.cwt_twofloat(batch[b], float(g["dt"]))
        np.testing.assert_allclose(Wb[b], W1, rtol=0, atol=1e-13)


def test_cwt_twofloat_batch_resident_guard():
    """An oversized parity batch fails fast host-side (same convention as
    wct_matrix) instead of OOMing opaquely."""
    with pytest.raises(ValueError, match="Split the batch"):
        tf.cwt_twofloat(np.zeros((64, 2048)), 1.0, max_bytes=1e6)
