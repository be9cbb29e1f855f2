"""Correctness tests for the fused Pallas four-step CWT kernel (interpret
mode on CPU; the on-TPU validation lives in tools/tpu_bench_fused.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.ops.filterbank import angular_frequencies, filter_bank
from pycwt_tpu.ops.pallas_fft import fused_cwt, fused_cwt_planar, supported_nfft

MOTHERS = [wt.Morlet(6), wt.Paul(4), wt.DOG(2), wt.DOG(6)]


def _ref(X, scales, mother, nfft, dt):
    ftf = angular_frequencies(nfft, dt, jnp.float32)
    bank = filter_bank(mother, scales, ftf, dt).astype(jnp.complex64)
    return np.asarray(jnp.fft.ifft(X[None] * bank, axis=-1))


@pytest.mark.parametrize("mother", MOTHERS, ids=lambda m: f"{m.name}")
def test_fused_cwt_matches_xla(mother):
    nfft = 1 << 12
    rng = np.random.default_rng(0)
    X = jnp.fft.fft(jnp.asarray(rng.standard_normal(nfft), jnp.float32))
    X = X.astype(jnp.complex64)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(8) * 0.5), jnp.float32)
    W_ref = _ref(X, scales, mother, nfft, 1.0)
    W = np.asarray(fused_cwt(X, scales, mother=mother, nfft=nfft, dt=1.0,
                             Ablk=32, Cblk=32, interpret=True))
    scale = np.abs(W_ref).max()
    assert np.abs(W - W_ref).max() / scale < 1e-5


@pytest.mark.parametrize("small_kernel", [False, True],
                         ids=["planar_xla", "pallas_kernel"])
@pytest.mark.parametrize("nfft_pow", [8, 9, 10, 11, 12, 13, 14])
def test_fused_cwt_sizes(nfft_pow, small_kernel):
    """Both even and odd pow-2 splits (R1 ≠ R2); sizes ≤ 2^12 dispatch to the
    small path — NINO3's compat nfft=512 included — covered under BOTH its
    formulations (default planar-XLA and the opt-in direct-DFT Pallas
    kernel).  Above 2^12 ``small_kernel`` is ignored; skip the duplicate."""
    if nfft_pow > 12 and small_kernel:
        pytest.skip("small_kernel only affects nfft <= 2^12")
    nfft = 1 << nfft_pow
    rng = np.random.default_rng(1)
    X = jnp.fft.fft(jnp.asarray(rng.standard_normal(nfft), jnp.float32))
    X = X.astype(jnp.complex64)
    scales = jnp.asarray([4.0, 32.0], jnp.float32)
    W_ref = _ref(X, scales, wt.Morlet(6), nfft, 0.5)
    W = np.asarray(fused_cwt(X, scales, mother=wt.Morlet(6), nfft=nfft,
                             dt=0.5, Ablk=32, Cblk=32, interpret=True,
                             small_kernel=small_kernel))
    assert np.abs(W - W_ref).max() / np.abs(W_ref).max() < 1e-5


def test_fused_cwt_power_mode():
    nfft = 1 << 12
    rng = np.random.default_rng(2)
    X = jnp.fft.fft(jnp.asarray(rng.standard_normal(nfft), jnp.float32))
    X = X.astype(jnp.complex64)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(4)), jnp.float32)
    W_ref = _ref(X, scales, wt.Morlet(6), nfft, 1.0)
    p_ref = (np.abs(W_ref) ** 2).sum(-1)
    p = np.asarray(fused_cwt(X, scales, mother=wt.Morlet(6), nfft=nfft,
                             dt=1.0, Ablk=32, Cblk=32, power_only=True,
                             interpret=True))
    assert np.abs(p - p_ref).max() / p_ref.max() < 1e-5


def test_fused_cwt_planar_matches_complex():
    """The planar (no-complex-dtype) entry point equals the complex wrapper —
    the headline bench path on runtimes whose complex64 support flaps."""
    nfft = 1 << 12
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    from pycwt_tpu.ops.mxu_dft import fft_of_real, fft_of_real_planar

    sr, si = fft_of_real_planar(x, nfft)
    X = fft_of_real(x, nfft)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(X.real), atol=1e-3)
    np.testing.assert_allclose(np.asarray(si), np.asarray(X.imag), atol=1e-3)

    scales = jnp.asarray(2.0 * 2 ** (np.arange(8) * 0.5), jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=32, Cblk=32,
              interpret=True)
    wr, wi = fused_cwt_planar(sr, si, scales, **kw)
    W = np.asarray(fused_cwt(jax.lax.complex(sr, si), scales, **kw))
    np.testing.assert_array_equal(np.asarray(wr), W.real)
    np.testing.assert_array_equal(np.asarray(wi), W.imag)


@pytest.mark.parametrize("nfft", [512, 1 << 12])
def test_fused_cwt_half_spectrum_input(nfft):
    """Analytic mothers: feeding only the positive-frequency half of the
    spectrum (fft_of_real_planar(half=True)) gives the same W as the full
    spectrum — both small- and large-kernel paths."""
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    sr, si = fft_of_real_planar(x, nfft)
    hr, hi = fft_of_real_planar(x, nfft, half=True)
    # Same math, fewer outputs — but the smaller stage-2 matmul may tile (and
    # thus accumulate) differently in f32, so equality is to round-off.
    scale_ref = float(np.abs(np.asarray(sr)).max())
    np.testing.assert_allclose(np.asarray(hr), np.asarray(sr)[: nfft // 2],
                               atol=1e-4 * scale_ref, rtol=0)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(si)[: nfft // 2],
                               atol=1e-4 * scale_ref, rtol=0)

    scales = jnp.asarray(2.0 * 2 ** (np.arange(6) * 0.5), jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=32, Cblk=32,
              interpret=True)
    w_full = fused_cwt_planar(sr, si, scales, **kw)
    w_half = fused_cwt_planar(hr, hi, scales, **kw)
    wmax = float(np.abs(np.asarray(w_full[0])).max())
    np.testing.assert_allclose(np.asarray(w_half[0]), np.asarray(w_full[0]),
                               atol=1e-4 * wmax, rtol=0)
    np.testing.assert_allclose(np.asarray(w_half[1]), np.asarray(w_full[1]),
                               atol=1e-4 * wmax, rtol=0)

    with pytest.raises(ValueError):
        fused_cwt_planar(hr, hi, scales, mother=wt.DOG(2), nfft=nfft, dt=1.0,
                         Ablk=32, Cblk=32, interpret=True)


@pytest.mark.parametrize("small_kernel", [False, True],
                         ids=["planar_xla", "pallas_kernel"])
def test_fused_cwt_vmap_batch(small_kernel):
    """vmap over signals (how cwt_batch drives the fused engine at B>1)
    matches per-signal results — bit-exactly for the Pallas kernel (vmap adds
    a grid dimension, same per-signal program), and to f32 round-off for the
    planar-XLA path (batched matmuls may re-tile the contraction)."""
    nfft = 1 << 12
    B = 3
    rng = np.random.default_rng(6)
    X = jnp.fft.fft(jnp.asarray(rng.standard_normal((B, nfft)), jnp.float32))
    X = X.astype(jnp.complex64)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(8) * 0.5), jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=32, Cblk=32,
              interpret=True, small_kernel=small_kernel)
    W_b = np.asarray(jax.vmap(lambda s: fused_cwt(s, scales, **kw))(X))
    for b in range(B):
        W_1 = np.asarray(fused_cwt(X[b], scales, **kw))
        if small_kernel:
            np.testing.assert_array_equal(W_b[b], W_1)
        else:
            scale = np.abs(W_1).max()
            np.testing.assert_allclose(W_b[b], W_1, atol=1e-5 * scale, rtol=0)


@pytest.mark.parametrize("small_kernel", [False, True],
                         ids=["planar_xla", "pallas_kernel"])
@pytest.mark.parametrize("mother", MOTHERS, ids=lambda m: f"{m.name}")
def test_fused_cwt_small_all_mothers(mother, small_kernel):
    """Small path vs XLA for every mother (exercises both the analytic
    half-spectrum branch and the full-spectrum DOG branch at nfft=512),
    under both small-path formulations."""
    nfft = 512
    rng = np.random.default_rng(9)
    X = jnp.fft.fft(jnp.asarray(rng.standard_normal(nfft), jnp.float32))
    X = X.astype(jnp.complex64)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(6) * 0.5), jnp.float32)
    W_ref = _ref(X, scales, mother, nfft, 1.0)
    W = np.asarray(fused_cwt(X, scales, mother=mother, nfft=nfft, dt=1.0,
                             interpret=True, small_kernel=small_kernel))
    assert np.abs(W - W_ref).max() / np.abs(W_ref).max() < 1e-5


def test_supported_nfft():
    assert supported_nfft(1 << 8)
    assert supported_nfft(1 << 12)
    assert supported_nfft(1 << 20)
    assert not supported_nfft(1000)
    assert not supported_nfft(1 << 7)


def test_fused_cwt_planar_bf16x2_tier():
    """precision='high' (hand-rolled 2-pass compensated bf16 matmul,
    _dot_bf16x2) sits between 'fast' and 'highest': explicit bf16 casts make
    its rounding visible even in interpret mode — pin the bound."""
    nfft = 1 << 13
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar

    sr, si = fft_of_real_planar(x, nfft)
    scales = jnp.asarray([4.0, 16.0, 64.0, 256.0], jnp.float32)
    X = jnp.fft.fft(x.astype(jnp.complex64))
    W_ref = _ref(X.astype(jnp.complex64), scales, wt.Morlet(6), nfft, 1.0)
    wr, wi = fused_cwt_planar(sr, si, scales, mother=wt.Morlet(6), nfft=nfft,
                              dt=1.0, Ablk=32, Cblk=32, interpret=True,
                              precision="high")
    W = np.asarray(wr) + 1j * np.asarray(wi)
    err = np.abs(W - W_ref).max() / np.abs(W_ref).max()
    assert err < 2e-4, err   # ~1e-5..1e-4 expected; far below fast's ~5e-3


def test_dot_bf16x2_error_bound():
    """_dot_bf16x2 (outside any kernel) ~2 decades tighter than single-pass
    bf16 on random matmuls; only the lo·lo term is dropped."""
    from pycwt_tpu.ops.pallas_fft import _dot_bf16x2

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    ours = np.asarray(_dot_bf16x2(a, b))
    single = np.asarray(
        jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32))
    scale = np.abs(exact).max()
    err2 = np.abs(ours - exact).max() / scale
    err1 = np.abs(single - exact).max() / scale
    assert err2 < 5e-6, err2
    assert err2 < err1 / 50, (err2, err1)


@pytest.mark.parametrize("nfft", [1 << 12, 1 << 14],
                         ids=["small_path", "two_kernel_path"])
def test_fused_cwt_power_map_output(nfft):
    """output='power' writes |W|² inside kernel B's epilogue — equal to the
    squared planes on both the small and the two-kernel paths (VERDICT r3
    #1c: power-only consumers never round-trip planar W)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar

    sr, si = fft_of_real_planar(x, nfft)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(4)), jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=32, Cblk=32,
              interpret=True)
    wr, wi = fused_cwt_planar(sr, si, scales, **kw)
    pw = np.asarray(fused_cwt_planar(sr, si, scales, output="power", **kw))
    ref = np.asarray(wr) ** 2 + np.asarray(wi) ** 2
    np.testing.assert_allclose(pw, ref, rtol=0, atol=1e-6 * ref.max())


def test_fused_cwt_power_sum_two_kernel_path():
    """power_sum epilogue on the two-kernel path (the bench headline mode)."""
    nfft = 1 << 14
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar

    sr, si = fft_of_real_planar(x, nfft)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(4)), jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=32, Cblk=32,
              interpret=True)
    wr, wi = fused_cwt_planar(sr, si, scales, **kw)
    ref = (np.asarray(wr) ** 2 + np.asarray(wi) ** 2).sum(-1)
    p = np.asarray(fused_cwt_planar(sr, si, scales, output="power_sum", **kw))
    np.testing.assert_allclose(p, ref, rtol=1e-6)


def test_fused_cwt_fast_tier_bf16_t_error_bound():
    """The fast tier stores the inter-kernel T in bf16 (halving its HBM
    round-trip); the end-to-end error must stay at the fast tier's ~4e-3
    scale vs the highest tier."""
    nfft = 1 << 13
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar

    sr, si = fft_of_real_planar(x, nfft)
    scales = jnp.asarray(2.0 * 2 ** (np.arange(4)), jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=32, Cblk=32,
              interpret=True)
    wr_hi, wi_hi = fused_cwt_planar(sr, si, scales, precision="highest", **kw)
    wr_f, wi_f = fused_cwt_planar(sr, si, scales, precision="fast", **kw)
    scale = float(jnp.abs(wr_hi).max())
    err = max(float(jnp.abs(wr_f - wr_hi).max()),
              float(jnp.abs(wi_f - wi_hi).max())) / scale
    assert err < 2e-2, err


@pytest.mark.parametrize("nfft", [1 << 13, 1 << 14], ids=["small-routed",
                                                           "two-kernel"])
@pytest.mark.parametrize("n_in_frac", [1, 2], ids=["full", "half"])
def test_fused_cwt_mid_sizes(n_in_frac, nfft):
    """Mid sizes (round-4 regression, found by the 32-station MC workload
    whose surrogate nfft landed on 8192): 2^13 structurally cannot run the
    two-kernel pipeline on Mosaic (R1=64 -> 64-lane tiles, unsupported
    shape casts) and routes through the planar-XLA path; 2^14's analytic
    half path needs the shallower R2 split so substage 1 keeps >= 8
    sublanes.  Correctness vs the XLA reference for both."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar

    half = n_in_frac == 2
    sr, si = fft_of_real_planar(x, nfft, half=half)
    scales = jnp.asarray([8.0, 64.0, 512.0], jnp.float32)
    kw = dict(mother=wt.Morlet(6), nfft=nfft, dt=1.0, Ablk=64, Cblk=128,
              interpret=True)
    wr, wi = fused_cwt_planar(sr, si, scales, **kw)
    X = jnp.fft.fft(x, nfft).astype(jnp.complex64)
    W_ref = _ref(X, scales, wt.Morlet(6), nfft, 1.0)
    scale = np.abs(W_ref).max()
    assert np.abs((np.asarray(wr) + 1j * np.asarray(wi)) - W_ref).max() / scale < 1e-5
