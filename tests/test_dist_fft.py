"""Distributed pencil FFT (parallel/dist_fft.py): exact equality with the
global jnp.fft on an 8-virtual-device CPU mesh, forward + inverse, real and
complex inputs, and the O(N/D) sharding layout."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pycwt_tpu.parallel import MeshSpec, make_mesh, sharded_dft, sharded_idft


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(MeshSpec(data=8), devices=jax.devices()[:8])


@pytest.mark.parametrize("N", [1 << 8, 1 << 10, 1 << 13])
def test_sharded_dft_matches_fft_real(mesh8, N):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N))
    out = np.asarray(sharded_dft(mesh8, x))
    ref = np.fft.fft(np.asarray(x, np.float64))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9 * N)


def test_sharded_dft_matches_fft_complex(mesh8):
    rng = np.random.default_rng(1)
    N = 1 << 10
    x = jnp.asarray(rng.standard_normal(N) + 1j * rng.standard_normal(N))
    out = np.asarray(sharded_dft(mesh8, x))
    ref = np.fft.fft(np.asarray(x))
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9 * N)


def test_sharded_idft_roundtrip(mesh8):
    rng = np.random.default_rng(2)
    N = 1 << 10
    x = jnp.asarray(rng.standard_normal(N))
    X = sharded_dft(mesh8, x)
    back = np.asarray(sharded_idft(mesh8, X))
    np.testing.assert_allclose(back.real, np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(back.imag, 0, atol=1e-10)


def test_sharded_dft_output_sharding(mesh8):
    """Output stays sharded P('data') — no device holds the full spectrum."""
    x = jnp.asarray(np.random.default_rng(3).standard_normal(1 << 10))
    out = sharded_dft(mesh8, x)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {((1 << 10) // 8,)}


def test_sharded_dft_f32(mesh8):
    rng = np.random.default_rng(4)
    N = 1 << 10
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    out = np.asarray(sharded_dft(mesh8, x))
    ref = np.fft.fft(np.asarray(x, np.float64))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 1e-4


def test_sharded_dft_rejects_bad_sizes(mesh8):
    with pytest.raises(ValueError, match="pow-2"):
        sharded_dft(mesh8, jnp.zeros(1000))
    with pytest.raises(ValueError, match="pencil"):
        sharded_dft(mesh8, jnp.zeros(32))  # R1=4 < 8 devices


def test_sharded_cwt_spectral_exact_vs_global(mesh8):
    """The spectral sequence-parallel CWT equals the single-device global
    transform to round-off at EVERY scale — including the near-Nyquist ones
    where overlap-save degrades to ~1e-2 (its documented caveat)."""
    import pycwt_tpu as wt
    from pycwt_tpu.parallel import sharded_cwt_spectral
    from pycwt_tpu.transform import cwt_batch

    rng = np.random.default_rng(7)
    N = 1 << 11
    dt = 1.0
    x = jnp.asarray(rng.standard_normal(N))
    mother = wt.Morlet(6)
    # include the TC98-default finest scale 2dt/lambda ≈ 1.94dt
    scales = jnp.asarray([2 * dt / mother.flambda(), 2.0, 7.3, 64.0, 256.0])
    W = np.asarray(sharded_cwt_spectral(mesh8, x, scales, dt, mother=mother))
    W_ref, _ = cwt_batch(x[None], scales, dt, mother=mother, nfft=N)
    W_ref = np.asarray(W_ref[0])
    scale = np.abs(W_ref).max()
    assert np.abs(W - W_ref).max() / scale < 1e-10


def test_sharded_cwt_spectral_sharding_layout(mesh8):
    import pycwt_tpu as wt
    from pycwt_tpu.parallel import sharded_cwt_spectral

    N = 1 << 10
    x = jnp.asarray(np.random.default_rng(8).standard_normal(N))
    scales = jnp.asarray([4.0, 16.0])
    W = sharded_cwt_spectral(mesh8, x, scales, 1.0, mother=wt.Morlet(6))
    assert W.shape == (2, N)
    shard_shapes = {s.data.shape for s in W.addressable_shards}
    assert shard_shapes == {(2, N // 8)}


def test_sharded_dft_planar_matches_complex(mesh8):
    """The planar pencil DFT (no complex dtype anywhere) equals the complex
    pipeline — real and complex inputs (VERDICT r3 #3)."""
    from pycwt_tpu.parallel import sharded_dft_planar

    rng = np.random.default_rng(9)
    N = 1 << 10
    x = rng.standard_normal(N)
    Xr, Xi = sharded_dft_planar(mesh8, jnp.asarray(x))
    ref = np.fft.fft(x)
    np.testing.assert_allclose(np.asarray(Xr), ref.real, atol=1e-9 * N)
    np.testing.assert_allclose(np.asarray(Xi), ref.imag, atol=1e-9 * N)
    # complex input via explicit planes
    yi = rng.standard_normal(N)
    Xr2, Xi2 = sharded_dft_planar(mesh8, jnp.asarray(x), jnp.asarray(yi))
    ref2 = np.fft.fft(x + 1j * yi)
    np.testing.assert_allclose(np.asarray(Xr2), ref2.real, atol=1e-9 * N)
    np.testing.assert_allclose(np.asarray(Xi2), ref2.imag, atol=1e-9 * N)


def test_sharded_dft_planar_output_sharding(mesh8):
    from pycwt_tpu.parallel import sharded_dft_planar

    x = jnp.asarray(np.random.default_rng(10).standard_normal(1 << 10))
    Xr, Xi = sharded_dft_planar(mesh8, x)
    for v in (Xr, Xi):
        assert {s.data.shape for s in v.addressable_shards} == {(128,)}


def test_sharded_cwt_spectral_planar_matches_complex(mesh8):
    """Planar spectral CWT == complex spectral CWT == global transform."""
    import pycwt_tpu as wt
    from pycwt_tpu.parallel import (sharded_cwt_spectral,
                                    sharded_cwt_spectral_planar)

    rng = np.random.default_rng(11)
    N = 1 << 11
    dt = 0.5
    x = jnp.asarray(rng.standard_normal(N))
    mother = wt.Morlet(6)
    scales = jnp.asarray([2 * dt / mother.flambda(), 2.0, 16.0, 128.0])
    W = np.asarray(sharded_cwt_spectral(mesh8, x, scales, dt, mother=mother))
    wr, wi = sharded_cwt_spectral_planar(mesh8, x, scales, dt, mother=mother)
    scale = np.abs(W).max()
    np.testing.assert_allclose(np.asarray(wr), W.real, atol=1e-10 * scale)
    np.testing.assert_allclose(np.asarray(wi), W.imag, atol=1e-10 * scale)
    for v in (wr, wi):
        assert {s.data.shape for s in v.addressable_shards} == {(4, N // 8)}


def test_sharded_cwt_spectral_planar_no_complex_in_hlo(mesh8):
    """The planar spectral pipeline's lowered HLO contains NO complex dtype —
    the property that lets it run on complex-free runtimes (axon TPU)."""
    import pycwt_tpu as wt
    from pycwt_tpu.parallel import sharded_cwt_spectral_planar

    N = 1 << 10
    x = jnp.asarray(np.zeros(N), jnp.float32)
    scales = jnp.asarray([4.0, 16.0], jnp.float32)
    f = jax.jit(lambda v: sharded_cwt_spectral_planar(
        mesh8, v, scales, 1.0, mother=wt.Morlet(6)))
    hlo = f.lower(x).as_text()
    assert "c64[" not in hlo and "c128[" not in hlo, "complex dtype leaked"
