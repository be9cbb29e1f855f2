"""Differentiability of the transform cores — a capability the NumPy
reference cannot offer: gradients of wavelet-domain objectives w.r.t. the
input signal flow through the jitted FFT pipeline."""
import numpy as np

import jax
import jax.numpy as jnp

import pycwt_tpu as wt
from pycwt_tpu.config import next_pow2
from pycwt_tpu.transform import build_scale_grid, cwt_batch, icwt_batch


def _power_loss(x, scales, nfft):
    W, _ = cwt_batch(x[None], scales, 1.0, mother=wt.Morlet(6), nfft=nfft)
    return jnp.sum(jnp.abs(W) ** 2)


def test_grad_matches_finite_difference():
    rng = np.random.default_rng(0)
    N = 256
    x = jnp.asarray(rng.standard_normal(N))
    grid = build_scale_grid(N, 1.0, dj=0.5, s0=2.0, J=5)
    scales = jnp.asarray(grid.sj)
    nfft = next_pow2(N)

    g = jax.grad(_power_loss)(x, scales, nfft)
    eps = 1e-6
    for idx in [0, 57, 200]:
        e = jnp.zeros(N).at[idx].set(eps)
        fd = (_power_loss(x + e, scales, nfft) -
              _power_loss(x - e, scales, nfft)) / (2 * eps)
        assert abs(float(g[idx]) - float(fd)) < 1e-4 * max(1.0, abs(float(fd)))


def test_grad_through_reconstruction():
    """End-to-end cwt→icwt reconstruction loss is differentiable."""
    rng = np.random.default_rng(1)
    N = 128
    x = jnp.asarray(rng.standard_normal(N))
    grid = build_scale_grid(N, 1.0, dj=0.25, s0=2.0, J=8)
    scales = jnp.asarray(grid.sj)
    nfft = next_pow2(N)

    def recon_loss(x):
        W, _ = cwt_batch(x[None], scales, 1.0, mother=wt.Morlet(6), nfft=nfft)
        xr = icwt_batch(W, scales, 1.0, 0.25, mother=wt.Morlet(6))[0]
        return jnp.mean((xr - x) ** 2)

    g = jax.grad(recon_loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_grad_through_fused_planar_pipeline():
    """The fused Pallas planar CWT is differentiable: the primal runs the
    kernels, the backward replays the planar-XLA formulation (custom VJP —
    Pallas has no automatic transpose).  Gradients must match the pure-XLA
    planar pipeline's, including the scales path through the envelope."""
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar
    from pycwt_tpu.ops.pallas_fft import _small_planar_xla, fused_cwt_planar

    rng = np.random.default_rng(3)
    nfft = 1 << 14  # two-kernel big path
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    scales0 = jnp.asarray([4.0, 16.0, 64.0], jnp.float32)
    mother = wt.Morlet(6)

    def loss_fused(x, scales):
        sr, si = fft_of_real_planar(x, nfft)
        pw = fused_cwt_planar(sr, si, scales, mother=mother, nfft=nfft,
                              dt=1.0, interpret=True, output="power_sum")
        return pw.sum() / nfft

    def loss_ref(x, scales):
        sr, si = fft_of_real_planar(x, nfft)
        wr, wi = _small_planar_xla(sr, si, scales, mother=mother, nfft=nfft,
                                   dt=1.0,
                                   precision=jax.lax.Precision.HIGHEST)
        return (wr * wr + wi * wi).sum() / nfft

    gx, gs = jax.grad(loss_fused, argnums=(0, 1))(x, scales0)
    gx_ref, gs_ref = jax.grad(loss_ref, argnums=(0, 1))(x, scales0)
    assert np.isfinite(np.asarray(gx)).all()
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=0, atol=1e-4 * float(jnp.abs(gx_ref).max()))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gs_ref),
                               rtol=1e-4)


def test_grad_through_small_pallas_kernel():
    from pycwt_tpu.ops.mxu_dft import fft_of_real_planar
    from pycwt_tpu.ops.pallas_fft import fused_cwt_planar

    rng = np.random.default_rng(4)
    nfft = 512
    x = jnp.asarray(rng.standard_normal(nfft), jnp.float32)
    scales0 = jnp.asarray([4.0, 16.0], jnp.float32)
    mother = wt.Morlet(6)

    def loss(x, sk):
        sr, si = fft_of_real_planar(x, nfft)
        wr, wi = fused_cwt_planar(sr, si, scales0, mother=mother, nfft=nfft,
                                  dt=1.0, interpret=True, small_kernel=sk)
        return (wr * wr + wi * wi).sum() / nfft

    g_kern = jax.grad(lambda v: loss(v, True))(x)
    g_xla = jax.grad(lambda v: loss(v, False))(x)
    np.testing.assert_allclose(np.asarray(g_kern), np.asarray(g_xla),
                               rtol=0,
                               atol=1e-4 * float(jnp.abs(g_xla).max()))
