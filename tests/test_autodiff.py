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
