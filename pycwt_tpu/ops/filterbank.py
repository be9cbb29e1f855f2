"""Wavelet filter-bank construction and application in Fourier space.

The whole forward CWT is, per the convolution theorem (reference
``/root/reference/pycwt/wavelet.py:96-106``):

    W[b, s, :] = ifft( fft(x[b])[k] · ψ̄̂_s[k] ),
    ψ̄̂_s[k]   = sqrt(s·ω₁·N) · conj(ψ̂(s·ω_k))

Because ``ω₁ = 2π/(N·dt)``, the normalization collapses to ``sqrt(2π·s/dt)`` —
independent of the FFT length — which is what we compute.

Every supported mother factorizes as ``ψ̂(f) = c · env(f)`` with a *real*
envelope and a complex constant (see ``mothers.py``), so the filter application
is a real-envelope broadcast multiply — pure VPU work that XLA fuses into the
iFFT's input; a Pallas variant streams (scale-block × freq-tile) tiles without
materializing the bank (``pallas_fft.py``).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..mothers import Mother

__all__ = ["angular_frequencies", "filter_bank", "apply_filter_bank"]


def angular_frequencies(nfft: int, dt: float, dtype=jnp.float32):
    """``2π·fftfreq(nfft, dt)`` (reference ``wavelet.py:94``)."""
    return (2 * jnp.pi) * jnp.fft.fftfreq(nfft, d=dt).astype(dtype)


def filter_bank(mother: Mother, scales, ftfreqs, dt: float):
    """Materialize the (S × nfft) complex filter bank ψ̄̂.

    Parameters
    ----------
    mother: static mother-wavelet dataclass.
    scales: (S,) real array of wavelet scales.
    ftfreqs: (nfft,) angular frequencies from :func:`angular_frequencies`.
    dt: sampling interval.

    Returns
    -------
    (S, nfft) complex array ``sqrt(2π·s/dt)·conj(ψ̂(s·ω))``.
    """
    scales = jnp.asarray(scales)
    norm = jnp.sqrt(2 * jnp.pi * scales / dt)  # == sqrt(s·ω₁·N), wavelet.py:103
    env = mother.psi_ft_envelope(scales[:, None] * ftfreqs[None, :])
    cbar = jnp.conjugate(jnp.asarray(mother.psi_ft_const()))
    return (norm[:, None] * env) * cbar


def apply_filter_bank(signal_ft, mother: Mother, scales, ftfreqs, dt: float):
    """Product spectrum ``X[b,k]·ψ̄̂[s,k]`` as a (B, S, nfft) complex array.

    XLA fuses the envelope evaluation + broadcast multiply with the consumer
    iFFT's input processing, so this does not materialize an (S × nfft) bank
    per batch element in HBM beyond the output itself.
    """
    scales = jnp.asarray(scales, dtype=ftfreqs.dtype)
    norm = jnp.sqrt(2 * jnp.pi * scales / dt)
    env = mother.psi_ft_envelope(scales[:, None] * ftfreqs[None, :])  # (S, nfft) real
    bank = (norm[:, None] * env).astype(signal_ft.real.dtype)
    cbar = jnp.conjugate(jnp.asarray(mother.psi_ft_const(), dtype=signal_ft.dtype))
    return signal_ft[:, None, :] * bank[None, :, :] * cbar
