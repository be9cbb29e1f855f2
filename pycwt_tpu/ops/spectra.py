"""Frequency-domain shortcuts for integrated spectra.

By Parseval, the time-summed wavelet power at scale s is

    Σ_t |W_s[t]|²  =  (1/N) Σ_k |X[k]·ψ̄̂_s[k]|²

so the **global wavelet spectrum** (TC98 eq. 22 numerator) needs no inverse
FFT at all — one elementwise pass over the (S × nfft) filter grid, fused by
XLA into a reduction.  This is exact when the FFT length equals the signal
length (e.g. pow-2-sized signals); with zero-padding the identity includes the
pad-region power, which is edge-wrap energy the COI masks anyway — callers
needing the exact padded-and-trimmed reference semantics use the full
transform (the difference is quantified in tests).

The reference computes this by materializing W and averaging
(``sample/sample.py:90``) — O(S·N·log N) and 512 B/sample of HBM for the
1M-point benchmark; this path is O(S·N) with no intermediate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..mothers import Mother
from .fft import fft_of_real_full, resolve_engine
from .filterbank import angular_frequencies

__all__ = ["global_power_parseval"]


@functools.partial(jax.jit, static_argnames=("dt", "mother", "nfft", "engine"))
def global_power_parseval(signals, scales, *, dt: float, mother: Mother,
                          nfft: int, engine: str | None = None):
    """Time-summed wavelet power per scale, ``(B, S)``, without an iFFT.

    ``signals``: (B, n0) real; ``scales``: (S,).  Equals
    ``(|cwt|**2).sum(-1)`` exactly when ``nfft == n0``.
    Divide by ``n0`` for the mean (global wavelet spectrum).
    """
    signals = jnp.asarray(signals)
    rdt = signals.dtype
    K = nfft // 2 + 1
    if resolve_engine(engine) == "xla":
        X = jnp.fft.rfft(signals, n=nfft, axis=-1)          # (B, nfft//2+1)
    else:
        X = fft_of_real_full(signals, nfft, engine=engine)[..., :K]
    half = (2 * jnp.pi / (nfft * dt)) * jnp.arange(K, dtype=rdt)
    scales = jnp.asarray(scales, dtype=rdt)
    norm2 = 2 * jnp.pi * scales / dt                         # |sqrt(s·ω₁·N)|²
    c2 = abs(complex(mother.psi_ft_const())) ** 2
    f = scales[:, None] * half[None, :]
    # The filter is NOT Hermitian: the mirror bins see −ω.  |X| is symmetric
    # for real input, so fold |ψ̂(±sω)|² into a half-grid weight: interior
    # bins get env(+)²+env(−)², DC gets env(0)², Nyquist (full-fft bin N/2,
    # which fftfreq maps to −π/dt) gets env(−s·π/dt)².
    env_p2 = mother.psi_ft_envelope(f) ** 2
    env_m2 = mother.psi_ft_envelope(-f) ** 2
    both = env_p2 + env_m2
    if nfft % 2 == 0:
        bank2 = jnp.concatenate(
            [env_p2[:, :1], both[:, 1:-1], env_m2[:, -1:]], axis=1)
    else:
        bank2 = jnp.concatenate([env_p2[:, :1], both[:, 1:]], axis=1)
    bank2 = (norm2[:, None] * c2) * bank2                    # (S, K)
    p_half = jnp.abs(X) ** 2                                 # (B, K)
    return jnp.einsum("bk,sk->bs", p_half, bank2) / nfft
