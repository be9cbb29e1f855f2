"""Overlap-save blocked CWT for long signals (sequence parallelism, SURVEY P3).

The reference holds the whole signal in one array and does one global
pow-2-padded FFT (``/root/reference/pycwt/wavelet.py:91``).  For N beyond what
one chip's HBM fits (the (S × N) transform is the constraint: 64 scales ×
complex64 ≈ 512 B/sample), we block the time axis and convolve each chunk
independently — the classic overlap-save scheme, with the halo sized by the
mother wavelet's e-folding support at the largest scale:

    halo = ceil(ζ · s_max / dt) samples,  ζ = sqrt(−2·ln ε)

(|ψ(t/s)| ≤ e^{−t²/2s²} for the Gaussian-envelope mothers; ε is the truncation
tolerance).  Interior outputs match the global transform to round-off; the
outer ``halo`` samples of the first/last chunk differ only inside the region
the COI masks anyway — "cone-of-influence padding" is the domain's natural
overlap contract (SURVEY.md §5).

Chunks are independent → shard them over the 'data' mesh axis (each chip owns
a contiguous time slab; no inter-chip halo exchange is needed because halos
are read from the replicated host input at chunk construction; a fully
device-resident halo-exchange variant via ``ppermute`` is the planned
extension for multi-host streaming ingest).

**Near-Nyquist caveat.** For scales where the mother's spectrum is still
large at the Nyquist frequency (Morlet-6 at the TC98 default smallest scale
``s0 = 2dt/λ`` has ψ̂(s·π/dt) ≈ 0.96), the frequency-truncated filter's
impulse response rings with only ~1/t decay, so *any* finite halo leaves
blocked-vs-global discretization differences of order ψ̂(s·Ω_nyq)/t.  Scales
with ``s ≳ 4dt`` agree with the global transform to f32 round-off; the finest
one-to-two scales agree to ~1e-2 relative (the same order as their inherent
sampling aliasing — these scales are questionable in any discretization, ours
or the reference's).
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..config import next_pow2
from ..mothers import Mother
from ..transform import cwt_batch

__all__ = ["halo_samples", "cwt_overlap_save"]


def halo_samples(max_scale: float, dt: float, eps: float = 1e-7) -> int:
    """Samples of wavelet support to overlap: ζ·s_max/dt, ζ = sqrt(−2 ln ε)."""
    zeta = math.sqrt(-2.0 * math.log(eps))
    return int(math.ceil(zeta * max_scale / dt))


def cwt_overlap_save(signal, scales, dt: float, *, mother: Mother,
                     chunk: int = 1 << 18, eps: float = 1e-7):
    """Blocked CWT of a long 1-D signal.

    Parameters
    ----------
    signal: (N,) array (host or device).
    scales: (S,) wavelet scales.
    chunk: output samples per block (the FFT length is the pow-2 of
        ``chunk + 2·halo``).
    eps: wavelet truncation tolerance setting the halo size.

    Returns
    -------
    (S, N) complex W, assembled from per-chunk transforms.  Interior samples
    (≥ halo from either end) are identical to the global-FFT transform; the
    edges follow zero-padding semantics (inside the COI either way).
    """
    signal = np.asarray(signal)
    N = signal.shape[-1]
    smax = float(np.max(np.asarray(scales)))
    H = halo_samples(smax, dt, eps)
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    if N <= chunk:
        nfft = next_pow2(N)
        W, _ = cwt_batch(jnp.asarray(signal)[None], jnp.asarray(scales), dt,
                         mother=mother, nfft=nfft)
        return W[0]

    nfft = next_pow2(chunk + 2 * H)
    n_chunks = (N + chunk - 1) // chunk

    # Build the (n_chunks, chunk + 2H) haloed slab matrix host-side
    # (zero-padded at the ends, matching the reference's zero-pad semantics).
    padded = np.zeros(N + 2 * H + chunk, dtype=signal.dtype)
    padded[H:H + N] = signal
    slabs = np.stack([
        padded[i * chunk: i * chunk + chunk + 2 * H] for i in range(n_chunks)
    ])

    W_slabs, _ = cwt_batch(jnp.asarray(slabs), jnp.asarray(scales), dt,
                           mother=mother, nfft=nfft)
    # Keep the center `chunk` samples of each slab: output t = i·chunk + j
    # corresponds to slab sample H + j.
    W_keep = W_slabs[:, :, H:H + chunk]            # (n_chunks, S, chunk)
    W = jnp.concatenate(jnp.split(W_keep, n_chunks, axis=0), axis=-1)[0]
    return W[:, :N]
