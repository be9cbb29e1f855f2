"""Four-step DFT on the MXU — a pure-XLA FFT replacement (no FFT custom call).

Motivation: on some TPU runtimes (notably the tunneled "axon" backend used for
single-chip benching) XLA's FFT custom call has been observed to *hang at
compile time*, which takes `jnp.fft.*` — and with it the whole CWT hot path of
the reference design (`/root/reference/pycwt/wavelet.py:91-106`) — off the
table.  This module computes the same DFT as two batched matmuls + a twiddle
multiply (the classic four-step / six-step decomposition), which lowers to
plain MXU dot-generals that every TPU backend compiles:

    N = R1·R2,  n = n1·R2 + n2,  k = k1 + R1·k2
    X[k1 + R1·k2] = Σ_{n2} F2[n2, k2] · ( T[k1, n2] · Σ_{n1} F1[k1, n1] x[n1·R2 + n2] )
    F1[k1, n1] = e^{s·2πi·n1·k1/R1},  T[k1, n2] = e^{s·2πi·n2·k1/N},
    F2[n2, k2] = e^{s·2πi·n2·k2/R2},  s = −1 forward / +1 inverse.

Cost for N = 2^20 (R1 = R2 = 1024): ~13 GFLOP per signal — microseconds of MXU
time — versus O(N·log N) HBM-bound radix passes for a streamed FFT.  Complex
arithmetic is planar (separate re/im f32) with HIGHEST matmul precision
(bf16x3, ~f32-exact) by default.

Accuracy: validated against ``np.fft.fft``/``ifft`` in ``tests/test_engines.py``
(engine parity vs the f64 goldens) and ``tests/test_pallas.py`` (planar DFT
round-trips; ≤~1e-5 relative in f32 for N up to 2^20; exact-to-f64-roundoff
when x64 is enabled on CPU).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["dft", "idft", "fft_of_real", "fft_of_real_planar", "supported_n"]


def supported_n(n: int) -> bool:
    """Pow-2 lengths ≥ 16 (below that a single DFT matrix is cheaper anyway —
    and also supported, via the R2 == 1 degenerate split)."""
    return n >= 2 and (1 << (n.bit_length() - 1)) == n


def _split(n: int) -> tuple[int, int]:
    p = n.bit_length() - 1
    r1 = 1 << ((p + 1) // 2)  # R1 ≥ R2 keeps the twiddle matrix (R1, R2) wide
    return r1, n // r1


@functools.lru_cache(maxsize=32)
def _tables(n: int, sign: int, f64: bool):
    """Host-side constant factor matrices for one length-n four-step DFT."""
    r1, r2 = _split(n)
    n1 = np.arange(r1)
    n2 = np.arange(r2)
    k2 = np.arange(r2)
    F1 = np.exp(sign * 2j * np.pi * np.outer(n1, n1) / r1)        # [k1, n1]
    T = np.exp(sign * 2j * np.pi * np.outer(n1, n2) / n)          # [k1, n2]
    F2 = np.exp(sign * 2j * np.pi * np.outer(n2, k2) / r2)        # [n2, k2]
    dt = np.float64 if f64 else np.float32
    planar = lambda z: (np.ascontiguousarray(z.real, dt),
                        np.ascontiguousarray(z.imag, dt))
    return planar(F1), planar(T), planar(F2), r1, r2


def _dft_planar(xr, xi, n: int, sign: int, precision, half: bool = False):
    """Planar four-step DFT along the last axis of (..., n) real/imag parts.
    ``xi`` may be None for real input (halves the first-stage matmuls).
    ``half=True`` produces only the first n/2 outputs (k < n/2, natural
    order) — since k = k1 + r1·k2 the restriction is k2 < r2/2, so stage 2's
    matmuls and the output write halve (used by analytic-mother CWT paths
    that never read the negative-frequency bins)."""
    f64 = xr.dtype == jnp.float64
    (F1r, F1i), (Tr, Ti), (F2r, F2i), r1, r2 = _tables(n, sign, f64)
    F1r, F1i, Tr, Ti, F2r, F2i = map(jnp.asarray, (F1r, F1i, Tr, Ti, F2r, F2i))
    if half:
        assert r2 % 2 == 0, "half-spectrum DFT needs even r2"
        F2r = F2r[:, : r2 // 2]
        F2i = F2i[:, : r2 // 2]
    n_out = n // 2 if half else n
    dot = functools.partial(jnp.einsum, precision=precision,
                            preferred_element_type=xr.dtype)

    batch = xr.shape[:-1]
    xr = xr.reshape(batch + (r1, r2))
    # stage 1: contract n1 → Y[k1, n2]
    if xi is None:
        yr = dot("ab,...bc->...ac", F1r, xr)
        yi = dot("ab,...bc->...ac", F1i, xr)
    else:
        xi = xi.reshape(batch + (r1, r2))
        yr = dot("ab,...bc->...ac", F1r, xr) - dot("ab,...bc->...ac", F1i, xi)
        yi = dot("ab,...bc->...ac", F1r, xi) + dot("ab,...bc->...ac", F1i, xr)
    # twiddle (elementwise, fused by XLA into the surrounding matmuls)
    zr = yr * Tr - yi * Ti
    zi = yr * Ti + yi * Tr
    # stage 2: contract n2 → Z[k1, k2]
    wr = dot("...ab,bc->...ac", zr, F2r) - dot("...ab,bc->...ac", zi, F2i)
    wi = dot("...ab,bc->...ac", zr, F2i) + dot("...ab,bc->...ac", zi, F2r)
    # k = k1 + r1·k2 → lay out as (k2, k1) row-major
    wr = jnp.swapaxes(wr, -1, -2).reshape(batch + (n_out,))
    wi = jnp.swapaxes(wi, -1, -2).reshape(batch + (n_out,))
    return wr, wi


def dft(x: jax.Array, n: int | None = None, *, sign: int = -1,
        precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Complex DFT along the last axis via MXU matmuls (forward by default).

    Matches ``jnp.fft.fft(x, n)`` (sign=-1) / ``jnp.fft.ifft(x, n)·n``
    (sign=+1, i.e. **unscaled**) for pow-2 ``n``.  Real or complex input;
    zero-pads (or truncates) to ``n`` like ``jnp.fft.fft`` does.
    """
    last = x.shape[-1]
    n = last if n is None else n
    if not supported_n(n):
        raise ValueError(f"mxu dft needs pow-2 length, got {n}")
    if n != last:
        if n < last:
            x = x[..., :n]
        else:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, n - last)]
            x = jnp.pad(x, pad)
    if jnp.iscomplexobj(x):
        xr, xi = jnp.real(x), jnp.imag(x)
    else:
        xr, xi = x, None
    wr, wi = _dft_planar(xr, xi, n, sign, precision)
    return jax.lax.complex(wr, wi)


def idft(x: jax.Array, n: int | None = None, *,
         precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Inverse complex DFT along the last axis (matches ``jnp.fft.ifft``)."""
    n_ = x.shape[-1] if n is None else n
    return dft(x, n, sign=+1, precision=precision) * (1.0 / n_)


def fft_of_real(x: jax.Array, nfft: int, *,
                precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Full complex spectrum of a real signal, zero-padded to ``nfft`` —
    the MXU replacement for the rfft+mirror at ``transform.py`` K1
    (reference ``wavelet.py:91``).  Skips the imaginary-input matmuls."""
    return dft(x, nfft, sign=-1, precision=precision)


def fft_of_real_planar(x: jax.Array, nfft: int, *, half: bool = False,
                       precision=jax.lax.Precision.HIGHEST):
    """Like :func:`fft_of_real` but returns PLANAR ``(re, im)`` f32/f64 arrays
    and touches no complex dtype anywhere.  Needed on runtimes where complex64
    support itself flaps (the tunneled axon backend was observed to raise
    runtime UNIMPLEMENTED for *any* complex op, intermittently) — the planar
    four-step pipeline keeps the headline CWT path pure-real.

    ``half=True`` returns only the positive-frequency half ``(..., nfft//2)``
    (bins k < nfft/2) at ~2/3 the compute and half the output traffic — all an
    analytic-mother CWT ever reads (``pallas_fft`` kernel A's half-spectrum
    path)."""
    if not supported_n(nfft):
        raise ValueError(f"mxu dft needs pow-2 length, got {nfft}")
    last = x.shape[-1]
    if nfft != last:
        if nfft < last:
            x = x[..., :nfft]
        else:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, nfft - last)]
            x = jnp.pad(x, pad)
    return _dft_planar(x, None, nfft, -1, precision, half=half)
