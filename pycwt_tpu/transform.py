"""Batched forward / inverse continuous wavelet transform — the TPU core.

Redesign of the reference's single-signal ``cwt``/``icwt``
(``/root/reference/pycwt/wavelet.py:13-171``) as a batched, statically-shaped,
jit-compiled pipeline:

    (B, n0) real ──rFFT+mirror──► (B, nfft) spectrum
                 ──filter bank──► (B, S, nfft) product spectrum
                 ──batched iFFT─► (B, S, nfft) ──trim──► (B, S, n0) W

All data-dependent decisions of the reference (scale-grid construction,
NaN-row dropping at ``wavelet.py:111-115``) are resolved **host-side** in
:mod:`pycwt_tpu.api` so every shape here is static and XLA can tile the whole
pipeline onto the chip once.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import CWTConfig, DEFAULT, round_half_even
from .mothers import Mother, as_mother
from .ops.fft import fft_of_real_full, ifft as engine_ifft, resolve_engine
from .ops.filterbank import angular_frequencies, apply_filter_bank

__all__ = [
    "ScaleGrid",
    "build_scale_grid",
    "drop_reference_nan_rows",
    "cwt_batch",
    "icwt_batch",
    "icwt_planar",
    "coi_bartlett",
]


class ScaleGrid(NamedTuple):
    """Host-side scale grid (all numpy float64, decided before jit)."""

    sj: np.ndarray      # (S,) wavelet scales  s0·2^(j·dj)
    freqs: np.ndarray   # (S,) Fourier-equivalent frequencies 1/(λ·s)
    dj: float
    s0: float
    J: int


def build_scale_grid(
    n0: int,
    dt: float,
    dj: float = 1 / 12,
    s0: float = -1,
    J: int = -1,
    mother: Mother | str = "morlet",
    freqs: np.ndarray | None = None,
) -> ScaleGrid:
    """Scale grid per Mallat / TC98 defaults (reference ``wavelet.py:75-88``).

    ``s0 = 2·dt/λ`` and ``J = round(log2(n0·dt/s0)/dj)`` when unset; a custom
    ``freqs`` vector instead derives scales as ``1/(λ·freqs)``.
    """
    mother = as_mother(mother)
    flambda = mother.flambda()
    if freqs is None:
        if s0 == -1:
            s0 = 2 * dt / flambda
        if J == -1:
            J = int(round_half_even(np.log2(n0 * dt / s0) / dj))
        sj = s0 * 2.0 ** (np.arange(0, J + 1, dtype=np.float64) * dj)
        freqs = 1.0 / (flambda * sj)
    else:
        freqs = np.asarray(freqs, dtype=np.float64)
        sj = 1.0 / (flambda * freqs)
        J = len(sj) - 1
        s0 = float(sj[0]) if len(sj) else -1.0
    return ScaleGrid(sj=np.asarray(sj, dtype=np.float64), freqs=freqs, dj=dj, s0=float(s0), J=int(J))


def drop_reference_nan_rows(mother: Mother, sj: np.ndarray, freqs: np.ndarray,
                            nfft: int, dt: float):
    """Host-side replica of the reference's data-dependent NaN-row drop
    (``wavelet.py:111-115``): a scale row is dropped iff the reference's
    naive f64 filter formula would have produced non-finite values in it
    (e.g. Paul overflow at large scales) — INCLUDING the reference's quirk
    that when *all* rows are bad, everything is kept (``np.any(sel)`` is
    False there).  One shared implementation for every surface that must
    keep its scale axis aligned with :func:`pycwt_tpu.api.cwt`.

    Returns the (possibly filtered) ``(sj, freqs)``.
    """
    ftfreqs_np = 2 * np.pi * np.fft.fftfreq(nfft, dt)
    bad = mother.reference_nan_rows(sj, ftfreqs_np)
    if (~bad).any():
        return sj[~bad], freqs[~bad]
    return sj, freqs


def coi_bartlett(n0: int, dt: float, mother: Mother) -> np.ndarray:
    """Cone of influence as Fourier periods: Bartlett triangle with non-zero
    end points, ``λ·coi·dt·(n0/2 − |t − (n0−1)/2|)`` (reference
    ``wavelet.py:117-121``).  Pure host math — O(n0)."""
    tri = n0 / 2 - np.abs(np.arange(0, n0, dtype=np.float64) - (n0 - 1) / 2)
    return mother.flambda() * mother.coi() * dt * tri


@functools.partial(
    jax.jit, static_argnames=("dt", "mother", "nfft", "config", "engine")
)
def cwt_batch(
    signals: jax.Array,
    scales: jax.Array,
    dt: float,
    *,
    mother: Mother,
    nfft: int,
    config: CWTConfig = DEFAULT,
    engine: str | None = None,
):
    """Batched forward CWT.

    Parameters
    ----------
    signals: ``(B, n0)`` real array.
    scales: ``(S,)`` wavelet scales (traced — changing values does not recompile).
    dt: sampling interval (traced-compatible python float).
    mother: static mother-wavelet dataclass.
    nfft: static FFT length (pad-to-pow-2 under the default policy).
    config: numeric policy.

    Returns
    -------
    W: ``(B, S, n0)`` complex wavelet transform.
    signal_ft: ``(B, nfft)`` complex spectrum of the (zero-padded) signals —
        callers slice ``[:, 1:nfft//2]/sqrt(nfft)`` for the reference's ``fft``
        return value (``wavelet.py:123``).
    """
    engine = resolve_engine(engine if engine is not None else config.engine)
    if engine == "planar":
        # cwt_batch's contract returns complex W; "planar" only changes the
        # coherence/MC pipelines (coherence._wct_core_planar) — here it means
        # the fused Pallas lowering.
        engine = "pallas"
    rdt = config.real_dtype
    cdt = config.complex_dtype
    signals = jnp.asarray(signals, dtype=rdt)
    if signals.ndim != 2:
        raise ValueError(f"signals must be (B, n0), got {signals.shape}")
    scales = jnp.asarray(scales, dtype=rdt)

    # K1: one forward FFT per signal.  Two lowerings (ops/fft.py):
    #   - "xla":      rFFT custom call + Hermitian mirror (cheapest where the
    #                 backend's FFT works);
    #   - "mxu"/"pallas": four-step DFT as MXU matmuls (ops/mxu_dft.py) — no
    #                 FFT custom call at all.  Required on runtimes where
    #                 XLA's FFT hangs at compile (tunneled single-chip axon).
    signal_ft = fft_of_real_full(signals, nfft, engine=engine).astype(cdt)

    if engine == "pallas":
        # Fused Pallas four-step path (f32, pow-2 nfft): filter bank built in
        # the kernel prologue, iFFT as MXU DFT stages (ops/pallas_fft.py).
        # Sizes the kernel doesn't cover — and non-TPU backends, where Mosaic
        # kernels only run in interpret mode — fall through to the MXU DFT
        # path so the engine knob stays valid for every workload.
        from .ops.pallas_fft import fused_cwt, supported_nfft

        if supported_nfft(nfft) and jax.default_backend() in ("tpu", "axon"):
            W_full = jax.vmap(
                lambda sf: fused_cwt(sf, scales.astype(jnp.float32), mother=mother,
                                     nfft=nfft, dt=float(dt),
                                     precision=config.precision)
            )(signal_ft.astype(jnp.complex64))
            return W_full[..., : signals.shape[-1]], signal_ft
        engine = "mxu"

    ftfreqs = angular_frequencies(nfft, dt, dtype=rdt)

    # K2: per-scale filter-bank multiply (outer product in Fourier space,
    # reference ``wavelet.py:102-104``).
    prod = apply_filter_bank(signal_ft, mother, scales, ftfreqs, dt)  # (B, S, nfft)

    # K1⁻¹: batched inverse FFT over all (B × S) rows, trim to n0
    # (reference ``wavelet.py:105-106, 123``).
    W = engine_ifft(prod, engine=engine)[..., : signals.shape[-1]]
    return W, signal_ft


@functools.partial(jax.jit, static_argnames=("mother",))
def icwt_batch(W: jax.Array, scales: jax.Array, dt: float, dj: float, *, mother: Mother):
    """Batched inverse CWT, TC98 eq. 11 (reference ``wavelet.py:127-171``):

        x̂[t] = dj·√dt / (C_δ·ψ(0)) · Σ_s Re(W[s, t]) / √s

    ``W`` is ``(..., S, n0)`` with the scale axis second-to-last (the
    reference's transpose auto-detection at ``wavelet.py:159-166`` is handled
    in the compat API).  The Σ over scales becomes a ``psum`` over the 'scale'
    mesh axis in the sharded path (``parallel/sharded.py``).
    """
    scales = jnp.asarray(scales, dtype=W.real.dtype)
    psi0 = mother.psi0()
    if isinstance(psi0, complex) and psi0.imag == 0:
        psi0 = psi0.real
    norm = dj * jnp.sqrt(jnp.asarray(dt, dtype=W.real.dtype)) / (mother.cdelta * psi0)
    return norm * jnp.sum(W.real / jnp.sqrt(scales)[..., :, None], axis=-2)


def icwt_planar(wr: jax.Array, scales: jax.Array, dt: float, dj: float, *,
                mother: Mother):
    """:func:`icwt_batch` on the PLANAR real part alone — TC98 eq. 11 only
    reads Re(W), so reconstruction from the complex-free pipelines (the
    blocked long-signal surfaces, the fused planar kernels) never needs the
    imaginary plane or a complex dtype.  ``wr`` is ``(..., S, n)``; returns
    ``(..., n)`` on device — at long N the host round-trip of a complex W
    would dwarf this one reduction (reference ``wavelet.py:127-171``)."""
    wr = jnp.asarray(wr)
    scales = jnp.asarray(scales, dtype=wr.dtype)
    psi0 = mother.psi0()
    if isinstance(psi0, complex) and psi0.imag == 0:
        psi0 = psi0.real
    norm = dj * jnp.sqrt(jnp.asarray(dt, dtype=wr.dtype)) / (
        mother.cdelta * psi0)
    return norm * jnp.sum(wr / jnp.sqrt(scales)[..., :, None], axis=-2)
