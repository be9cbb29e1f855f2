"""Engine-dispatched FFT primitives — ONE policy for every FFT consumer.

The reference picks its FFT backend once at import time
(``/root/reference/pycwt/helpers.py:6-30``); round 1 of this framework only
honored the engine choice on the forward CWT, leaving smoothing / WCT / MC /
spectra hard-wired to ``jnp.fft.*`` — the exact custom call that
``ops/mxu_dft.py`` exists to avoid on runtimes where it hangs at compile
(tunneled single-chip backends).  This module gives every consumer the same
three-way knob:

* ``"xla"``    — ``jnp.fft.*`` (XLA's FFT custom call; fastest where it works,
  required for non-pow-2 lengths and f64);
* ``"mxu"``    — four-step DFT as MXU matmuls (``ops/mxu_dft.py``) — no FFT
  custom call anywhere; pow-2 lengths only, silently falls back to XLA
  otherwise (callers that *must not* touch the custom call should pad);
* ``"pallas"`` — the fused Pallas kernel applies only to the forward CWT
  (``ops/pallas_fft.py``); every auxiliary FFT (smoothing, spectra) rides the
  MXU DFT under this engine.
* ``"planar"`` — like ``"pallas"`` but additionally avoids COMPLEX dtypes
  wherever a pipeline permits: the WCT/Monte-Carlo core runs fully planar
  (``coherence._wct_core_planar``, returning the cross spectrum as an
  ``(re, im)`` pair) and the headline bench path is planar end-to-end.  The
  default on the tunneled axon platform, whose complex64 support flaps.

Resolution order for ``engine=None``: ``CWTConfig.engine`` (when the caller
threads a config) → the ``PYCWT_TPU_ENGINE`` environment variable → a
per-backend default: ``"planar"`` on the tunneled single-chip ``axon``
platform (whose XLA FFT custom call has been observed both to hang at compile
and to raise runtime UNIMPLEMENTED, *intermittently*, alongside ALL complex64
ops — the planar, FFT-free, complex-free paths are the only dependable ones
there), ``"xla"`` everywhere else.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import mxu_dft

__all__ = ["resolve_engine", "fft", "ifft", "fft_of_real_full"]

_VALID = ("xla", "mxu", "pallas", "planar")


def _backend_default() -> str:
    # The tunneled runtime registers as plugin platform "axon" but its devices
    # report platform "tpu", so the ACTIVE backend alone can't distinguish it
    # from a healthy TPU runtime; the JAX_PLATFORMS=axon pin from its
    # environment is the marker.  A process that forced another backend
    # (tests pin cpu via jax.config, which beats the env var) still resolves
    # by its real active platform.
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "cpu"
    if platform in ("tpu", "axon") and "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return "planar"
    return "xla"


def resolve_engine(engine: str | None = None) -> str:
    """Resolve an engine name: explicit arg → env ``PYCWT_TPU_ENGINE`` →
    per-backend default (axon → "planar", else "xla")."""
    if engine is None:
        engine = os.environ.get("PYCWT_TPU_ENGINE") or _backend_default()
    if engine not in _VALID:
        raise ValueError(f"engine must be one of {_VALID}, got {engine!r}")
    return engine


def _mxu_ok(n: int, dtype) -> bool:
    # The MXU DFT is pow-2 only; f64 planar matmuls work but are slower than
    # XLA's f64 FFT on CPU — keep mxu for the f32 throughput path and any
    # backend where the custom call is unavailable.
    return mxu_dft.supported_n(n)


def _warn_fallback(engine: str, n: int) -> None:
    """An explicitly requested non-xla engine is about to ride the XLA FFT
    custom call (non-pow-2 length).  On runtimes where that call is the very
    thing the engine knob exists to avoid (tunneled axon), this would
    otherwise fail with no diagnostic (ADVICE r2): warn once per trace."""
    import warnings

    warnings.warn(
        f"engine={engine!r} supports only power-of-two FFT lengths; length "
        f"{n} falls back to the XLA FFT custom call. Pad to a power of two "
        "(CWTConfig(pad_pow2=True)) to stay on the MXU/Pallas path.",
        stacklevel=3,
    )


def fft(x, n: int | None = None, *, engine: str | None = None):
    """Complex FFT along the last axis (matches ``jnp.fft.fft(x, n)``)."""
    engine = resolve_engine(engine)
    n_ = x.shape[-1] if n is None else n
    if engine in ("mxu", "pallas", "planar"):
        if _mxu_ok(n_, x.dtype):
            return mxu_dft.dft(x, n_)
        _warn_fallback(engine, n_)
    return jnp.fft.fft(x, n=n, axis=-1)


def ifft(x, n: int | None = None, *, engine: str | None = None):
    """Inverse complex FFT along the last axis (matches ``jnp.fft.ifft``)."""
    engine = resolve_engine(engine)
    n_ = x.shape[-1] if n is None else n
    if engine in ("mxu", "pallas", "planar"):
        if _mxu_ok(n_, x.dtype):
            return mxu_dft.idft(x, n_)
        _warn_fallback(engine, n_)
    return jnp.fft.ifft(x, n=n, axis=-1)


def fft_of_real_full(x, nfft: int, *, engine: str | None = None):
    """Full complex spectrum of a real signal zero-padded to ``nfft``
    (the K1 kernel of every transform — reference ``wavelet.py:91``).

    Under ``"xla"`` this is an rFFT + Hermitian mirror (half the work of a
    complex FFT); under ``"mxu"``/``"pallas"`` a real-input four-step DFT
    (the imaginary-part matmuls are skipped).
    """
    engine = resolve_engine(engine)
    if engine in ("mxu", "pallas", "planar"):
        if _mxu_ok(nfft, x.dtype):
            return mxu_dft.fft_of_real(x, nfft)
        _warn_fallback(engine, nfft)
    half = jnp.fft.rfft(x, n=nfft, axis=-1)
    if nfft % 2 == 0:
        mirror = jnp.conj(half[..., -2:0:-1])
    else:
        mirror = jnp.conj(half[..., -1:0:-1])
    return jnp.concatenate([half, mirror], axis=-1)
