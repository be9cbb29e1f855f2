"""WCT smoothing operator: Gaussian in time (Fourier domain) + boxcar in scale.

TPU-first rewrite of ``Morlet.smooth`` (reference
``/root/reference/pycwt/mothers.py:61-104``).  Semantics replicated exactly:

* time axis: multiply the (pow-2 padded) spectrum by ``exp(−(s/dt)²k²/2)``
  where ``k = 2π·fftfreq(nfft)`` with **unit** sample spacing (the reference
  passes no ``d`` to fftfreq — ``mothers.py:83``), then inverse FFT and trim;
* scale axis: 'same' 2-D convolution with a normalized boxcar of width
  ``round(deltaj0/dj·2)`` whose end taps are 0.5 (``helpers.py:176-191``,
  ``mothers.py:98-102``).

Differences from the reference:

* batched — accepts ``(..., S, N)``, smoothing the trailing two axes;
* defined for **all** mothers with a tabulated ``deltaj0`` (the reference only
  defines ``smooth`` on Morlet, so ``wct`` with Paul/DOG crashes; here it works).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import next_pow2
from ..mothers import Mother

__all__ = ["smooth", "rect_window", "scale_boxcar_same"]


def rect_window(width: int, normalize: bool = True) -> np.ndarray:
    """Boxcar with 0.5 end-weights (reference ``helpers.py:176-191``)."""
    if width < 1:
        raise ValueError("window width must be >= 1")
    win = np.ones(width, dtype=np.float64)
    win[0] = win[-1] = 0.5
    if normalize:
        win /= win.sum()
    return win


def time_gaussian_smooth(W, scales, dt: float, nfft: int):
    """Per-scale Gaussian smoothing along the time axis via the convolution
    theorem (reference ``mothers.py:83-96``)."""
    n = W.shape[-1]
    real_in = not jnp.iscomplexobj(W)
    k = (2 * jnp.pi) * jnp.fft.fftfreq(nfft).astype(jnp.asarray(scales).dtype)
    snorm = jnp.asarray(scales) / dt
    F = jnp.exp(-0.5 * (snorm[:, None] ** 2) * (k ** 2)[None, :])  # (S, nfft)
    spec = jnp.fft.fft(W, n=nfft, axis=-1)
    out = jnp.fft.ifft(F * spec, axis=-1)[..., :n]
    return out.real if real_in else out


def scale_boxcar_same(T, win: np.ndarray):
    """'same'-mode convolution along the scale axis (axis −2), matching
    ``scipy.signal.convolve2d(T, win[:, None], 'same')``
    (reference ``mothers.py:102``) including the even-width centering.
    """
    L = len(win)
    if L == 1:
        return T * win[0]
    S = T.shape[-2]
    pad = [(0, 0)] * (T.ndim - 2) + [(L - 1, L - 1), (0, 0)]
    Tp = jnp.pad(T, pad)
    start = (L - 1) // 2
    w = jnp.asarray(win, dtype=T.real.dtype if jnp.iscomplexobj(T) else T.dtype)
    out = None
    for j in range(L):
        lo = start + L - 1 - j
        term = w[j] * jax.lax.slice_in_dim(Tp, lo, lo + S, axis=T.ndim - 2)
        out = term if out is None else out + term
    return out


def smooth(W, dt: float, dj: float, scales, mother: Mother):
    """Full WCT smoothing: time Gaussian then scale boxcar.

    Parameters
    ----------
    W: ``(..., S, N)`` real or complex array (e.g. ``|W|²/s`` or ``W₁W₂*/s``).
    dt: sampling interval.
    dj: scale spacing (sets the boxcar width ``round(deltaj0/dj·2)``).
    scales: (S,) wavelet scales.
    mother: mother wavelet providing ``deltaj0``.
    """
    if mother.deltaj0 == -1:
        raise ValueError(
            f"deltaj0 is not tabulated for {mother.name} with these parameters; "
            "cannot build the scale-smoothing window (TC98 Table 2)."
        )
    n = W.shape[-1]
    nfft = next_pow2(n)
    T = time_gaussian_smooth(W, scales, dt, nfft)
    wsize = mother.deltaj0 / dj * 2
    win = rect_window(int(round_half_even_np(wsize)), normalize=True)
    return scale_boxcar_same(T, win)


def round_half_even_np(x: float) -> int:
    """int(np.round(x)) — banker's rounding, as the reference uses
    (``mothers.py:101``)."""
    return int(np.round(x))
